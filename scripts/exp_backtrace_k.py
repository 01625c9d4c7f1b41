"""Sweep the Pallas backtrace frames_per_step at the headline shape
(B=512, T=500): the backtrace is the stage farthest from its roofline
bound (2.40 ms isolated vs 0.51 ms), and its per-frame work is tiny, so
larger reverse-grid blocks should amortize per-step overhead.

Run from /root/repo on TPU."""

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass

    from bench import _bank, _timeit_device, log

    from speech_recognition_tpu.decode.connected import connected_graph_arrays
    from speech_recognition_tpu.models.hmm import bank_nll_ubt
    from speech_recognition_tpu.ops.gmm import gmm_neg_log_lik_ubt  # noqa: F401
    from speech_recognition_tpu.ops.viterbi_banded import banded_arrays
    from speech_recognition_tpu.ops.viterbi_banded_pallas import (
        banded_backtrace_tb_pallas,
        banded_topology,
        viterbi_banded_tb_pallas,
    )

    bank = _bank()
    graph = connected_graph_arrays(bank, 7)
    bg = banded_arrays(graph)
    topo = banded_topology(bg)
    b, t = 512, 500
    rng = np.random.default_rng(1)
    nf = jnp.full((b,), t, jnp.int32)
    n_bank = bank.n_models * bank.n_states
    nll_ubt = jnp.asarray(rng.uniform(0, 5, (n_bank, t, b)), jnp.float32)

    final, bp8, eps_u = viterbi_banded_tb_pallas(
        nll_ubt, bg, nf, topo, return_padded_bp=True, input_ubt=True)
    bp8 = jax.block_until_ready(bp8)
    end_costs = final[bg.end_states, :] + bg.end_bonus[:, None]
    best_end = bg.end_states[jnp.argmin(end_costs, axis=0)]

    for k in (8, 16, 32, 64):
        def body(dep, k=k):
            es = jnp.where(jnp.isnan(dep), best_end + 1, best_end)
            states, _ = banded_backtrace_tb_pallas(
                bp8, eps_u, bg, es, nf, topo, frames_per_step=k)
            return jnp.sum(states[0].astype(jnp.float32))

        dt = _timeit_device(body)
        log(f"backtrace k={k}: {dt*1e3:.3f} ms")


if __name__ == "__main__":
    main()
