"""Device-time split of the production decode: emissions / +viterbi /
+backtrace.  Run: python scripts/exp_decode_split.py [--batch 512]
"""

import argparse
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--frames", type=int, default=500)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass

    sys.path.insert(0, ".")
    from bench import _bank, _timeit_device

    from speech_recognition_tpu.decode.connected import connected_graph_arrays
    from speech_recognition_tpu.models.hmm import bank_nll
    from speech_recognition_tpu.ops.viterbi_banded import (
        banded_arrays,
        banded_backtrace_tb,
    )
    from speech_recognition_tpu.ops.viterbi_banded_pallas import (
        banded_topology,
        viterbi_banded_tb_pallas,
    )

    bank = _bank()
    graph = connected_graph_arrays(bank, 7)
    bg = banded_arrays(graph)
    topo = banded_topology(bg)
    b, t = args.batch, args.frames
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.standard_normal((b, t, 39)), jnp.float32)
    n_frames = jnp.full((b,), t, jnp.int32)
    audio_s = b * t * 0.01
    print(f"backend: {jax.default_backend()}", flush=True)

    def emis_tb(feats, nf):
        def one(x, f):
            return bank_nll(bank, x, jnp.arange(t) < f)
        nb = jax.vmap(one)(feats, nf)
        return jnp.transpose(nb, (1, 2, 0))[:, bg.bank_state, :]

    def body_emis(dep):
        nf = jnp.where(jnp.isnan(dep), n_frames + 1, n_frames)
        return jnp.sum(emis_tb(feats, nf)[:, 0, :])

    def body_vit(dep):
        nf = jnp.where(jnp.isnan(dep), n_frames + 1, n_frames)
        nll = emis_tb(feats, nf)
        f, bp = viterbi_banded_tb_pallas(nll, bg, nf, topo,
                                         eps_depth=graph.eps_depth)
        return jnp.sum(f) + jnp.sum(bp[-1].astype(jnp.float32))

    def body_full(dep):
        nf = jnp.where(jnp.isnan(dep), n_frames + 1, n_frames)
        nll = emis_tb(feats, nf)
        f, bp = viterbi_banded_tb_pallas(nll, bg, nf, topo,
                                         eps_depth=graph.eps_depth)
        end_costs = f[bg.end_states, :] + bg.end_bonus[:, None]
        best = jnp.argmin(end_costs, axis=0)
        states, eps = banded_backtrace_tb(bp, bg, bg.end_states[best], nf,
                                          eps_depth=graph.eps_depth)
        return jnp.sum(states[0].astype(jnp.float32)) + jnp.sum(f)

    for name, body in [("emissions", body_emis), ("emis+viterbi", body_vit),
                       ("full decode", body_full)]:
        dt = _timeit_device(body)
        print(f"RESULT {name:14s} {dt*1e3:7.2f} ms ({audio_s/dt:9.0f} audio-s/s)",
              flush=True)


if __name__ == "__main__":
    main()
