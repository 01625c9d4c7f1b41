"""Round-3 emission micro-split at batch 512 x 500: GEMM vs the
mixture logsumexp (which materializes [U, M, T, B] = 225 MB
intermediates), plus a frames_per_step sweep of the word-graph Pallas
Viterbi.  Run from /root/repo on TPU."""
import pathlib, sys
import numpy as np
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    import jax, jax.numpy as jnp
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass
    from bench import _bank, _timeit_device, log
    from speech_recognition_tpu.decode.connected import connected_graph_arrays
    from speech_recognition_tpu.ops.gmm import gmm_emission_weights
    from speech_recognition_tpu.models.hmm import bank_nll_ubt
    from speech_recognition_tpu.ops.viterbi_banded import banded_arrays
    from speech_recognition_tpu.ops.viterbi_banded_pallas import (
        banded_topology, viterbi_banded_tb_pallas)
    from speech_recognition_tpu.utils.numerics import MATMUL_PRECISION

    bank = _bank()
    b, t = 512, 500
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.standard_normal((b, t, 39)), jnp.float32)
    nf = jnp.full((b,), t, jnp.int32)
    w, lw = gmm_emission_weights(*bank.flat_states())
    u, m, a = w.shape

    @jax.jit
    def gemm_only(nf_):
        ft = jnp.transpose(feats, (1, 0, 2))
        ft = ft * (1 + 0 * nf_[None, :, None].astype(jnp.float32))
        xa_t = jnp.concatenate(
            [ft * ft, ft, jnp.ones((t, b, 1), jnp.float32)], axis=-1
        ).reshape(t * b, a).T
        return jnp.dot(w.reshape(u * m, a), xa_t,
                       precision=MATMUL_PRECISION)

    def body_g(dep):
        nf2 = jnp.where(jnp.isnan(dep), nf + 1, nf)
        return jnp.sum(gemm_only(nf2))
    log(f"emission GEMM (+augment/transpose) only: "
        f"{_timeit_device(body_g)*1e3:.2f} ms")

    def body_full(dep):
        nf2 = jnp.where(jnp.isnan(dep), nf + 1, nf)
        return jnp.sum(bank_nll_ubt(bank, feats, nf2)[0])
    log(f"emission full (GEMM + mixture lse): "
        f"{_timeit_device(body_full)*1e3:.2f} ms")

    # frames_per_step sweep for the production word-graph kernel
    graph = connected_graph_arrays(bank, 7)
    bg = banded_arrays(graph)
    topo = banded_topology(bg)
    nll_ubt = jax.block_until_ready(bank_nll_ubt(bank, feats, nf))
    for fps in (2, 4, 8, 16):
        def body_v(dep, fps=fps):
            nf2 = jnp.where(jnp.isnan(dep), nf + 1, nf)
            final, bp8, eps_u, eps_prev = viterbi_banded_tb_pallas(
                nll_ubt, bg, nf2, topo, eps_depth=graph.eps_depth,
                bank_input=True, return_padded_bp=True, input_ubt=True,
                emit_eps_prev=True, frames_per_step=fps)
            return jnp.sum(final) + jnp.sum(bp8[0].astype(jnp.float32))
        log(f"pallas viterbi fps={fps}: {_timeit_device(body_v)*1e3:.2f} ms")


if __name__ == "__main__":
    main()
