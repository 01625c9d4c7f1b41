"""Round-3 stage split of the production headline at batch 512 x 500:
A emission (UBT layout), B Pallas Viterbi (+eps_prev side plane),
C value-carried Pallas backtrace.  Run from /root/repo on TPU."""
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
    from speech_recognition_tpu.models.hmm import bank_nll_ubt
    from speech_recognition_tpu.ops.viterbi_banded import banded_arrays
    from speech_recognition_tpu.ops.viterbi_banded_pallas import (
        banded_backtrace_tb_pallas, banded_topology, viterbi_banded_tb_pallas)

    bank = _bank()
    graph = connected_graph_arrays(bank, 7)
    bg = banded_arrays(graph)
    topo = banded_topology(bg)
    b, t = 512, 500
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.standard_normal((b, t, 39)), jnp.float32)
    nf = jnp.full((b,), t, jnp.int32)

    @jax.jit
    def emis_only(nf_):
        return bank_nll_ubt(bank, feats, nf_)
    def body_a(dep):
        nf2 = jnp.where(jnp.isnan(dep), nf + 1, nf)
        return jnp.sum(emis_only(nf2)[0])
    log(f"A emission UBT: {_timeit_device(body_a)*1e3:.2f} ms")

    nll_ubt = jax.block_until_ready(emis_only(nf))
    def body_b(dep):
        nf2 = jnp.where(jnp.isnan(dep), nf + 1, nf)
        final, bp8, eps_u, eps_prev = viterbi_banded_tb_pallas(
            nll_ubt, bg, nf2, topo, eps_depth=graph.eps_depth,
            bank_input=True, return_padded_bp=True, input_ubt=True,
            emit_eps_prev=True)
        return jnp.sum(final) + jnp.sum(bp8[0].astype(jnp.float32))
    log(f"B pallas viterbi (+eps_prev): {_timeit_device(body_b)*1e3:.2f} ms")

    final, bp8, eps_u, eps_prev = jax.block_until_ready(
        viterbi_banded_tb_pallas(
            nll_ubt, bg, nf, topo, eps_depth=graph.eps_depth,
            bank_input=True, return_padded_bp=True, input_ubt=True,
            emit_eps_prev=True))
    ends = bg.end_states[jnp.argmin(final[bg.end_states, :], axis=0)]

    # the bp planes must ride as ARGUMENTS, not closure constants — a
    # captured [T, S8, B] plane is embedded in the HLO and the remote
    # AOT service rejects the ~200 MB upload (HTTP 413)
    import functools, time

    @functools.partial(jax.jit, static_argnames=())
    def run_c(n, bp8_, eps_u_, eps_prev_, ends_, nf_):
        def step(_, acc):
            nf2 = nf_ + (acc * 1e-30).astype(jnp.int32)
            states, flags = banded_backtrace_tb_pallas(
                bp8_, eps_u_, bg, ends_, nf2, topo,
                eps_depth=graph.eps_depth, eps_prev=eps_prev_)
            return acc + jnp.sum(states[0].astype(jnp.float32)) * 1e-30
        return jax.lax.fori_loop(0, n, step, jnp.float32(0.0))

    args_c = (bp8, eps_u, eps_prev, ends, nf)
    np.asarray(run_c(jnp.int32(1), *args_c))
    def t(n, reps=3):
        t0 = time.perf_counter()
        for _ in range(reps):
            np.asarray(run_c(jnp.int32(n), *args_c))
        return (time.perf_counter() - t0) / reps
    n_lo, n_hi = 2, 12
    while True:
        tlo, thi = t(n_lo), t(n_hi)
        if thi - tlo >= 0.05 or n_hi >= 2048:
            break
        n_hi *= 4
    log(f"C value backtrace: {(thi - tlo) / (n_hi - n_lo) * 1e3:.2f} ms")

if __name__ == "__main__":
    main()
