"""Honest device-time measurement on the axon tunnel: a single fetch
times N data-dependent iterations inside one jit (lax.fori_loop), so
the per-dispatch tunnel round-trip amortizes away.  Slope between two N
values gives per-iteration device time.

Run: python scripts/exp_chained_timing.py [--batch 512]
"""

import argparse
import sys
import time

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
    from bench import _bank

    from speech_recognition_tpu.decode.connected import connected_graph_arrays
    from speech_recognition_tpu.ops.viterbi_banded import (
        banded_arrays,
        viterbi_banded_tb,
    )
    from speech_recognition_tpu.ops.viterbi_banded_pallas import (
        banded_topology,
        viterbi_banded_tb_pallas,
    )

    bank = _bank()
    graph = connected_graph_arrays(bank, 7)
    bg = banded_arrays(graph)
    topo = banded_topology(bg)
    b, t, s = args.batch, args.frames, graph.n_states
    rng = np.random.default_rng(1)
    nll_tb = jnp.asarray(rng.uniform(0, 10, (t, s, b)).astype(np.float32))
    n_frames = jnp.full((b,), t, jnp.int32)
    audio_s = b * t * 0.01
    print(f"backend: {jax.default_backend()}  S={s} B={b} T={t}", flush=True)

    def chained(body, n):
        @jax.jit
        def run(nll):
            def step(_, acc):
                # data dependence without meaningful compute: the kernel
                # can't start until acc exists, and acc folds into nf
                nf = jnp.where(jnp.isnan(acc), n_frames + 1, n_frames)
                out = body(nll, nf)
                return acc + out * jnp.float32(1e-30)
            return jax.lax.fori_loop(0, n, step, jnp.float32(0.0))
        return run

    def body_xla(nll, nf):
        f, bp = viterbi_banded_tb(nll, bg, nf, eps_depth=graph.eps_depth)
        return jnp.sum(f) + jnp.sum(bp[-1].astype(jnp.float32))

    def body_pl(nll, nf):
        f, bp = viterbi_banded_tb_pallas(nll, bg, nf, topo,
                                         eps_depth=graph.eps_depth,
                                         frames_per_step=1)
        return jnp.sum(f) + jnp.sum(bp[-1].astype(jnp.float32))

    for name, body in [("XLA scan", body_xla), ("Pallas K=1", body_pl)]:
        times = {}
        for n in (2, 12):
            fn = chained(body, n)
            np.asarray(fn(nll_tb))  # compile + warm
            t0 = time.perf_counter()
            for _ in range(3):
                np.asarray(fn(nll_tb))
            times[n] = (time.perf_counter() - t0) / 3
        per = (times[12] - times[2]) / 10
        print(f"RESULT {name:10s}: {per*1e3:7.2f} ms/iter device-time "
              f"({audio_s/per:9.0f} audio-s/s)  [raw: n2={times[2]*1e3:.1f}ms "
              f"n12={times[12]*1e3:.1f}ms]", flush=True)


if __name__ == "__main__":
    main()
