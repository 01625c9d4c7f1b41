"""Time the Pallas state-major banded Viterbi vs the XLA scan on TPU,
and verify bit-parity on-device.  Run: python scripts/exp_pallas_tb.py
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
    from bench import _bank, _timeit

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
    rng = np.random.default_rng(1)
    b, t, s = args.batch, args.frames, graph.n_states
    nll_tb = jnp.asarray(rng.uniform(0, 10, (t, s, b)).astype(np.float32))
    n_frames = jnp.asarray(rng.integers(t // 2, t + 1, (b,)).astype(np.int32))
    audio_s = b * t * 0.01
    print(f"backend: {jax.default_backend()}  S={s} B={b} T={t}", flush=True)

    f0, bp0, eu0 = viterbi_banded_tb(nll_tb, bg, n_frames, eps_depth=graph.eps_depth)
    f1, bp1, eu1 = viterbi_banded_tb_pallas(nll_tb, bg, n_frames, topo,
                                            eps_depth=graph.eps_depth,
                                            frames_per_step=8)
    f0, f1 = np.asarray(f0), np.asarray(f1)
    bp0, bp1 = np.asarray(bp0), np.asarray(bp1)
    print("final equal:", np.array_equal(f0, f1),
          " bp equal:", np.array_equal(bp0, bp1),
          " eps_u equal:", np.array_equal(np.asarray(eu0, np.int32),
                                          np.asarray(eu1, np.int32)),
          flush=True)
    if not np.array_equal(bp0, bp1):
        d = np.argwhere(bp0 != bp1)
        print("n diffs", len(d), "first", d[:3],
              bp0[tuple(d[0])], bp1[tuple(d[0])], flush=True)

    def run_xla():
        f, bp, _ = viterbi_banded_tb(nll_tb, bg, n_frames,
                                     eps_depth=graph.eps_depth)
        return jnp.sum(f) + jnp.sum(bp[-1].astype(jnp.int32))

    def run_pl(k):
        def f_():
            f, bp, _ = viterbi_banded_tb_pallas(nll_tb, bg, n_frames, topo,
                                                eps_depth=graph.eps_depth,
                                                frames_per_step=k)
            return jnp.sum(f) + jnp.sum(bp[-1].astype(jnp.int32))
        return f_

    for name, fn in ([("XLA scan", run_xla)] +
                     [(f"Pallas K={k}", run_pl(k)) for k in (1, 2, 4)]):
        dt = _timeit(fn)
        print(f"{name:10s} {dt*1e3:8.1f} ms  {audio_s/dt:9.0f} audio-s/s",
              flush=True)


if __name__ == "__main__":
    main()
