"""Sweep the banded-Viterbi scan unroll factor on real hardware.

Measures the full connected-decode path (emission GEMM + banded scan +
backtrace) at the bench shapes, one compile per unroll value.  Run from
/root/repo:  python scripts/exp_unroll.py [--batch 64] [--frames 500]
"""

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--frames", type=int, default=500)
    ap.add_argument("--unrolls", type=int, nargs="+", default=[1, 2, 4, 8])
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

    from speech_recognition_tpu.decode.connected import (
        _decode_banded_batch,
        connected_graph_arrays,
    )
    from speech_recognition_tpu.ops.viterbi_banded import banded_arrays

    print(f"backend: {jax.default_backend()}", flush=True)
    bank = _bank()
    graph = connected_graph_arrays(bank, 7)
    bg = banded_arrays(graph)
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.standard_normal((args.batch, args.frames, 39)),
                        jnp.float32)
    n_frames = jnp.full((args.batch,), args.frames, jnp.int32)
    audio_s = args.batch * args.frames * 0.01

    ref = None
    for u in args.unrolls:
        def run(u=u):
            return _decode_banded_batch(bank, feats, n_frames, bg,
                                        eps_depth=graph.eps_depth, unroll=u)[2]
        t0 = time.perf_counter()
        out = np.asarray(run())
        compile_s = time.perf_counter() - t0
        if ref is None:
            ref = out
        else:
            assert np.array_equal(ref, out), f"unroll={u} changed results!"
        dt = _timeit(run)
        print(f"unroll={u}: {dt*1e3:7.1f} ms  {audio_s/dt:8.0f} audio-s/s "
              f"(compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
