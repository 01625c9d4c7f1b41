"""Is the eps relaxation the scan bottleneck?  Time the [T,S,B] scan
with eps_depth 1 (production) vs 0 (timing-only, wrong semantics).
Run: python scripts/exp_eps_cost.py [--batch 512]
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

    bank = _bank()
    graph = connected_graph_arrays(bank, 7)
    g = banded_arrays(graph)
    rng = np.random.default_rng(1)
    b, t, s = args.batch, args.frames, graph.n_states
    nll_tb = jnp.asarray(rng.uniform(0, 10, (t, s, b)).astype(np.float32))
    n_frames = jnp.full((b,), t, jnp.int32)
    audio_s = b * t * 0.01
    print(f"backend: {jax.default_backend()}  V={g.n_words}", flush=True)

    for depth in (1, 0):
        def run(depth=depth):
            f, bp = viterbi_banded_tb(nll_tb, g, n_frames, eps_depth=depth)
            return jnp.sum(f) + jnp.sum(bp[-1].astype(jnp.int32))
        dt = _timeit(run)
        print(f"eps_depth={depth}: {dt*1e3:8.1f} ms  {audio_s/dt:8.0f} audio-s/s",
              flush=True)


if __name__ == "__main__":
    main()
