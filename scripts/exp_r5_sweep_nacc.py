"""Ring-sweep accumulator sweep (round-5): standalone timing of
``_hq_sweep_pallas`` at the dict1 production shape ([8, 16, 6272]
block, [144, 16, 6272] ring) for n_acc in {1, 2, 4, 8} — how much ILP
does the select chain have left?

Run (TPU): python -u scripts/exp_r5_sweep_nacc.py
"""
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
    from bench import _timeit_device, log
    from speech_recognition_tpu.ops.lattice import _hq_sweep_pallas

    rng = np.random.default_rng(0)
    dmax, f, b, lp = 128, 8, 16, 6272
    ring = jnp.asarray(rng.uniform(0, 50, (dmax + 2 * f, b, lp)),
                       jnp.float32)
    slotm = jnp.asarray(rng.integers(0, dmax + 1, (f, b, lp)), jnp.int32)

    ref = None
    for na in (1, 2, 4, 8):
        def body(dep, ring_, slotm_):
            r2 = ring_ + dep * 1e-30
            return jnp.sum(jnp.minimum(
                _hq_sweep_pallas(r2, slotm_, dmax, n_acc=na), 1e30) * 1e-30)

        try:
            dt = _timeit_device(body, args=(ring, slotm))
        except Exception as e:
            log(f"n_acc={na}: FAILED ({str(e)[:120]})")
            continue
        out = np.asarray(_hq_sweep_pallas(ring, slotm, dmax, n_acc=na))
        if ref is None:
            ref = out
        else:
            assert np.array_equal(ref, out), f"n_acc={na} mismatch"
        log(f"n_acc={na}: {dt*1e6:.1f} us/block "
            f"({dt/f*1e6:.1f} us/frame), exact")


if __name__ == "__main__":
    main()
