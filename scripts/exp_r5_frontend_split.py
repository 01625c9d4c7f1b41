"""Fused-frontend in-kernel stage accounting (round-5): time the
kernel with stages peeled off (dftonly / notail / full) at 256 x 5 s to
locate the gap between the 2.00 ms measured and the 1.08 ms bound.

Run (TPU): python -u scripts/exp_r5_frontend_split.py
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
    from speech_recognition_tpu.config import FrontendConfig
    from speech_recognition_tpu.ops.frontend import padded_length
    from speech_recognition_tpu.ops.frontend_pallas import mfcc39_pallas_batch

    cfg = FrontendConfig()
    rng = np.random.default_rng(5)
    b, samples = 256, 80000
    cap = padded_length(cfg, samples)
    need = ((cap + 159) // 160 + 8) * 160
    big = jnp.asarray(rng.standard_normal((b, need)).astype(np.float32))
    blen = jnp.full((b,), samples, jnp.int32)
    audio_s = b * samples / cfg.sample_rate

    for ustep in (1, 2, 4, 8):
        for stage in ("dftonly", "full"):
            def body(dep, stage=stage, ustep=ustep):
                ln = jnp.where(jnp.isnan(dep), blen + 1, blen)
                f, _ = mfcc39_pallas_batch(big, ln, cfg, debug_stages=stage,
                                           utts_per_step=ustep)
                return jnp.sum(f)

            dt = _timeit_device(body)
            log(f"fused[U={ustep}, {stage}]: {dt*1e3:.2f} ms "
                f"-> {audio_s/dt:.0f} audio-s/s")


if __name__ == "__main__":
    main()
