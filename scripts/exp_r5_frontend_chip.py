"""Round-5 on-chip validation of the fused Pallas spectral-chain
frontend (VERDICT r4 item 1):

1. compile + tiny-run sanity (fail fast on Mosaic lowering),
2. accuracy: max |err| vs the float64 psf oracle at mel/dct in
   {high, highest}, compared against the XLA production path
   (ndft:high) and the strict XLA highest path,
3. throughput at 256 x 5 s (device-time slope) vs the XLA production
   path, with the roofline row.

Run (TPU, serialized): python -u scripts/exp_r5_frontend_chip.py
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
    from speech_recognition_tpu.ops.frontend import mfcc39_batch, padded_length
    from speech_recognition_tpu.ops.frontend_pallas import mfcc39_pallas_batch
    from speech_recognition_tpu.utils import roofline
    from tests.oracles.frontend_ref import load_wav_as_mfcc_oracle
    from tests.test_frontend import synth_signal

    log(f"backend: {jax.default_backend()}")
    cfg = FrontendConfig()
    rng = np.random.default_rng(5)

    # ---- 1. tiny compile sanity ---------------------------------------
    b0, l0 = 8, 16000
    need = ((padded_length(cfg, l0) + 159) // 160 + 8) * 160
    sigs = np.zeros((b0, need), np.float32)
    raws = []
    for i in range(b0):
        s = synth_signal(rng, l0 - i * 700)
        raws.append(s)
        sigs[i, : len(s)] = s
    lengths = np.asarray([len(s) for s in raws], np.int32)
    feats, nf = mfcc39_pallas_batch(jnp.asarray(sigs), jnp.asarray(lengths),
                                    cfg)
    feats = np.asarray(jax.block_until_ready(feats))
    log(f"tiny fused run OK: {feats.shape}, nf={np.asarray(nf)[:4]}")

    # ---- 2. accuracy vs float64 oracle --------------------------------
    refs = [load_wav_as_mfcc_oracle(s) for s in raws]

    def maxerr(f):
        f = np.asarray(f)
        return max(np.max(np.abs(f[i, : r.shape[0]] - r))
                   for i, r in enumerate(refs))

    for mp, dp in (("high", "high"), ("highest", "highest")):
        fe, _ = mfcc39_pallas_batch(jnp.asarray(sigs), jnp.asarray(lengths),
                                    cfg, mel_precision=mp, dct_precision=dp)
        log(f"fused mel/dct={mp}: max err vs f64 oracle = "
            f"{maxerr(jax.block_until_ready(fe)):.3e}")
    fx, _ = mfcc39_batch(jnp.asarray(sigs), jnp.asarray(lengths), cfg)
    log(f"XLA production (ndft dft=high): max err = "
        f"{maxerr(jax.block_until_ready(fx)):.3e}")
    cfg_hi = FrontendConfig(dft_precision="highest")
    fx2, _ = mfcc39_batch(jnp.asarray(sigs), jnp.asarray(lengths), cfg_hi)
    log(f"XLA strict (ndft dft=highest): max err = "
        f"{maxerr(jax.block_until_ready(fx2)):.3e}")

    # ---- 3. throughput 256 x 5 s --------------------------------------
    b, samples = 256, 80000
    cap = padded_length(cfg, samples)
    need = ((cap + 159) // 160 + 8) * 160
    big = jnp.asarray(rng.standard_normal((b, need)).astype(np.float32))
    blen = jnp.full((b,), samples, jnp.int32)
    audio_s = b * samples / cfg.sample_rate

    def body_fused(dep):
        ln = jnp.where(jnp.isnan(dep), blen + 1, blen)
        f, _ = mfcc39_pallas_batch(big, ln, cfg)
        return jnp.sum(f)

    dt = _timeit_device(body_fused)
    log(f"fused frontend: {b} x 5 s in {dt*1e3:.2f} ms device-time "
        f"-> {audio_s/dt:.0f} audio-s/s")

    def body_xla(dep):
        ln = jnp.where(jnp.isnan(dep), blen + 1, blen)
        f, _ = mfcc39_batch(big[:, :cap], ln, cfg)
        return jnp.sum(f)

    dt_x = _timeit_device(body_xla)
    log(f"XLA production frontend: {dt_x*1e3:.2f} ms "
        f"-> {audio_s/dt_x:.0f} audio-s/s")

    bound = roofline.mfcc_fused(b, samples, n_frames=499)
    log(f"fused roofline: bound {bound['bound_s']*1e3:.2f} ms "
        f"({bound['limiter']}) -> {100*bound['bound_s']/dt:.0f}% of "
        f"speed-of-light")


if __name__ == "__main__":
    main()
