"""Frontend spectral-GEMM precision dial, measured on-chip.

Round-1 finding: the TPU's default bf16 matmul pass corrupts MFCCs by
~4.7 absolute vs the float64 oracle, so the DFT/mel/DCT chain ran at
Precision.HIGHEST (6 bf16 passes).  VERDICT round-2 item 4: HIGHEST
makes the frontend the serving bottleneck (3.56 ms of the 5.33 ms
pipeline at batch 256 x 5 s).  This experiment measures, per precision
setting {highest, high, default}:

* max absolute error of the standardized 39-dim features vs the
  float64 psf oracle on realistic (speech-spectrum) signals, and
* steady-state device time of mfcc39_batch at batch 256 x 5 s.

Run from /root/repo on TPU: ``python scripts/exp_frontend_precision.py``.
"""

import dataclasses
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
    from speech_recognition_tpu.data.synthetic import SyntheticDigits
    from speech_recognition_tpu.ops.frontend import mfcc39, mfcc39_batch, \
        padded_length
    from tests.oracles.frontend_ref import load_wav_as_mfcc_oracle

    # --- error vs float64 oracle on realistic signals -------------------
    gen = SyntheticDigits(seed=3)
    utts = gen.continuous_corpus(8)
    sigs = [np.asarray(u.samples, np.float64) for u in utts]
    cap = max(len(s) for s in sigs)
    base = FrontendConfig()
    L = padded_length(base, cap)
    for prec in ("highest", "high", "default"):
        cfg = dataclasses.replace(base, spectral_precision=prec)
        errs = []
        for s in sigs:
            buf = np.zeros(L, np.float32)
            buf[: len(s)] = s
            feats, nf = mfcc39(jnp.asarray(buf), jnp.int32(len(s)), cfg)
            ref = load_wav_as_mfcc_oracle(s)
            err = float(np.max(np.abs(
                np.asarray(feats)[: ref.shape[0]] - ref)))
            errs.append(err)
        log(f"precision={prec:8s} max |err| vs f64 oracle "
            f"(standardized 39-dim): {max(errs):.3e}")

    # --- device time at the serving shape --------------------------------
    batch, samples = 256, 80000
    Lb = padded_length(base, samples)
    rng = np.random.default_rng(0)
    sig = jnp.asarray(rng.standard_normal((batch, Lb)), jnp.float32)
    lens = jnp.full((batch,), samples, jnp.int32)
    audio_s = batch * samples / base.sample_rate
    for prec in ("highest", "high", "default"):
        cfg = dataclasses.replace(base, spectral_precision=prec)

        def body(dep, cfg=cfg):
            l2 = jnp.where(jnp.isnan(dep), lens - 1, lens)
            return jnp.sum(mfcc39_batch(sig, l2, cfg)[0])

        dt = _timeit_device(body)
        log(f"precision={prec:8s} mfcc39 batch {batch} x 5 s: "
            f"{dt*1e3:.2f} ms -> {audio_s/dt:.0f} audio-s/s")

    # --- per-stage combos: which GEMM actually burns the error budget?
    # (hypothesis: the mel sum over a ~10-decade power spectrum + log
    # floor amplification, not the DFT itself)
    combos = [
        ("high", "highest", "highest"),
        ("highest", "high", "high"),
        ("high", "highest", "high"),
        ("default", "highest", "highest"),
    ]
    for dft_p, mel_p, dct_p in combos:
        cfg = dataclasses.replace(base, dft_precision=dft_p,
                                  mel_precision=mel_p, dct_precision=dct_p)
        errs = []
        for s in sigs:
            buf = np.zeros(L, np.float32)
            buf[: len(s)] = s
            feats, nf = mfcc39(jnp.asarray(buf), jnp.int32(len(s)), cfg)
            ref = load_wav_as_mfcc_oracle(s)
            errs.append(float(np.max(np.abs(
                np.asarray(feats)[: ref.shape[0]] - ref))))

        def body(dep, cfg=cfg):
            l2 = jnp.where(jnp.isnan(dep), lens - 1, lens)
            return jnp.sum(mfcc39_batch(sig, l2, cfg)[0])

        dt = _timeit_device(body)
        log(f"dft={dft_p:8s} mel={mel_p:8s} dct={dct_p:8s}: "
            f"err {max(errs):.3e}, {dt*1e3:.2f} ms "
            f"-> {audio_s/dt:.0f} audio-s/s")


if __name__ == "__main__":
    main()
