"""FFT vs GEMM-DFT on-chip: error vs f64 oracle + device time.
The GEMM DFT needs HIGHEST (6 bf16 passes) to hold the 1.3e-3 budget;
jnp.fft.rfft is true f32 — if XLA's TPU FFT is fast enough it wins on
both axes.  Run from /root/repo on TPU."""
import dataclasses, pathlib, sys
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
    from bench import _timeit_device, log
    from speech_recognition_tpu.config import FrontendConfig
    from speech_recognition_tpu.data.synthetic import SyntheticDigits
    from speech_recognition_tpu.ops.frontend import mfcc39, mfcc39_batch, padded_length
    from tests.oracles.frontend_ref import load_wav_as_mfcc_oracle

    gen = SyntheticDigits(seed=3)
    utts = gen.continuous_corpus(8)
    sigs = [np.asarray(u.samples, np.float64) for u in utts]
    cap = max(len(s) for s in sigs)
    base = FrontendConfig()
    L = padded_length(base, cap)
    variants = {
        "staged:highest": dataclasses.replace(base, dft_stage="staged",
                                              dft_precision="highest"),
        "staged:high": dataclasses.replace(base, dft_stage="staged"),
        "staged:default": dataclasses.replace(base, dft_stage="staged",
                                              dft_precision="default"),
        "ndft:high (prod)": base,
    }
    for name, cfg in variants.items():
        errs = []
        for s in sigs:
            buf = np.zeros(L, np.float32); buf[: len(s)] = s
            feats, nf = mfcc39(jnp.asarray(buf), jnp.int32(len(s)), cfg)
            ref = load_wav_as_mfcc_oracle(s)
            errs.append(float(np.max(np.abs(np.asarray(feats)[: ref.shape[0]] - ref))))
        log(f"{name:10s} max |err| vs f64 oracle: {max(errs):.3e}")

    batch, samples = 256, 80000
    Lb = padded_length(base, samples)
    rng = np.random.default_rng(0)
    sig = jnp.asarray(rng.standard_normal((batch, Lb)), jnp.float32)
    lens = jnp.full((batch,), samples, jnp.int32)
    audio_s = batch * samples / base.sample_rate
    for name, cfg in variants.items():
        def body(dep, cfg=cfg):
            l2 = jnp.where(jnp.isnan(dep), lens - 1, lens)
            return jnp.sum(mfcc39_batch(sig, l2, cfg)[0])
        dt = _timeit_device(body)
        log(f"{name:10s} mfcc39 batch 256 x 5 s: {dt*1e3:.2f} ms -> {audio_s/dt:.0f} audio-s/s")

if __name__ == "__main__":
    main()
