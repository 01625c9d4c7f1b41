"""Where do the MFCC milliseconds go?  Times (a) pre-emphasis+framing
prep alone, (b) the Pallas spectral kernel on pre-framed input,
(c) the XLA GEMM chain on pre-framed input.  Run from /root/repo on TPU."""
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
    from bench import _timeit_device, log
    from speech_recognition_tpu.config import FrontendConfig
    from speech_recognition_tpu.ops.frontend import (
        _frame_signal, _frontend_constants, padded_length)

    cfg = FrontendConfig()
    batch, samples = 256, 80000
    L = padded_length(cfg, samples)
    fl, fs = cfg.frame_len, cfg.frame_step
    F = 1 + max(0, (L - fl) // fs)
    rng = np.random.default_rng(0)
    sig = jnp.asarray(rng.standard_normal((batch, L)) * 3000, jnp.float32)
    lens = jnp.full((batch,), samples, jnp.int32)
    consts = {k: jnp.asarray(v, jnp.float32)
              for k, v in _frontend_constants(cfg).items()}

    @jax.jit
    def prep(sig, lens):
        def one(s, n):
            emph = jnp.concatenate([s[:1], s[1:] - cfg.effective_preemph * s[:-1]])
            emph = jnp.where(jnp.arange(L) < n, emph, 0.0)
            return _frame_signal(emph, F, fl, fs)
        return jax.vmap(one)(sig, lens)

    frames = prep(sig, lens)
    def body_prep(dep):
        l2 = jnp.where(jnp.isnan(dep), lens - 1, lens)
        return jnp.sum(prep(sig, l2)[:, 0, 0])
    log(f"prep (preemph+framing): {_timeit_device(body_prep)*1e3:.2f} ms")

    HI = jax.lax.Precision.HIGHEST
    @jax.jit
    def xla_chain(frames):
        re = jnp.dot(frames, consts["dft_cos"], precision=HI)
        im = jnp.dot(frames, consts["dft_sin"], precision=HI)
        power = (re * re + im * im) * (1.0 / cfg.n_fft)
        mel = jnp.dot(power, consts["mel_w"], precision=HI)
        mel = jnp.where(mel <= 0.0, 2.2e-16, mel)
        ceps = jnp.dot(jnp.log(mel), consts["dct_m"], precision=HI)
        return ceps * consts["lifter"][None, :]
    def body_xla(dep):
        f2 = frames + jnp.where(jnp.isnan(dep), 1.0, 0.0)
        return jnp.sum(xla_chain(f2))
    log(f"XLA GEMM chain on frames: {_timeit_device(body_xla)*1e3:.2f} ms")

    # Pallas kernel on pre-framed input: replicate pallas_mfcc's kernel
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    F_pad = ((F + 7) // 8) * 8
    n_bins = consts["dft_cos"].shape[1]
    bins_pad = ((n_bins + 127) // 128) * 128
    def pad2(a, r, c):
        out = np.zeros((r, c), np.float32)
        a = np.asarray(a); out[: a.shape[0], : a.shape[1]] = a
        return out
    dft_cos = jnp.asarray(pad2(consts["dft_cos"], fl, bins_pad))
    dft_sin = jnp.asarray(pad2(consts["dft_sin"], fl, bins_pad))
    mel_w = jnp.asarray(pad2(consts["mel_w"], bins_pad, 128))
    dct_m = jnp.asarray(pad2(np.asarray(consts["dct_m"]) *
                             np.asarray(consts["lifter"])[None, :], 128, 128))
    framesP = jnp.pad(frames, ((0, 0), (0, F_pad - F), (0, 0)))

    def kernel(fr_ref, cos_ref, sin_ref, mel_ref, dct_ref, out_ref):
        fr = fr_ref[0]
        re = jnp.dot(fr, cos_ref[...], preferred_element_type=jnp.float32,
                     precision=HI)
        im = jnp.dot(fr, sin_ref[...], preferred_element_type=jnp.float32,
                     precision=HI)
        power = (re * re + im * im) * (1.0 / cfg.n_fft)
        lane = jax.lax.broadcasted_iota(jnp.int32, power.shape, 1)
        power = jnp.where(lane < n_bins, power, 0.0)
        mel = jnp.dot(power, mel_ref[...], preferred_element_type=jnp.float32,
                      precision=HI)
        mel = jnp.where(mel <= 0.0, 2.2e-16, mel)
        out_ref[0] = jnp.dot(jnp.log(mel), dct_ref[...],
                             preferred_element_type=jnp.float32, precision=HI)

    @jax.jit
    def pallas_chain(framesP):
        const = lambda i: (0, 0)
        return pl.pallas_call(
            kernel,
            grid=(batch,),
            in_specs=[
                pl.BlockSpec((1, F_pad, fl), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((fl, bins_pad), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((fl, bins_pad), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((bins_pad, 128), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((128, 128), const, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, F_pad, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((batch, F_pad, 128), jnp.float32),
        )(framesP, dft_cos, dft_sin, mel_w, dct_m)
    def body_pal(dep):
        f2 = framesP + jnp.where(jnp.isnan(dep), 1.0, 0.0)
        return jnp.sum(pallas_chain(f2))
    log(f"Pallas chain on frames: {_timeit_device(body_pal)*1e3:.2f} ms")

if __name__ == "__main__":
    main()
