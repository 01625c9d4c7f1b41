"""Fused Pallas MFCC vs the XLA chain at the serving shape.

The XLA mfcc39 path materializes framing + re/im + power intermediates
in HBM (~600 MB at batch 256 x 5 s) — about half its 3.57 ms.  The
fused kernel keeps the spectral chain VMEM-resident.  Measures device
time of the FULL 39-dim path (kernel + deltas + standardize) and the
max abs diff vs the XLA path.  Run from /root/repo on TPU."""
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
        delta_feature, mfcc39_batch, padded_length, standardize)
    from speech_recognition_tpu.ops.pallas_kernels import pallas_mfcc

    cfg = FrontendConfig()
    batch, samples = 256, 80000
    L = padded_length(cfg, samples)
    rng = np.random.default_rng(0)
    sig = jnp.asarray(rng.standard_normal((batch, L)) * 3000, jnp.float32)
    lens = jnp.full((batch,), samples, jnp.int32)
    audio_s = batch * samples / cfg.sample_rate

    @jax.jit
    def fused39(sig, lens):
        ceps, nf = pallas_mfcc(sig, lens, cfg)
        def one(c, n):
            d1 = delta_feature(c, n)
            d2 = delta_feature(d1, n)
            return standardize(jnp.concatenate([c, d1, d2], axis=1), n)
        return jax.vmap(one)(ceps, nf), nf

    # parity vs the XLA path
    ref, nf_r = mfcc39_batch(sig, lens, cfg)
    out, nf_o = fused39(sig, lens)
    err = float(jnp.max(jnp.abs(out - ref)))
    log(f"pallas_mfcc39 vs XLA mfcc39: max abs diff {err:.3e} "
        f"(nf equal: {bool(jnp.all(nf_r == nf_o))})")

    def body_x(dep):
        l2 = jnp.where(jnp.isnan(dep), lens - 1, lens)
        return jnp.sum(mfcc39_batch(sig, l2, cfg)[0])
    dt = _timeit_device(body_x)
    log(f"XLA mfcc39   : {dt*1e3:.2f} ms -> {audio_s/dt:.0f} audio-s/s")

    def body_p(dep):
        l2 = jnp.where(jnp.isnan(dep), lens - 1, lens)
        return jnp.sum(fused39(sig, l2)[0])
    dt = _timeit_device(body_p)
    log(f"pallas mfcc39: {dt*1e3:.2f} ms -> {audio_s/dt:.0f} audio-s/s")

if __name__ == "__main__":
    main()
