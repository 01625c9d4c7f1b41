"""Emission GEMM precision dial at the headline shape: HIGHEST (6 bf16
passes, exact f32) vs HIGH (3 passes, ~2^-21 relative) vs DEFAULT
(1 pass, bf16).  Prints stage device time and the max relative NLL
error vs HIGHEST on-chip.  Run from /root/repo on TPU."""

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

    from bench import _bank, _timeit_device, log

    bank = _bank()
    b, t, d = 512, 500, 39
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
    nf = jnp.full((b,), t, jnp.int32)

    from speech_recognition_tpu.models.hmm import gmm_emission_weights

    means, log_vars, log_weights = bank.flat_states()
    w, lw = gmm_emission_weights(means, log_vars, log_weights)
    u, m, a = w.shape

    import functools

    @functools.partial(jax.jit, static_argnames=("prec",))
    def emis(feats, nf, prec):
        ft = jnp.transpose(feats, (1, 0, 2))
        xa_t = jnp.concatenate(
            [ft * ft, ft, jnp.ones((t, b, 1), feats.dtype)], axis=-1
        ).reshape(t * b, a).T
        pm = jnp.dot(w.reshape(u * m, a), xa_t,
                     precision=prec).reshape(u, m, t, b)
        z = lw[:, :, None, None] - pm
        zmax = jnp.max(z, axis=1, keepdims=True)
        return -(jnp.log(jnp.sum(jnp.exp(z - zmax), axis=1)) + zmax[:, 0])

    ref = emis(feats, nf, jax.lax.Precision.HIGHEST)
    for prec in (jax.lax.Precision.HIGHEST, jax.lax.Precision.HIGH,
                 jax.lax.Precision.DEFAULT):
        out = emis(feats, nf, prec)
        err = float(jnp.max(jnp.abs(out - ref) / (jnp.abs(ref) + 1e-6)))

        def body(dep, prec=prec):
            f2 = feats + jnp.where(jnp.isnan(dep), 1e-6, 0.0)
            return jnp.sum(emis(f2, nf, prec))

        dt = _timeit_device(body)
        log(f"emission {str(prec):22s}: {dt*1e3:.3f} ms, max rel err {err:.2e}")


if __name__ == "__main__":
    main()
