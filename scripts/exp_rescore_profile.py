"""Profile the lattice rescorer at dict1 scale (L=6250, B=16, T=500):
which op class eats the 517 ms — the H/Q ring reads (O(L*B*Dmax)
iota-compare selects), the backoff sparse gather (d[pidx]), the
predecessor argmin machinery, or the ring carry traffic.  Variants
time structurally reduced scans on the same planes.

Run from /root/repo on TPU: python -u scripts/exp_rescore_profile.py
"""
import functools, pathlib, sys
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
    from speech_recognition_tpu.utils.numerics import POS_INF

    rng = np.random.default_rng(0)
    T, L, B, K = 500, 6250, 16, 8
    DMAX = 128
    ends_cost = jnp.asarray(
        np.where(rng.uniform(size=(T, L, B)) < 0.5,
                 rng.uniform(0, 50, (T, L, B)), POS_INF), jnp.float32)
    ends_tau = jnp.asarray(
        rng.integers(0, T, (T, L, B)), jnp.int32)
    pidx = jnp.asarray(rng.integers(0, L, (L, K)), jnp.int32)
    pcost = jnp.asarray(rng.uniform(0, 5, (L, K)), jnp.float32)
    base_l = jnp.asarray(rng.uniform(0, 5, (L,)), jnp.float32)
    nf = jnp.full((B,), T, jnp.int32)

    def run_variant(name, with_ring, with_sparse, with_pred, dmax):
        iota_ring = jnp.arange(dmax)[None, None, :]

        @functools.partial(jax.jit)
        def go(dep, ec, et):
            q = jnp.min(ec, axis=1)

            def step(carry, inputs):
                h_ring, q_ring = carry
                t, s0, tau, q_t = inputs
                if with_ring:
                    tau_c = jnp.clip(tau, 0, T - 1)
                    slot = (tau_c % dmax)[:, :, None]
                    sel = (iota_ring == slot).astype(h_ring.dtype)
                    hg = jnp.sum(h_ring * sel, axis=2)
                    qg = jnp.sum(q_ring[None, :, :] * sel, axis=2)
                    in_w = (t - tau_c) <= dmax
                    hg = jnp.where(in_w, hg, POS_INF)
                else:
                    hg = jnp.zeros_like(s0)
                    qg = jnp.zeros_like(s0)
                is_start = tau <= 0
                base = jnp.where(is_start, s0, s0 - qg)
                d = base + jnp.where(is_start, 0.0, hg)
                db = d + base_l[:, None]
                m_all = jnp.min(db, axis=0)
                if with_pred:
                    arg_all = jnp.argmin(db, axis=0).astype(jnp.int32)
                if with_sparse:
                    sc = (d[pidx.reshape(-1)].reshape(L, K, B)
                          + pcost[:, :, None])
                    h_sp = jnp.min(sc, axis=1)
                    if with_pred:
                        a_sp = jnp.argmin(sc, axis=1)
                        p_sp = jnp.take_along_axis(
                            jnp.broadcast_to(pidx[:, :, None], (L, K, B)),
                            a_sp[:, None, :], axis=1)[:, 0, :]
                    take = h_sp < m_all[None, :]
                    h_new = jnp.minimum(
                        jnp.where(take, h_sp, m_all[None, :]), POS_INF)
                    if with_pred:
                        p_new = jnp.where(take, p_sp,
                                          arg_all[None, :]).astype(jnp.int32)
                else:
                    h_new = jnp.minimum(m_all[None, :]
                                        + jnp.zeros((L, B)), POS_INF)
                    if with_pred:
                        p_new = (arg_all[None, :]
                                 + jnp.zeros((L, B), jnp.int32))
                h_ring = jax.lax.dynamic_update_slice(
                    h_ring, h_new[:, :, None], (0, 0, t % dmax))
                q_ring = jax.lax.dynamic_update_slice(
                    q_ring, q_t[:, None], (0, t % dmax))
                if not with_pred:
                    p_new = jnp.zeros((1, 1), jnp.int32)
                return (h_ring, q_ring), (d[:1, :1], p_new[:1, :1])

            h0 = jnp.full((L, B, dmax), POS_INF, jnp.float32)
            q0 = jnp.full((B, dmax), POS_INF, jnp.float32)
            ec2 = ec + dep * jnp.float32(1e-30)
            _, (dd, pp) = jax.lax.scan(
                step, (h0, q0), (jnp.arange(T), ec2, et, q + dep * 0))
            return jnp.sum(dd) + jnp.sum(pp.astype(jnp.float32))

        dt = _timeit_device(lambda dep, ec, et: go(dep, ec, et),
                            args=(ends_cost, ends_tau))
        log(f"{name}: {dt*1e3:.1f} ms")
        return dt

    run_variant("full (ring+sparse+pred, dmax=128)", True, True, True, DMAX)
    run_variant("no pred recording", True, True, False, DMAX)
    run_variant("no sparse gather (global backoff only)", True, False, True,
                DMAX)
    run_variant("no ring reads (H/Q lookups removed)", False, True, True,
                DMAX)
    run_variant("dmax=32", True, True, True, 32)


if __name__ == "__main__":
    main()
