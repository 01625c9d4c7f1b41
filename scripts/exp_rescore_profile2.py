"""Round-2 profile of the [B, L] rescorer at dict1 scale: which of the
remaining op classes carries the 378 ms — the [Dmax, B, L] ring select,
the static lane gather d[:, pidx], the K-way first-min machinery, or
the ring carry traffic.  Run: python -u scripts/exp_rescore_profile2.py
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
    ec = jnp.asarray(rng.uniform(0, 50, (T, B, L)), jnp.float32)
    et = jnp.asarray(rng.integers(0, T, (T, B, L)), jnp.int32)
    pidx = jnp.asarray(rng.integers(0, L, (L, K)), jnp.int32)
    pcost = jnp.asarray(rng.uniform(0, 5, (L, K)), jnp.float32)
    base_l = jnp.asarray(rng.uniform(0, 5, (L,)), jnp.float32)

    def run(name, ring, sparse, kmin, dmax):
        iota_ring = jnp.arange(dmax)[:, None, None]
        iota_l = jnp.arange(L, dtype=jnp.int32)[None, :]

        @jax.jit
        def go(dep, ec, et):
            q = jnp.min(ec, axis=2)

            def step(carry, inputs):
                h_ring, q_ring = carry
                t, s0, tau, q_t = inputs
                if ring:
                    tau_c = jnp.clip(tau, 0, T - 1)
                    slot = (tau_c % dmax)[None]
                    sel = (iota_ring == slot).astype(h_ring.dtype)
                    hg = jnp.sum(h_ring * sel, axis=0)
                    qg = jnp.sum(q_ring[:, :, None] * sel, axis=0)
                else:
                    hg = qg = jnp.zeros_like(s0)
                d = s0 - qg + hg
                db = d + base_l[None, :]
                m_all = jnp.min(db, axis=1, keepdims=True)
                arg_all = jnp.min(jnp.where(db == m_all, iota_l,
                                            jnp.int32(L)), axis=1,
                                  keepdims=True)
                if sparse:
                    sc = (d[:, pidx.reshape(-1)].reshape(B, L, K)
                          + pcost[None])
                    h_sp = jnp.min(sc, axis=2)
                    if kmin:
                        iota_k = jnp.arange(K, dtype=jnp.int32)[None, None]
                        k_sp = jnp.min(
                            jnp.where(sc == h_sp[:, :, None], iota_k,
                                      jnp.int32(K)), axis=2)
                        p_sp = jnp.zeros((B, L), jnp.int32)
                        for ki in range(K):
                            p_sp = jnp.where(k_sp == ki, pidx[None, :, ki],
                                             p_sp)
                    else:
                        p_sp = jnp.zeros((B, L), jnp.int32)
                    take = h_sp < m_all
                    h_new = jnp.minimum(jnp.where(take, h_sp, m_all),
                                        POS_INF)
                    p_new = jnp.where(take, p_sp, arg_all)
                else:
                    h_new = jnp.minimum(m_all + jnp.zeros((B, L)), POS_INF)
                    p_new = arg_all + jnp.zeros((B, L), jnp.int32)
                h_ring = jax.lax.dynamic_update_slice(
                    h_ring, h_new[None], (t % dmax, 0, 0))
                q_ring = jax.lax.dynamic_update_slice(
                    q_ring, q_t[None], (t % dmax, 0))
                return (h_ring, q_ring), p_new[:1, :1]

            h0 = jnp.full((dmax, B, L), POS_INF, jnp.float32)
            q0 = jnp.full((dmax, B), POS_INF, jnp.float32)
            ec2 = ec + dep * jnp.float32(1e-30)
            _, pp = jax.lax.scan(step, (h0, q0),
                                 (jnp.arange(T), ec2, et, q))
            return jnp.sum(pp.astype(jnp.float32))

        dt = _timeit_device(lambda dep, a, b_: go(dep, a, b_), args=(ec, et))
        log(f"{name}: {dt*1e3:.1f} ms")

    run("full [B,L] (ring+sparse+kmin, dmax=128)", True, True, True, 128)
    run("no sparse gather", True, False, False, 128)
    run("sparse without k-min (h_sp only)", True, True, False, 128)
    run("no ring select", False, True, True, 128)
    run("dmax=32", True, True, True, 32)


if __name__ == "__main__":
    main()
