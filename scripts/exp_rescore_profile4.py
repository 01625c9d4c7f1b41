"""Round-4 rescorer profile: unrolled-where ring reads (no [Dmax,B,L]
select tensor in the graph) x sparse-gather formulations.
Run: python -u scripts/exp_rescore_profile4.py
"""
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
    from speech_recognition_tpu.utils.numerics import POS_INF

    rng = np.random.default_rng(0)
    T, L, B, K = 500, 6250, 16, 8
    ec = jnp.asarray(rng.uniform(0, 50, (T, B, L)), jnp.float32)
    et = jnp.asarray(rng.integers(0, T, (T, B, L)), jnp.int32)
    pidx = jnp.asarray(rng.integers(0, L, (L, K)), jnp.int32)
    pcost = jnp.asarray(rng.uniform(0, 5, (L, K)), jnp.float32)
    base_l = jnp.asarray(rng.uniform(0, 5, (L,)), jnp.float32)

    def run(name, sparse_mode, ring_mode, dmax):
        iota_l = jnp.arange(L, dtype=jnp.int32)[None, :]

        @jax.jit
        def go(dep, ec, et):
            q = jnp.min(ec, axis=2)

            def step(carry, inputs):
                h_ring, q_ring = carry
                t, s0, tau, q_t = inputs
                tau_c = jnp.clip(tau, 0, T - 1)
                slot = tau_c % dmax
                if ring_mode == "unroll":
                    hg = jnp.full((B, L), POS_INF, jnp.float32)
                    qg = jnp.zeros((B, L), jnp.float32)
                    for dd in range(dmax):
                        m = slot == dd
                        hg = jnp.where(m, h_ring[dd], hg)
                        qg = jnp.where(m, q_ring[dd][:, None], qg)
                elif ring_mode == "none":
                    hg = qg = jnp.zeros_like(s0)
                d = s0 - qg + hg
                db = d + base_l[None, :]
                m_all = jnp.min(db, axis=1, keepdims=True)
                arg_all = jnp.min(jnp.where(db == m_all, iota_l,
                                            jnp.int32(L)), axis=1,
                                  keepdims=True)
                if sparse_mode == "row":
                    d_lb = d.T
                    sc = (d_lb[pidx.reshape(-1)].reshape(L, K, B)
                          + pcost[:, :, None])
                    h_lb = jnp.min(sc, axis=1)
                    iota_k = jnp.arange(K, dtype=jnp.int32)[None, :, None]
                    k_lb = jnp.min(jnp.where(sc == h_lb[:, None, :], iota_k,
                                             jnp.int32(K)), axis=1)
                    p_lb = jnp.zeros((L, B), jnp.int32)
                    for ki in range(K):
                        p_lb = jnp.where(k_lb == ki, pidx[:, ki : ki + 1],
                                         p_lb)
                    h_sp, p_sp = h_lb.T, p_lb.T
                elif sparse_mode == "perk":
                    h_sp = jnp.full((B, L), POS_INF, jnp.float32)
                    p_sp = jnp.zeros((B, L), jnp.int32)
                    for ki in range(K):
                        cand = jnp.take(d, pidx[:, ki], axis=1) \
                            + pcost[None, :, ki]
                        tk = cand < h_sp
                        h_sp = jnp.where(tk, cand, h_sp)
                        p_sp = jnp.where(tk, pidx[None, :, ki], p_sp)
                elif sparse_mode == "lane":
                    sc = (d[:, pidx.reshape(-1)].reshape(B, L, K)
                          + pcost[None])
                    h_sp = jnp.min(sc, axis=2)
                    iota_k = jnp.arange(K, dtype=jnp.int32)[None, None]
                    k_sp = jnp.min(jnp.where(sc == h_sp[:, :, None], iota_k,
                                             jnp.int32(K)), axis=2)
                    p_sp = jnp.zeros((B, L), jnp.int32)
                    for ki in range(K):
                        p_sp = jnp.where(k_sp == ki, pidx[None, :, ki], p_sp)
                else:  # none
                    h_sp = jnp.full((B, L), POS_INF, jnp.float32)
                    p_sp = jnp.zeros((B, L), jnp.int32)
                take = h_sp < m_all
                h_new = jnp.minimum(jnp.where(take, h_sp, m_all), POS_INF)
                p_new = jnp.where(take, p_sp, arg_all)
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

    run("F unroll ring + lane sparse, dmax=128", "lane", "unroll", 128)
    run("G unroll ring + row sparse, dmax=128", "row", "unroll", 128)
    run("I no ring + row sparse", "row", "none", 128)
    run("J no ring + per-k takes", "perk", "none", 128)
    run("K unroll ring + per-k takes, dmax=128", "perk", "unroll", 128)


if __name__ == "__main__":
    main()
