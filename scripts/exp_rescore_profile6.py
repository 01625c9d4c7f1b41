"""Round-4 rescorer profile 6: component split of the COMMITTED blocked
combined-ring form (ops/lattice.lattice_rescore), by toggling pieces of
an in-script copy:

  full        - as committed (sanity vs bench's ~250 ms)
  nosparse    - recombine = global backoff min only (isolates the K
                lane-takes + merge)
  noring      - hq lookup stubbed to s0-only (isolates the blocked ring
                sweep)
  d64 / d32   - full form at smaller ring depths (adaptive-dmax win)

Run: python -u scripts/exp_rescore_profile6.py
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
    # realistic taus: within [t-40, t) mostly (typical word durations)
    durs = rng.integers(1, 40, (T, B, L))
    et = jnp.asarray(np.maximum(np.arange(T)[:, None, None] - durs, 0),
                     jnp.int32)
    pidx = jnp.asarray(rng.integers(0, L, (L, K)), jnp.int32)
    pcost = jnp.asarray(rng.uniform(0, 5, (L, K)), jnp.float32)
    base_l = jnp.asarray(rng.uniform(0, 5, (L,)), jnp.float32)

    def run(name, dmax, sparse=True, ring=True, f_blk=8):
        iota_l = jnp.arange(L, dtype=jnp.int32)[None, :]
        iota_d = jnp.arange(dmax, dtype=jnp.int32)[:, None, None, None]
        t_pad = (T + f_blk - 1) // f_blk * f_blk

        def recombine(d):
            db = d + base_l[None, :]
            m_all = jnp.min(db, axis=1, keepdims=True)
            arg_all = jnp.min(jnp.where(db == m_all, iota_l, jnp.int32(L)),
                              axis=1, keepdims=True)
            if not sparse:
                return (jnp.minimum(m_all + jnp.zeros((B, L)), POS_INF),
                        (arg_all + jnp.zeros((B, L), jnp.int32)))
            h_sp = jnp.full((B, L), POS_INF, d.dtype)
            p_sp = jnp.zeros((B, L), jnp.int32)
            for ki in range(K):
                cand = jnp.take(d, pidx[:, ki], axis=1) + pcost[None, :, ki]
                tk = cand < h_sp
                h_sp = jnp.where(tk, cand, h_sp)
                p_sp = jnp.where(tk, pidx[None, :, ki], p_sp)
            take_sp = h_sp < m_all
            h_new = jnp.minimum(jnp.where(take_sp, h_sp, m_all), POS_INF)
            p_new = jnp.where(take_sp, p_sp, arg_all).astype(jnp.int32)
            return h_new, p_new

        @jax.jit
        def go(dep, ec, et):
            ec_bl = ec + dep * jnp.float32(1e-30)
            if t_pad != T:
                ec_bl = jnp.pad(ec_bl, ((0, t_pad - T), (0, 0), (0, 0)),
                                constant_values=POS_INF)
                et = jnp.pad(et, ((0, t_pad - T), (0, 0), (0, 0)))
            q = jnp.min(ec_bl, axis=2)

            def step(carry, inputs):
                hq_ring, d_fin = carry
                t0, s0_f, tau_f, q_f = inputs
                tau_c = jnp.clip(tau_f, 0, t_pad - 1)
                slot = tau_c % dmax
                ts = t0 + jnp.arange(f_blk)
                if ring:
                    coarse = (tau_c < t0) & (
                        (ts[:, None, None] - tau_c) <= dmax)
                    sel = ((iota_d == slot[None])
                           & coarse[None]).astype(s0_f.dtype)
                    hq = jnp.sum(hq_ring[:, None, :, :] * sel, axis=0)
                    hq = jnp.where(coarse, hq, POS_INF)
                else:
                    hq = jnp.zeros_like(s0_f)
                h_rows, p_rows = [], []
                for f in range(f_blk):
                    hq_f = hq[f]
                    for ff in range(f):
                        m = tau_c[f] == t0 + ff
                        hq_f = jnp.where(m, h_rows[ff] - q_f[ff][:, None],
                                         hq_f)
                    is_start = tau_f[f] <= 0
                    d = jnp.where(is_start, s0_f[f], s0_f[f] + hq_f)
                    h_new, p_new = recombine(d)
                    h_rows.append(h_new)
                    p_rows.append(p_new)
                    d_fin = jnp.where(ts[f] == T - 1, d, d_fin)
                hq_ring = jax.lax.dynamic_update_slice(
                    hq_ring, jnp.stack(h_rows) - q_f[:, :, None],
                    (t0 % dmax, 0, 0))
                return (hq_ring, d_fin), jnp.stack(p_rows)[:, :1, :1]

            h0 = jnp.full((dmax, B, L), POS_INF, jnp.float32)
            d0 = jnp.full((B, L), POS_INF, jnp.float32)
            nb = t_pad // f_blk
            (_, dfin), pp = jax.lax.scan(
                step, (h0, d0),
                (jnp.arange(nb) * f_blk,
                 ec_bl.reshape(nb, f_blk, B, L),
                 et.reshape(nb, f_blk, B, L),
                 q.reshape(nb, f_blk, B)))
            return jnp.sum(dfin * 0) + jnp.sum(pp.astype(jnp.float32))

        dt = _timeit_device(lambda dep, a, b_: go(dep, a, b_), args=(ec, et))
        log(f"{name}: {dt*1e3:.1f} ms")

    run("A full blocked d128 (committed form)", 128)
    run("B nosparse d128", 128, sparse=False)
    run("C noring d128", 128, ring=False)
    run("D full d64", 64)
    run("E full d32", 32)
    run("F full d32 fblk16", 32, f_blk=16)


if __name__ == "__main__":
    main()
