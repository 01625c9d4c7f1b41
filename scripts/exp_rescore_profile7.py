"""Round-4 rescorer profile 7: the COMMITTED lattice_rescore (with the
Pallas ring sweep) at dict1 scale, swept over its static knobs, plus a
component split of the recombine cost (lane takes vs global min) via an
in-script copy.

Run: python -u scripts/exp_rescore_profile7.py
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
    from speech_recognition_tpu.ops.lattice import lattice_rescore
    from speech_recognition_tpu.utils.numerics import POS_INF

    rng = np.random.default_rng(0)
    T, L, B, K = 500, 6250, 16, 8
    ec = jnp.asarray(rng.uniform(0, 50, (T, L, B)), jnp.float32)
    durs = rng.integers(1, 40, (T, L, B))
    et = jnp.asarray(np.maximum(np.arange(T)[:, None, None] - durs, 0),
                     jnp.int32)
    leaf_word = jnp.arange(L, dtype=jnp.int32)
    base_l = jnp.asarray(rng.uniform(0, 5, (L,)), jnp.float32)
    pidx = jnp.asarray(rng.integers(0, L, (L, K)), jnp.int32)
    pcost = jnp.asarray(rng.uniform(0, 5, (L, K)), jnp.float32)
    start = jnp.asarray(rng.uniform(0, 5, (L,)), jnp.float32)
    end = jnp.asarray(rng.uniform(0, 5, (L,)), jnp.float32)
    nf = jnp.full((B,), T, jnp.int32)
    big_dummy = jnp.zeros((L, L), jnp.float32)  # unused under backoff

    def run(name, **kw):
        def body(dep, ec_, et_):
            ec2 = ec_ + dep * jnp.float32(1e-30)
            r = lattice_rescore(ec2, et_, leaf_word, big_dummy, start, end,
                                nf, backoff=(base_l, pidx, pcost), **kw)
            return jnp.sum(r.cost) + jnp.sum(r.pred_w[:, 0, 0].astype(
                jnp.float32))
        dt = _timeit_device(body, args=(ec, et))
        log(f"{name}: {dt*1e3:.1f} ms ({B*T*0.01/dt:.0f} audio-s/s)")

    import os
    if os.environ.get("RESCORE7_SKIP_AB") != "1":
        run("A committed defaults (d128 f8 pallas)")
        run("B max_dur=64", max_dur=64)
    run("C max_dur=64 f_blk=16", max_dur=64, block_frames=16)
    run("F max_dur=32", max_dur=32)

    # component split: in-script copy of the [B, L] step with toggles
    iota_l = jnp.arange(L, dtype=jnp.int32)[None, :]

    def split(name, takes=True, sweep=True, glob=True):
        f_blk, dmax = 8, 128
        ec_bl = jnp.transpose(ec, (0, 2, 1))
        et_bl = jnp.transpose(et, (0, 2, 1))
        t_pad = (T + f_blk - 1) // f_blk * f_blk
        lp = (L + 127) // 128 * 128
        ec_p = jnp.pad(ec_bl, ((0, t_pad - T), (0, 0), (0, lp - L)),
                       constant_values=POS_INF)
        et_p = jnp.pad(et_bl, ((0, t_pad - T), (0, 0), (0, lp - L)))
        base_p = jnp.pad(base_l, (0, lp - L), constant_values=POS_INF)
        pidx_p = jnp.pad(pidx, ((0, lp - L), (0, 0)))
        pcost_p = jnp.pad(pcost, ((0, lp - L), (0, 0)),
                          constant_values=POS_INF)
        start_p = jnp.pad(start, (0, lp - L), constant_values=POS_INF)
        il = jnp.arange(lp, dtype=jnp.int32)[None, :]

        from speech_recognition_tpu.ops.lattice import _hq_sweep_pallas

        def recombine(d):
            db = d + base_p[None, :]
            if glob:
                m_all = jnp.min(db, axis=1, keepdims=True)
                arg_all = jnp.min(jnp.where(db == m_all, il, jnp.int32(lp)),
                                  axis=1, keepdims=True)
            else:
                m_all = db[:, :1]
                arg_all = jnp.zeros((B, 1), jnp.int32)
            h_sp = jnp.full((B, lp), POS_INF, d.dtype)
            p_sp = jnp.zeros((B, lp), jnp.int32)
            if takes:
                for ki in range(K):
                    cand = (jnp.take(d, pidx_p[:, ki], axis=1)
                            + pcost_p[None, :, ki])
                    tk = cand < h_sp
                    h_sp = jnp.where(tk, cand, h_sp)
                    p_sp = jnp.where(tk, pidx_p[None, :, ki], p_sp)
            take_sp = h_sp < m_all
            h_new = jnp.minimum(jnp.where(take_sp, h_sp, m_all), POS_INF)
            p_new = jnp.where(take_sp, p_sp, arg_all).astype(jnp.int32)
            return h_new, p_new

        @jax.jit
        def go(dep, ec_p, et_p):
            ecx = ec_p + dep * jnp.float32(1e-30)
            q = jnp.min(ecx, axis=2)

            def step(carry, inputs):
                hq_ring, d_fin = carry
                t0, s0_f, tau_f, q_f = inputs
                tau_c = jnp.clip(tau_f, 0, t_pad - 1)
                slot = tau_c % dmax
                ts = t0 + jnp.arange(f_blk)
                coarse = (tau_c < t0) & ((ts[:, None, None] - tau_c) <= dmax)
                if sweep:
                    slotm = jnp.where(coarse, slot, jnp.int32(dmax))
                    hq = _hq_sweep_pallas(hq_ring, slotm, dmax)
                else:
                    hq = jnp.where(coarse, 0.0, POS_INF)
                h_rows, p_rows = [], []
                for f in range(f_blk):
                    hq_f = hq[f]
                    for ff in range(f):
                        m = tau_c[f] == t0 + ff
                        hq_f = jnp.where(m, h_rows[ff] - q_f[ff][:, None],
                                         hq_f)
                    is_start = tau_f[f] <= 0
                    d = jnp.where(is_start, s0_f[f] + start_p[None, :],
                                  s0_f[f] + hq_f)
                    h_new, p_new = recombine(d)
                    h_rows.append(h_new)
                    p_rows.append(p_new)
                    d_fin = jnp.where(ts[f] == T - 1, d, d_fin)
                hq_ring = jax.lax.dynamic_update_slice(
                    hq_ring, jnp.stack(h_rows) - q_f[:, :, None],
                    (t0 % dmax, 0, 0))
                return (hq_ring, d_fin), jnp.stack(p_rows)[:, :1, :1]

            h0 = jnp.full((dmax, B, lp), POS_INF, jnp.float32)
            d0 = jnp.full((B, lp), POS_INF, jnp.float32)
            nb = t_pad // f_blk
            (_, dfin), pp = jax.lax.scan(
                step, (h0, d0),
                (jnp.arange(nb) * f_blk,
                 ec_p.reshape(nb, f_blk, B, lp),
                 et_p.reshape(nb, f_blk, B, lp),
                 q.reshape(nb, f_blk, B)))
            return jnp.sum(dfin * 0) + jnp.sum(pp.astype(jnp.float32))

        dt = _timeit_device(lambda dep, a, b_: go(dep, a, b_),
                            args=(ec_p, et_p))
        log(f"{name}: {dt*1e3:.1f} ms")

    split("G split full (sanity ~A)")
    split("H no lane takes", takes=False)
    split("I no ring sweep", sweep=False)
    split("J no global argmin", glob=False)


if __name__ == "__main__":
    main()
