"""Micro-bench: per-frame sparse-predecessor gather strategies at the
dict1 rescorer shape ([B=16, Lp=6272] f32, K=8 static index columns).
Each variant computes EXACTLY h_sp = min_k d[:, pidx[:, k]] + pcost[:, k]
(and the argmin k -> predecessor id) 500 times in a chained scan, so the
numbers are directly the rescorer's per-sentence sparse cost.

Run: python -u scripts/exp_take_micro.py
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
    B, L, K, T = 16, 6272, 8, 500
    d0 = jnp.asarray(rng.uniform(0, 50, (B, L)), jnp.float32)
    pidx = jnp.asarray(rng.integers(0, L, (L, K)), jnp.int32)
    pcost = jnp.asarray(rng.uniform(0, 5, (L, K)), jnp.float32)
    pidx_flat = pidx.T.reshape(-1)  # [K*L] k-major

    def scan_over(fn):
        @jax.jit
        def go(dep, d):
            def step(c, _):
                h, p = fn(c)
                return h + p.astype(jnp.float32) * jnp.float32(1e-30), None
            out, _ = jax.lax.scan(step, d + dep * 1e-30, None, length=T)
            return jnp.sum(out)
        return go

    def run(name, fn):
        go = scan_over(fn)
        dt = _timeit_device(lambda dep, d: go(dep, d), args=(d0,))
        log(f"{name}: {dt*1e3:.1f} ms total, {dt/T*1e6:.1f} us/frame")

    # A: current form — K separate lane takes
    def lane_takes(d):
        h = jnp.full((B, L), POS_INF, jnp.float32)
        p = jnp.zeros((B, L), jnp.int32)
        for k in range(K):
            cand = jnp.take(d, pidx[:, k], axis=1) + pcost[None, :, k]
            tk = cand < h
            h = jnp.where(tk, cand, h)
            p = jnp.where(tk, pidx[None, :, k], p)
        return h, p

    # B: transpose -> ONE row take of [K*L] -> min over k in [K, L, B]
    #    sublane layout -> transpose back
    def row_take(d):
        dT = d.T  # [L, B]
        rows = jnp.take(dT, pidx_flat, axis=0)  # [K*L, B]
        cand = rows.reshape(K, L, B) + pcost.T[:, :, None]
        h = jnp.min(cand, axis=0)  # [L, B]
        iota_k = jnp.arange(K, dtype=jnp.int32)[:, None, None]
        ak = jnp.min(jnp.where(cand == h[None], iota_k, jnp.int32(K)),
                     axis=0)  # [L, B] first-min k
        pT = jnp.take_along_axis(
            pidx.T, jnp.clip(ak.T % K, 0, K - 1), axis=... ) if False else None
        # predecessor id via gather-free select: p = pidx[l, ak]
        p = jnp.zeros((L, B), jnp.int32)
        for k in range(K):
            p = jnp.where(ak == k, pidx[:, k : k + 1], p)
        return h.T, p.T

    # C: one-hot bf16x3 MXU gather per k (exact select)
    sels = []
    for k in range(K):
        oh = np.zeros((L, L), np.float32)
        oh[np.asarray(pidx[:, k]), np.arange(L)] = 1.0
        sels.append(jnp.asarray(oh, jnp.bfloat16))

    def mxu_takes(d):
        v0 = d.astype(jnp.bfloat16)
        r1 = d - v0.astype(jnp.float32)
        v1 = r1.astype(jnp.bfloat16)
        v2 = (r1 - v1.astype(jnp.float32)).astype(jnp.bfloat16)
        h = jnp.full((B, L), POS_INF, jnp.float32)
        p = jnp.zeros((B, L), jnp.int32)
        for k in range(K):
            cand = sum(
                jax.lax.dot_general(
                    v, sels[k], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                for v in (v0, v1, v2)) + pcost[None, :, k]
            tk = cand < h
            h = jnp.where(tk, cand, h)
            p = jnp.where(tk, pidx[None, :, k], p)
        return h, p

    # D: gather-cost floor — K lane takes without the min/argmin chain
    def lane_takes_nomin(d):
        acc = jnp.zeros((B, L), jnp.float32)
        for k in range(K):
            acc = acc + jnp.take(d, pidx[:, k], axis=1)
        return acc, jnp.zeros((B, L), jnp.int32)

    # parity check (CPU-ish quick, on device): A vs B vs C values
    ha, pa = jax.jit(lane_takes)(d0)
    hb, pb = jax.jit(row_take)(d0)
    log(f"parity B: h {'OK' if bool(jnp.all(ha == hb)) else 'FAIL'}, "
        f"p {'OK' if bool(jnp.all(pa == pb)) else 'FAIL'}")

    run("A lane takes (current)", lane_takes)
    run("B transpose+row take", row_take)
    run("D lane takes no-min floor", lane_takes_nomin)


if __name__ == "__main__":
    main()
