"""Prototype: banded Viterbi with a [S, B] (state-major, batch-minor)
frontier layout instead of vmap's [B, S].

Hypothesis: with B a multiple of 128 the lane dimension is fully packed
(vs S=385 padded to 512 lanes, 25% waste) and the eps-relax gathers ride
the sublane axis.  Checks bit-parity against the production kernel, then
times both.  Run: python scripts/exp_layout.py [--batch 512] [--cpu]
"""

import argparse
import functools
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--frames", type=int, default=500)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass

    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bench import _bank, _timeit

    from speech_recognition_tpu.decode.connected import connected_graph_arrays
    from speech_recognition_tpu.ops.viterbi_banded import (
        MAX_BAND,
        _EPS_BASE,
        banded_arrays,
        viterbi_banded,
    )
    from speech_recognition_tpu.utils.numerics import POS_INF

    bank = _bank()
    graph = connected_graph_arrays(bank, 7)
    g = banded_arrays(graph)
    eps_depth = graph.eps_depth

    def shift_s(x, d):
        # x [.., S, B] shifted along S
        if d == 0:
            return x
        pad = jnp.full(x.shape[:-2] + (d, x.shape[-1]), POS_INF, x.dtype)
        return jnp.concatenate([pad, x[..., :-d, :]], axis=-2)

    @functools.partial(jax.jit, static_argnames=("eps_depth",))
    def viterbi_t(nll_t, n_frames, eps_depth=1):
        """nll_t: [T, S, B]; n_frames: [B].  Returns final [S, B], bp8 [T, S, B]."""
        t_len, s, b = nll_t.shape
        nll_t = jnp.minimum(nll_t, POS_INF)

        def eps_relax(cost, emis):
            end_vals = cost[g.word_ends, :]  # [V, B]
            scores = g.eps_block[:, :, None] + end_vals[None, :, :]  # [Vto,Vfrom,B]
            base = jnp.min(scores, axis=1)
            origin_u = jnp.argmin(scores, axis=1).astype(jnp.int8)
            cand = jnp.minimum(base + emis[g.word_starts, :], POS_INF)  # [V, B]
            cand_dense = cand[g.start_pos, :]
            u_dense = origin_u[g.start_pos, :]
            better = g.is_start[:, None] & (cand_dense < cost)
            cost = jnp.where(better, cand_dense, cost)
            bp_upd = jnp.where(better, _EPS_BASE + u_dense, jnp.int8(-1))
            return cost, bp_upd

        def column(base_cost, d_sel, emis):
            cost = jnp.minimum(base_cost + emis, POS_INF)
            bp8 = d_sel
            for _ in range(eps_depth):
                cost, bp_upd = eps_relax(cost, emis)
                bp8 = jnp.where(bp_upd >= 0, bp_upd, bp8)
            return cost, bp8

        def band_relax(prev):
            best = jnp.full(prev.shape, POS_INF)
            d_sel = jnp.zeros(prev.shape, jnp.int8)
            for d in range(MAX_BAND + 1):
                cand = g.band[d][:, None] + shift_s(prev, d)
                take = cand <= best
                best = jnp.where(take, cand, best)
                d_sel = jnp.where(take, jnp.int8(d), d_sel)
            return jnp.minimum(best, POS_INF), d_sel

        init = jnp.broadcast_to(g.init_cost[:, None], (s, b))
        cost0, bp0 = column(init, jnp.zeros((s, b), jnp.int8), nll_t[0])

        def step(carry, inputs):
            prev, final = carry
            t, emis = inputs
            base, d_sel = band_relax(prev)
            cost, bp8 = column(base, d_sel, emis)
            active = t < n_frames  # [B]
            cost = jnp.where(active[None, :], cost, prev)
            final = jnp.where((t == n_frames - 1)[None, :], cost, final)
            return (cost, final), bp8

        ts = jnp.arange(1, t_len)
        init_final = jnp.where((n_frames == 1)[None, :], cost0, POS_INF)
        (_, final), bps = jax.lax.scan(step, (cost0, init_final), (ts, nll_t[1:]))
        bp8 = jnp.concatenate([bp0[None], bps], axis=0)
        return final, bp8

    rng = np.random.default_rng(1)
    b, t, s = args.batch, args.frames, graph.n_states
    nll = jnp.asarray(rng.uniform(0, 10, (b, t, s)).astype(np.float32))
    n_frames = jnp.asarray(
        rng.integers(t // 2, t + 1, size=(b,)).astype(np.int32))

    print(f"backend: {jax.default_backend()}  S={s} B={b} T={t}", flush=True)

    # correctness vs production kernel
    nb = min(b, 8)
    f_ref, bp_ref = jax.vmap(
        lambda x, nf: viterbi_banded(x, g, nf, eps_depth=eps_depth)
    )(nll[:nb], n_frames[:nb])
    f_t, bp_t = viterbi_t(
        jnp.transpose(nll[:nb], (1, 2, 0)), n_frames[:nb], eps_depth=eps_depth)
    assert np.array_equal(np.asarray(f_ref), np.asarray(f_t).T), "final mismatch"
    assert np.array_equal(np.asarray(bp_ref), np.transpose(np.asarray(bp_t), (2, 0, 1))), "bp mismatch"
    print("bit-parity OK", flush=True)

    # timing: scan only (nll pre-transposed on device)
    @jax.jit
    def run_bs(nll, n_frames):
        f, bp = jax.vmap(
            lambda x, nf: viterbi_banded(x, g, nf, eps_depth=eps_depth)
        )(nll, n_frames)
        return jnp.sum(f) + jnp.sum(bp[:, -1].astype(jnp.int32))

    nll_t = jnp.transpose(nll, (1, 2, 0)).block_until_ready()

    @jax.jit
    def run_sb(nll_t, n_frames):
        f, bp = viterbi_t(nll_t, n_frames, eps_depth=eps_depth)
        return jnp.sum(f) + jnp.sum(bp[-1].astype(jnp.int32))

    @jax.jit
    def run_sb_with_transpose(nll, n_frames):
        f, bp = viterbi_t(jnp.transpose(nll, (1, 2, 0)), n_frames,
                          eps_depth=eps_depth)
        return jnp.sum(f) + jnp.sum(bp[-1].astype(jnp.int32))

    audio_s = b * t * 0.01
    for name, fn in [
        ("[B,S] production scan", lambda: run_bs(nll, n_frames)),
        ("[S,B] transposed scan", lambda: run_sb(nll_t, n_frames)),
        ("[S,B] incl. transpose", lambda: run_sb_with_transpose(nll, n_frames)),
    ]:
        dt = _timeit(fn)
        print(f"{name:26s} {dt*1e3:8.1f} ms  {audio_s/dt:8.0f} audio-s/s",
              flush=True)


if __name__ == "__main__":
    main()
