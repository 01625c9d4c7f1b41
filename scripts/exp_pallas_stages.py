"""In-kernel ablation of the Pallas banded Viterbi: compile variants
with successive stages enabled to find the per-frame cost structure.

stage 0: DMA only (copy emis -> bp8 cast, update scratch trivially)
stage 1: + band relaxation
stage 2: + masks/final bookkeeping
stage 3: + eps relaxation (full kernel)

Run: python scripts/exp_pallas_stages.py [--batch 512]
"""

import argparse
import functools
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--frames", type=int, default=500)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass

    sys.path.insert(0, ".")
    from bench import _bank, _timeit

    from speech_recognition_tpu.decode.connected import connected_graph_arrays
    from speech_recognition_tpu.ops.viterbi_banded import banded_arrays
    from speech_recognition_tpu.ops.viterbi_banded_pallas import (
        banded_topology,
    )
    from speech_recognition_tpu.utils.numerics import POS_INF

    bank = _bank()
    graph = connected_graph_arrays(bank, 7)
    bg = banded_arrays(graph)
    topo = banded_topology(bg)
    b, t, s = args.batch, args.frames, graph.n_states
    s8 = ((s + 7) // 8) * 8
    v = len(topo.word_starts)
    v8 = ((v + 7) // 8) * 8

    rng = np.random.default_rng(1)
    nll = jnp.asarray(rng.uniform(0, 10, (t, s8, b)).astype(np.float32))
    nf_row = jnp.full((1, b), t, jnp.int32)
    band_t = jnp.asarray(rng.uniform(0, 2, (s8, 8)).astype(np.float32))
    eps_vals = jnp.asarray(rng.uniform(0, 2, (v8, v8)).astype(np.float32))
    e_end = np.zeros((v8, s8), np.float32)
    e_end[np.arange(v), list(topo.word_ends)] = 1.0
    e_start = np.zeros((v8, s8), np.float32)
    e_start[np.arange(v), list(topo.word_starts)] = 1.0
    p_start = np.zeros((s8, v8), np.float32)
    p_start[list(topo.word_starts), np.arange(v)] = 1.0
    pen = np.full((s8, 1), POS_INF, np.float32)
    pen[list(topo.word_starts), 0] = 0.0
    init_col = jnp.zeros((s8, 1), jnp.float32)

    def make(stage, hi_prec):
        def kernel(nll_ref, band_ref, eps_ref, e_end_ref, e_start_ref,
                   p_start_ref, pen_ref, init_ref, nf_ref,
                   final_ref, bp_ref, cost_ref):
            ti = pl.program_id(0)
            is0 = ti == 0
            emis = nll_ref[0]
            prev = cost_ref[...]
            inf = jnp.full((s8, b), POS_INF, jnp.float32)

            def dotf(a, x):
                return jax.lax.dot_general(
                    a, x, (((1,), (0,)), ((), ())),
                    precision=(jax.lax.Precision.HIGHEST if hi_prec
                               else jax.lax.Precision.DEFAULT),
                    preferred_element_type=jnp.float32)

            if stage >= 1:
                best = inf
                dsel = jnp.zeros((s8, b), jnp.float32)
                for d in range(3):
                    col = band_ref[:, d:d + 1]
                    if d == 0:
                        shifted = prev
                    else:
                        pen_d = jnp.where(
                            jax.lax.broadcasted_iota(jnp.int32, (s8, 1), 0) < d,
                            jnp.float32(POS_INF), jnp.float32(0))
                        shifted = jnp.minimum(pltpu.roll(prev, d, 0) + pen_d,
                                              POS_INF)
                    cand = col + shifted
                    take = cand <= best
                    best = jnp.where(take, cand, best)
                    dsel = jnp.where(take, jnp.float32(d), dsel)
                base = jnp.minimum(best, POS_INF)
                base = jnp.where(is0, init_ref[...] + jnp.zeros((s8, b), jnp.float32), base)
                cost = jnp.minimum(base + emis, POS_INF)
                bp = dsel
            else:
                cost = emis
                bp = emis

            if stage >= 3:
                end_vals = dotf(e_end_ref[...], cost)
                pieces_b, pieces_a = [], []
                cursor = 0
                for (v_lo, v_hi, u_lo, u_hi) in topo.ranges:
                    if v_lo > cursor:
                        pieces_b.append(jnp.full((v_lo - cursor, b), POS_INF, jnp.float32))
                        pieces_a.append(jnp.zeros((v_lo - cursor, b), jnp.float32))
                    bb = jnp.full((v_hi - v_lo, b), POS_INF, jnp.float32)
                    aa = jnp.zeros((v_hi - v_lo, b), jnp.float32)
                    for u in range(u_lo, u_hi):
                        cand_u = eps_ref[v_lo:v_hi, u:u + 1] + end_vals[u:u + 1, :]
                        take = cand_u < bb
                        bb = jnp.where(take, cand_u, bb)
                        aa = jnp.where(take, jnp.float32(u), aa)
                    pieces_b.append(bb)
                    pieces_a.append(aa)
                    cursor = v_hi
                if cursor < v8:
                    pieces_b.append(jnp.full((v8 - cursor, b), POS_INF, jnp.float32))
                    pieces_a.append(jnp.zeros((v8 - cursor, b), jnp.float32))
                arc_base = jnp.concatenate(pieces_b, axis=0)
                arc_arg = jnp.concatenate(pieces_a, axis=0)
                emis_starts = dotf(e_start_ref[...], emis)
                cand_arc = jnp.minimum(arc_base + emis_starts, POS_INF)
                cand_dense = dotf(p_start_ref[...], cand_arc)
                arg_dense = dotf(p_start_ref[...], arc_arg)
                better = (cand_dense + pen_ref[...]) < cost
                cost = jnp.where(better, cand_dense, cost)
                bp = jnp.where(better, 3.0 + arg_dense, bp)

            if stage >= 2:
                nf_b = nf_ref[...] + jnp.zeros((s8, b), jnp.int32)
                ok = ti < nf_b
                cost = jnp.where(ok, cost, jnp.where(is0, inf, prev))
                fin_prev = jnp.where(is0, inf, final_ref[...])
                final_ref[...] = jnp.where(ti == nf_b - 1, cost, fin_prev)
            else:
                final_ref[...] = cost

            cost_ref[...] = cost
            bp_ref[0] = bp.astype(jnp.int8)

        const = lambda *_: (0, 0)
        return pl.pallas_call(
            kernel,
            grid=(t,),
            in_specs=[
                pl.BlockSpec((1, s8, b), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((s8, 8), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((v8, v8), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((v8, s8), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((v8, s8), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((s8, v8), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((s8, 1), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((s8, 1), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, b), const, memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((s8, b), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, s8, b), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((s8, b), jnp.float32),
                jax.ShapeDtypeStruct((t, s8, b), jnp.int8),
            ],
            scratch_shapes=[pltpu.VMEM((s8, b), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 2**20),
        )

    audio_s = b * t * 0.01
    print(f"backend: {jax.default_backend()}", flush=True)
    cases = [(0, True), (1, True), (2, True), (3, True), (3, False)]
    for stage, hi in cases:
        call = make(stage, hi)
        fn = jax.jit(lambda nll: call(nll, band_t, eps_vals, jnp.asarray(e_end),
                                      jnp.asarray(e_start), jnp.asarray(p_start),
                                      jnp.asarray(pen), init_col, nf_row)[0].sum())
        dt = _timeit(lambda: fn(nll))
        tag = f"stage{stage}" + ("" if hi else "+defprec")
        print(f"RESULT {tag}: {dt*1e3:7.1f} ms  {audio_s/dt:8.0f} audio-s/s "
              f"({dt/t*1e6:.1f} us/frame)", flush=True)


if __name__ == "__main__":
    main()
