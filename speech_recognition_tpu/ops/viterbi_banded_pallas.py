"""Pallas TPU kernel for the state-major batched banded Viterbi.

The XLA ``lax.scan`` form of :func:`ops.viterbi_banded.viterbi_banded_tb`
spends ~65 us per frame step at [S=385, B=512] — two orders of magnitude
above the VPU/HBM bound for the actual per-frame work (a handful of
elementwise passes over the [S, B] frontier plus an 11x11-block eps
relaxation).  The overhead is scan machinery: per-iteration
dynamic-slice/dynamic-update-slice of HBM-resident xs/ys and carry
round-trips.

This kernel removes all of it:

* grid = (T,) with sequential ("arbitrary") semantics; the cost
  frontier lives in a VMEM scratch buffer across grid steps — zero HBM
  traffic for the carry;
* the per-frame emission block [S, B] streams HBM->VMEM through the
  BlockSpec pipeline (double-buffered by Pallas);
* the graph TOPOLOGY is static (word_starts / word_ends / eps block
  spans baked into the kernel at trace time): arc gathers become
  one-hot f32 matmuls on the MXU (exact: one operand is 0/1, the other
  is split exactly into bf16 triples under ``Precision.HIGHEST``), and
  the eps min/argmin runs only over the finite eps blocks
  (:func:`ops.viterbi_banded.eps_ranges`);
* backpointers stream out as one int8 plane per frame.

Bit-identical to ``viterbi_banded_tb`` (asserted in tests, interpret
mode on CPU).  Replaces the per-frame relaxation of the reference's
``decode_hmm_states`` Python loop (``/root/reference/sr/recognition/
decode.py:97-124``) at the hardware's pace.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from speech_recognition_tpu.ops.viterbi_banded import (
    _EPS,
    MAX_BAND,
    BandedGraph,
    _eps_u_dtype,
    eps_ranges,
)
from speech_recognition_tpu.utils.numerics import POS_INF

__all__ = ["BandedTopo", "banded_topology", "default_pallas_topo",
           "viterbi_banded_tb_pallas", "banded_backtrace_tb_pallas"]

# Precision for the one-hot selection matmuls: one operand is exactly
# 0/1 and the other splits exactly into bf16 triples under HIGHEST, so
# the select is bit-exact.  (Precision.HIGH would suffice numerically
# but Mosaic does not lower it — only DEFAULT and HIGHEST.)
_SELECT_PRECISION = jax.lax.Precision.HIGHEST


class BandedTopo(NamedTuple):
    """Hashable (static) topology of a BandedGraph: everything the
    kernel needs at trace time.  Costs stay runtime arrays."""

    n_states: int
    word_starts: Tuple[int, ...]
    word_ends: Tuple[int, ...]
    ranges: Tuple[Tuple[int, int, int, int], ...]  # eps_ranges()
    # graph state -> bank-state row; lets the kernel take the compact
    # [T, S_bank, B] emission block and expand it on the MXU instead of
    # the caller materializing the 7x larger [T, S, B] gather
    bank_map: Tuple[int, ...] = ()
    # W when the graph is V uniform words of W states, slot-major
    # (starts = v*W, ends = v*W + W-1) — every composed word graph.
    # Unlocks arithmetic/view forms of the one-hot selects: slot =
    # state // W and end-state = u*W + W-1 are integer expressions, so
    # the eps machinery needs no MXU at all.  0 = irregular (lex trees).
    uniform_w: int = 0
    # per-range flag: every destination row of the eps block is
    # CONSTANT across its origin span (true for every no-LM composed
    # graph — the eps cost is the shared word-insertion/boundary cost).
    # The kernel then replaces the per-origin candidate loop with one
    # masked min-reduce over the span (argmin on raw end values; with
    # per-row constants argmin(c + end) == argmin(end) except on
    # f32-rounding ties of quantized emissions — same documented
    # restriction as the lex kernel's eps_rowconst fast path).
    rowconst: Tuple[bool, ...] = ()


def banded_topology(g: BandedGraph) -> BandedTopo:
    """Extract the static topology (host-side; concrete arrays only)."""
    starts = np.asarray(g.word_starts)
    ends = np.asarray(g.word_ends)
    s = int(g.init_cost.shape[0])
    v = len(starts)
    uniform_w = 0
    if v and s % v == 0:
        w = s // v
        if (np.array_equal(starts, np.arange(v) * w)
                and np.array_equal(ends, np.arange(v) * w + w - 1)):
            uniform_w = w
    ranges = eps_ranges(g)
    blk = np.asarray(g.eps_block)
    rowconst = tuple(
        bool(np.all(blk[v_lo:v_hi, u_lo:u_hi]
                    == blk[v_lo:v_hi, u_lo : u_lo + 1]))
        for (v_lo, v_hi, u_lo, u_hi) in ranges)
    return BandedTopo(
        n_states=s,
        word_starts=tuple(int(x) for x in starts),
        word_ends=tuple(int(x) for x in ends),
        ranges=ranges,
        bank_map=tuple(int(x) for x in np.asarray(g.bank_state)),
        uniform_w=uniform_w,
        rowconst=rowconst,
    )


def default_pallas_topo(g: BandedGraph):
    """The production backend-selection rule, in one place: Pallas
    needs a real TPU (Mosaic), so return ``banded_topology(g)`` on TPU
    and ``None`` (XLA scan kernels) elsewhere."""
    if jax.default_backend() == "tpu":
        return banded_topology(g)
    return None


def _ceil(x, m):
    return ((x + m - 1) // m) * m


def _kernel(nll_ref, expand_ref, band_ref, eps_ref, e_end_ref, e_start_ref,
            sel_sg_ref, p_start_ref, init_ref, nf_ref, *rest,
            topo: BandedTopo, eps_depth: int,
            frames_per_step: int, bank_mode: bool,
            uniform: Tuple[int, int] = (), ubt: bool = False,
            emit_eps_prev: bool = False, fuse_emission: bool = False,
            n_mix: int = 0, u8_mix: int = 0, emit_wordtrace: bool = False,
            num_steps: int = 0):
    if fuse_emission:
        wg_ref, lw_ref = rest[0], rest[1]
        rest = rest[2:]
    bp_ref = epsp_ref = epst_ref = ftau_ref = tau_ref = None
    if emit_wordtrace:
        # word-trace mode (uniform graphs only): NO backpointer planes —
        # an entry-time value plane tau [S, B] rides the DP (the same
        # carry as the lattice kernels) and each eps event records the
        # origin word AND its entry time into [R8, B] side planes, so
        # word recovery is an O(#words) chain walk instead of an O(T)
        # full-plane backtrace kernel.
        final_ref, epsu_ref, epst_ref, ftau_ref, cost_ref, tau_ref = rest
    else:
        final_ref, bp_ref, epsu_ref = rest[:3]
        rest = rest[3:]
        if emit_eps_prev:
            epsp_ref, cost_ref = rest
        else:
            (cost_ref,) = rest
    ti = pl.program_id(0)
    s8, b = cost_ref.shape
    v8 = sel_sg_ref.shape[0]

    def nll_at(kk):
        if fuse_emission:
            # emission fused in-kernel: the [U, M, T, B] f32 GMM
            # intermediate (225 MB at the headline shape, ~0.9 ms of
            # HBM traffic through the standalone producer + consumer)
            # never exists — one HIGHEST [M*U8, A8] x [A8, B] GEMM on
            # the augmented feature block, then the mixture logsumexp
            # on a mix-major reshape VIEW ([M, U8, B]; U8 is 8-aligned
            # so the sublane split lowers)
            xa = nll_ref[:, kk, :]  # [A8, B]
            pm = dotf(wg_ref[...], xa, precision=jax.lax.Precision.HIGHEST)
            z = lw_ref[...] - pm  # [M*U8, B]
            zv = z.reshape(n_mix, u8_mix, b)
            zmax = zv[0]
            for mi in range(1, n_mix):
                zmax = jnp.maximum(zmax, zv[mi])
            acc = jnp.exp(zv[0] - zmax)
            for mi in range(1, n_mix):
                acc = acc + jnp.exp(zv[mi] - zmax)
            return -(jnp.log(acc) + zmax)  # [U8, B] bank NLL
        return nll_ref[:, kk, :] if ubt else nll_ref[kk]

    def dotf(a, x, precision=_SELECT_PRECISION):
        return jax.lax.dot_general(
            a, x, (((1,), (0,)), ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32,
        )

    def expand_bank(nll_t):
        """Exact one-hot bank expansion in ONE bf16 MXU pass: the f32
        block splits into three bf16 planes (24 = 3 x 8 mantissa bits)
        and the tripled selector re-sums them exactly in the f32
        accumulator — bit-identical to the HIGHEST select at 1/6 the
        passes."""
        v0 = nll_t.astype(jnp.bfloat16)
        r1 = nll_t - v0.astype(jnp.float32)
        v1 = r1.astype(jnp.bfloat16)
        v2 = (r1 - v1.astype(jnp.float32)).astype(jnp.bfloat16)
        stacked = jnp.concatenate([v0, v1, v2], axis=0)
        return jax.lax.dot_general(
            expand_ref[...], stacked, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32)

    # All masks/backpointers are f32 in-kernel (one int8 cast at the
    # write): Mosaic cannot relayout i1 masks between the f32 (8,128)
    # and int8 (32,128) tilings.
    prev = cost_ref[...]  # garbage at ti == 0 (discarded by selects below)
    tau = tau_ref[...] if emit_wordtrace else None
    nf_row = nf_ref[...]  # [1, B]; selects broadcast it over states
    inf = jnp.full((s8, b), POS_INF, jnp.float32)

    for k in range(frames_per_step):
        t_abs = ti * frames_per_step + k
        if bank_mode:
            # expand the compact bank emission block to graph states on
            # the MXU (exact one-hot select, single bf16 pass)
            emis = expand_bank(nll_at(k))
        else:
            emis = nll_at(k)

        # --- band relaxation of the previous frontier.  Row shifts are
        # native sublane rotates (pltpu.roll); no wrap penalty needed:
        # band columns are POS_INF wherever the origin row would come
        # from another word or wrap the array (same invariant the lex
        # kernel relies on), and POS_INF + x == POS_INF bitwise for
        # |x| << ulp(1e30).  The min-chain + post-hoc code derivation
        # (largest finite d wins ties, matching _select_band) replaces
        # the per-d compare/select chain — ~7 fewer full-plane passes
        # per frame ---
        cands = [band_ref[:, 0:1] + prev]
        for d in range(1, MAX_BAND + 1):
            cands.append(band_ref[:, d : d + 1] + pltpu.roll(prev, d, 0))
        best = cands[0]
        for d in range(1, MAX_BAND + 1):
            best = jnp.minimum(best, cands[d])
        dsel = jnp.zeros((s8, b), jnp.float32)
        for d in range(1, MAX_BAND + 1):
            dsel = jnp.where(best == cands[d], jnp.float32(d), dsel)
        # no clamp here: the post-emission min below clamps, and
        # min(x + e, POS_INF) == min(min(x, POS_INF) + e, POS_INF)
        # bitwise for |e| << ulp(POS_INF)
        base = best
        if emit_wordtrace:
            # entry-time carry follows the band decision (wrapped rows
            # only matter where the cost is POS_INF — harmless garbage)
            tau_prev_f = tau
            tau_b = tau
            for d in range(1, MAX_BAND + 1):
                tau_b = jnp.where(dsel == jnp.float32(d),
                                  pltpu.roll(tau, d, 0), tau_b)

        if k == 0:  # only the first frame of step 0 seeds from init
            is0 = ti == 0
            init_b = init_ref[...] + jnp.zeros((s8, b), jnp.float32)
            base = jnp.where(is0, init_b, base)
            dsel = jnp.where(is0, jnp.float32(0), dsel)
            prev = jnp.where(is0, inf, prev)
            if emit_wordtrace:
                tau_b = jnp.where(is0, jnp.float32(0), tau_b)
                tau_prev_f = jnp.where(is0, jnp.float32(0), tau_prev_f)

        cost = jnp.minimum(base + emis, POS_INF)
        bp = dsel
        side = jnp.zeros((v8, b), jnp.float32)  # eps origins (as f32)
        side_prev = jnp.zeros((v8, b), jnp.float32)  # post-unwind prev state
        side_tau = jnp.zeros((v8, b), jnp.float32)  # origin entry times
        if emit_eps_prev:
            # band code at every word-end row, captured pre-eps: the eps
            # winner's true path predecessor is end_row(u) - d_end(u),
            # recorded into a second side plane so the value-carried
            # backtrace needs no second full-plane lookup per frame.
            if uniform:
                w_live_, w8_ = uniform
                d_ends = dsel.reshape(v8, w8_, b)[:, w_live_ - 1, :]  # [V8,B]
            else:
                d_ends = dotf(e_end_ref[...], dsel)  # [L8, B]

        # --- eps relaxation: static block spans, first-min tie-break ---
        for _ in range(eps_depth):
            if uniform:
                # uniform layout (S = V8*W8 padded, slot-major): arc-end
                # and arc-start rows are mid-axis indices of a pure
                # reshape VIEW — no one-hot MXU selects anywhere
                w_live, w8 = uniform
                view = cost.reshape(v8, w8, b)
                end_vals = view[:, w_live - 1, :]  # [V8, B]
                if emit_wordtrace:
                    tau_ends = tau_b.reshape(v8, w8, b)[:, w_live - 1, :]
            else:
                end_vals = dotf(e_end_ref[...], cost)  # [L8, B] select
            # build [R8, B] base/arg by concatenating the (ascending,
            # disjoint) eps-block runs — Mosaic has no scatter
            pieces_b, pieces_a, pieces_p, pieces_t = [], [], [], []
            cursor = 0
            for ri, (v_lo, v_hi, u_lo, u_hi) in enumerate(topo.ranges):
                if v_lo > cursor:
                    pieces_b.append(
                        jnp.full((v_lo - cursor, b), POS_INF, jnp.float32))
                    pieces_a.append(jnp.zeros((v_lo - cursor, b), jnp.float32))
                    pieces_p.append(jnp.zeros((v_lo - cursor, b), jnp.float32))
                    pieces_t.append(jnp.zeros((v_lo - cursor, b), jnp.float32))
                span = u_hi - u_lo
                rc = (ri < len(topo.rowconst) and topo.rowconst[ri]
                      and span > 2)
                if rc:
                    # row-constant block (no-LM boundary cost): ONE
                    # masked min-reduce over the span replaces the
                    # per-origin candidate chain — bb is bit-equal
                    # (c + end[u*] with u* = first argmin of the raw
                    # ends; the f32-rounding-tie caveat is documented
                    # on the rowconst field)
                    sp_vals = end_vals[u_lo:u_hi, :]  # [span, B]
                    m = jnp.min(sp_vals, axis=0, keepdims=True)  # [1, B]
                    iota_u = jax.lax.broadcasted_iota(
                        jnp.int32, (span, b), 0)
                    arg_rel = jnp.min(
                        jnp.where(sp_vals == m, iota_u, jnp.int32(span)),
                        axis=0, keepdims=True)  # [1, B] first minimum
                    zros = jnp.zeros((v_hi - v_lo, b), jnp.float32)
                    bb = eps_ref[v_lo:v_hi, u_lo : u_lo + 1] + m
                    aa = (arg_rel + u_lo).astype(jnp.float32) + zros
                    pp = jnp.zeros((v_hi - v_lo, b), jnp.float32)
                    tt = pp
                    if emit_eps_prev or emit_wordtrace:
                        # MIN-form one-hot select: Mosaic rejects float
                        # ADD reductions over sublane-OFFSET slices
                        # (u_lo is rarely 8-aligned), but min-reduce on
                        # the same layout lowers fine (line ~318)
                        onehot = iota_u == arg_rel
                    if emit_wordtrace:
                        tt = jnp.min(
                            jnp.where(onehot, tau_ends[u_lo:u_hi, :],
                                      POS_INF),
                            axis=0, keepdims=True) + zros
                    if emit_eps_prev:
                        if uniform:
                            er = ((iota_u + u_lo).astype(jnp.float32)
                                  * uniform[1] + (uniform[0] - 1))
                        else:
                            er = jnp.asarray(
                                np.array([topo.word_ends[u]
                                          for u in range(u_lo, u_hi)],
                                         np.float32)[:, None])
                        prev_plane = er - d_ends[u_lo:u_hi, :]
                        pp = jnp.min(
                            jnp.where(onehot, prev_plane, POS_INF),
                            axis=0, keepdims=True) + zros
                else:
                    bb = jnp.full((v_hi - v_lo, b), POS_INF, jnp.float32)
                    aa = jnp.zeros((v_hi - v_lo, b), jnp.float32)
                    pp = jnp.zeros((v_hi - v_lo, b), jnp.float32)
                    tt = pp
                    for u in range(u_lo, u_hi):
                        cand_u = (eps_ref[v_lo:v_hi, u : u + 1]
                                  + end_vals[u : u + 1, :])
                        take = cand_u < bb  # strict: keep first minimum
                        bb = jnp.where(take, cand_u, bb)
                        aa = jnp.where(take, jnp.float32(u), aa)
                        if emit_wordtrace:
                            tt = jnp.where(take, tau_ends[u : u + 1, :], tt)
                        if emit_eps_prev:
                            if uniform:
                                end_row = u * uniform[1] + uniform[0] - 1
                            else:
                                end_row = topo.word_ends[u]
                            prev_u = (jnp.float32(end_row)
                                      - d_ends[u : u + 1, :])
                            pp = jnp.where(take, prev_u, pp)
                pieces_b.append(bb)
                pieces_a.append(aa)
                pieces_p.append(pp)
                pieces_t.append(tt)
                cursor = v_hi
            if cursor < v8:
                pieces_b.append(jnp.full((v8 - cursor, b), POS_INF, jnp.float32))
                pieces_a.append(jnp.zeros((v8 - cursor, b), jnp.float32))
                pieces_p.append(jnp.zeros((v8 - cursor, b), jnp.float32))
                pieces_t.append(jnp.zeros((v8 - cursor, b), jnp.float32))
            arc_base = (jnp.concatenate(pieces_b, axis=0)
                        if len(pieces_b) > 1 else pieces_b[0])
            arc_arg = (jnp.concatenate(pieces_a, axis=0)
                       if len(pieces_a) > 1 else pieces_a[0])
            if emit_wordtrace:
                arc_tau = (jnp.concatenate(pieces_t, axis=0)
                           if len(pieces_t) > 1 else pieces_t[0])
            if emit_eps_prev:
                arc_prev = (jnp.concatenate(pieces_p, axis=0)
                            if len(pieces_p) > 1 else pieces_p[0])
            if uniform:
                emis_starts = emis.reshape(v8, w8, b)[:, 0, :]
                cand_arc = jnp.minimum(arc_base + emis_starts, POS_INF)
                cost_starts = view[:, 0, :]
                better_arc = (cand_arc < cost_starts).astype(jnp.float32)
                # scatter to start rows: broadcast along a fresh word
                # axis + merge (row v*W8+w <- arc[v]), masked to w == 0
                def up(a):
                    return jnp.broadcast_to(
                        a[:, None, :], (v8, w8, b)).reshape(s8, b)

                # dense eps candidate: broadcast the arc row and push
                # non-start rows out of range with a per-row POS_INF
                # offset (|cand_arc| << ulp(POS_INF), so the offset sum
                # rounds to >= POS_INF >= any live cost) — one fewer
                # full-plane pass than the mask-multiply form, same
                # strict-improvement semantics at start rows
                start_off = jnp.where(
                    jax.lax.broadcasted_iota(jnp.int32, (s8, 1), 0)
                    % w8 == 0, jnp.float32(0), POS_INF)
                cand_dense = up(cand_arc) + start_off
                better = cand_dense < cost
            else:
                # in bank mode e_start_ref is (E_start @ G): select start
                # emissions straight from the compact block
                emis_starts = dotf(e_start_ref[...],
                                   nll_at(k) if bank_mode else emis)  # [R8, B]
                cand_arc = jnp.minimum(arc_base + emis_starts, POS_INF)
                # improvement test at arc level (pad rows: cand POS_INF
                # vs cost_starts 0 -> never better), then scattered
                # densely by the exact one-hot matmul
                cost_starts = dotf(sel_sg_ref[...], cost)  # [R8, B]
                better_arc = (cand_arc < cost_starts).astype(jnp.float32)
                cand_dense = dotf(p_start_ref[...], cand_arc)  # [S8, B]
                better = dotf(p_start_ref[...], better_arc) > 0.0
            cost = jnp.where(better, cand_dense, cost)
            if emit_wordtrace:
                t_abs_f = (t_abs * jnp.ones((), jnp.int32)).astype(
                    jnp.float32)
                tau_new = jnp.where(better, t_abs_f, tau_b)
                side_tau = (side_tau * (1.0 - better_arc)
                            + arc_tau * better_arc)
            else:
                bp = jnp.where(better, jnp.float32(_EPS), bp)
            side = side * (1.0 - better_arc) + arc_arg * better_arc
            if emit_eps_prev:
                side_prev = (side_prev * (1.0 - better_arc)
                             + arc_prev * better_arc)

        # --- variable-length masking (XLA semantics).  The mask freezes
        # cost (and tau) at their frame nf-1 values for every later
        # frame, so the end-of-grid carry IS the final plane — no
        # per-frame final-capture selects; final_ref is written once on
        # the last grid step below.  The compare runs on the [1, B] row
        # and broadcasts through the select. ---
        active = t_abs < nf_row  # [1, B]
        cost = jnp.where(active, cost, prev)
        epsu_ref[k] = side.astype(epsu_ref.dtype)
        if emit_wordtrace:
            tau = jnp.where(active, tau_new, tau_prev_f)
            epst_ref[k] = side_tau.astype(jnp.int32)
        else:
            bp_ref[k] = bp.astype(jnp.int8)
        if emit_eps_prev:
            epsp_ref[k] = side_prev.astype(jnp.int32)
        prev = cost

    cost_ref[...] = prev
    if emit_wordtrace:
        tau_ref[...] = tau

    @pl.when(ti == num_steps - 1)
    def _write_final():
        final_ref[...] = prev
        if emit_wordtrace:
            ftau_ref[...] = tau


@functools.partial(jax.jit,
                   static_argnames=("topo", "eps_depth", "interpret",
                                    "frames_per_step", "bank_input",
                                    "return_padded_bp", "input_ubt",
                                    "emit_eps_prev", "fuse_emission"))
def viterbi_banded_tb_pallas(nll_tb, g: BandedGraph, n_frames,
                             topo: BandedTopo, eps_depth: int = 1,
                             interpret: bool = False,
                             frames_per_step: int = 4,
                             bank_input: bool = None,
                             return_padded_bp: bool = False,
                             input_ubt: bool = False,
                             emit_eps_prev: bool = False,
                             fuse_emission: bool = False,
                             bank_gemm=None):
    """Drop-in Pallas replacement for
    :func:`ops.viterbi_banded.viterbi_banded_tb`.

    ``nll_tb`` is either ``[T, S, B]`` (graph-state emissions, like the
    XLA kernel) or ``[T, S_bank, B]`` (compact bank emissions — the
    kernel expands them to graph states on the MXU via the topology's
    ``bank_map``, so the 7x larger gathered tensor is never
    materialized in HBM).  ``n_frames [B]`` -> ``(final [S, B],
    bp8 [T, S, B])``, bit-identical to the XLA kernel for ``n_frames
    >= 1`` (padded batch columns may carry garbage backpointers beyond
    their length, exactly like padded frames in the XLA kernel).
    ``topo`` must be ``banded_topology(g)`` for the same graph.
    ``frames_per_step`` frames are processed per sequential grid step
    to amortize per-step overhead (padded tail frames are inert).
    Returns ``(final [S, B], bp8 [T, S, B] int8, eps_u [T, R, B])``
    matching the XLA kernel's encoding (band codes, ``_EPS`` + side
    plane).

    ``fuse_emission``: ``nll_tb`` is instead the AUGMENTED FEATURE
    tensor ``[A, T, B]`` (``ops.gmm.augment_dtb``) and ``bank_gemm``
    carries ``(w [U, M, A], log_weights [U, M])`` from
    :func:`ops.gmm.gmm_emission_weights` — the GMM emission GEMM +
    mixture logsumexp run in-kernel per frame block, so the
    ``[U, M, T, B]`` f32 intermediate never touches HBM.  Final costs
    match the unfused path to f32 GEMM reassociation (the fused GEMM
    tiles the batch axis); paths are identical away from exact ties.
    """
    if fuse_emission:
        if bank_gemm is None:
            raise ValueError("fuse_emission needs bank_gemm=(w, lw)")
        if not input_ubt:
            raise ValueError("fuse_emission expects the [A, T, B] layout")
        a_in, t_len, b = nll_tb.shape
        w_gm, lw_gm = bank_gemm
        n_bank_g, n_mix, a_w = w_gm.shape
        if a_w != a_in:
            raise ValueError(f"augmented dim mismatch: {a_w} vs {a_in}")
        s_in = n_bank_g  # selector-side state dim (compact bank)
    else:
        if input_ubt:
            # [U, T, B] emission layout (gmm_neg_log_lik_ubt): frame
            # blocks are middle-axis slices, so the producer never
            # transposes the full nll tensor
            s_in, t_len, b = nll_tb.shape
        else:
            t_len, s_in, b = nll_tb.shape
    s = topo.n_states
    if getattr(g, "cross_src", None) is not None:
        raise NotImplementedError("Pallas banded kernel: cross-arc edges "
                                  "(lex graphs) run on the XLA kernel")
    # bank_input=None infers from the state dim; pass it explicitly when
    # the graph coincidentally has exactly n_bank states
    bank_mode = True if fuse_emission else (
        (s_in != s) if bank_input is None else bank_input)
    n_bank = max(topo.bank_map) + 1 if topo.bank_map else 0
    if bank_mode and s_in != n_bank:
        raise ValueError(f"bank emission block has {s_in} states, "
                         f"bank_map expects {n_bank}")
    if not bank_mode and s_in != s:
        raise ValueError(f"graph/emission mismatch: {s_in} vs {s}")
    r = len(topo.word_starts)
    l = len(topo.word_ends)
    u_dtype = _eps_u_dtype(l)
    r8 = _ceil(r, 8)
    l8 = _ceil(l, 8)
    sb8 = _ceil(s_in, 8)  # emission-block state dim (bank or graph)
    if emit_eps_prev:
        # The prev side plane captures word-end band codes BEFORE the
        # eps pass; with a start that is also an end (single-state
        # words) a same-frame eps chain could overwrite the origin's
        # code and the two backtrace forms would diverge — guard it out.
        if eps_depth != 1 or (set(topo.word_starts) & set(topo.word_ends)):
            raise ValueError("emit_eps_prev needs eps_depth == 1 and "
                             "disjoint word starts/ends")

    # Uniform layout: pad every word to W8 = ceil8(W) states so the eps
    # arc rows become pure reshape views / sublane repeats in-kernel —
    # zero one-hot MXU selects.  Only with bank emissions (graph-state
    # inputs arrive in original numbering).
    uniform = ()
    if topo.uniform_w and bank_mode:
        w_live = topo.uniform_w
        w8 = _ceil(w_live, 8)
        v8 = _ceil(r, 8)
        s8 = v8 * w8
        uniform = (w_live, w8)
        # original state i = v*W + w  ->  padded row v*W8 + w
        orig_rows = np.arange(s)
        pad_rows = (orig_rows // w_live) * w8 + orig_rows % w_live
    else:
        s8 = _ceil(s, 8)
        pad_rows = np.arange(s)
    if not bank_mode:
        sb8 = s8
    # fused emission: the streamed in-block is the augmented feature
    # block [A8, k, B]; the selector-side dim stays the compact bank
    in8 = _ceil(a_in, 8) if fuse_emission else sb8
    # VMEM budget: the nll in-block, bp8 and eps_u out-blocks are
    # double-buffered (4+4, 1+1 and 4+4 bytes per element per frame) plus
    # the resident frontier/final/selector buffers — clamp k to stay
    # under ~12 MB.
    per_k = 8 * in8 * b + 2 * s8 * b + 8 * r8 * b
    k = max(1, min(frames_per_step, (12 * 2**20 - 4 * s8 * b) // max(per_k, 1)))
    if input_ubt:
        # [U, T, B] blocks put the frame axis second-to-last, which
        # Mosaic requires to be a multiple of 8
        k = _ceil(k, 8)
    t8 = _ceil(t_len, k)

    # static one-hot selectors from the topology (unused under the
    # uniform layout except the bank expansion)
    e_end = np.zeros((l8, s8), np.float32)
    e_end[np.arange(l), pad_rows[list(topo.word_ends)]] = 1.0
    sel_sg = np.zeros((r8, s8), np.float32)
    sel_sg[np.arange(r), pad_rows[list(topo.word_starts)]] = 1.0
    p_start = np.zeros((s8, r8), np.float32)
    p_start[pad_rows[list(topo.word_starts)], np.arange(r)] = 1.0
    if bank_mode:
        # graph-state expansion G[s, j] = 1 iff bank_map[s] == j (bf16,
        # tripled along the contraction for the single-pass exact
        # select), and the start-emission selector composed through it
        expand = np.zeros((s8, sb8), np.float32)
        expand[pad_rows, list(topo.bank_map)] = 1.0
        expand = np.concatenate([expand] * 3, axis=1)
        e_start = np.zeros((r8, sb8), np.float32)
        e_start[np.arange(r),
                [topo.bank_map[ws] for ws in topo.word_starts]] = 1.0
    else:
        expand = np.zeros((8, 3 * sb8), np.float32)  # unused dummy
        e_start = np.zeros((r8, sb8), np.float32)
        e_start[np.arange(r), list(topo.word_starts)] = 1.0

    # runtime cost arrays, padded (pad states unreachable: POS_INF)
    pad_rows_j = jnp.asarray(pad_rows)
    band_t = jnp.full((s8, 8), POS_INF, jnp.float32)
    band_t = band_t.at[pad_rows_j, : MAX_BAND + 1].set(g.band.T)
    eps_vals = jnp.full((r8, l8), POS_INF, jnp.float32)
    eps_vals = eps_vals.at[:r, :l].set(g.eps_block)
    init_col = jnp.full((s8, 1), POS_INF, jnp.float32)
    init_col = init_col.at[pad_rows_j, 0].set(g.init_cost)
    if fuse_emission:
        if in8 != a_in or t8 != t_len:
            nll_tb = jnp.pad(nll_tb, ((0, in8 - a_in), (0, t8 - t_len),
                                      (0, 0)))
        # mix-major GEMM rows (row m*U8 + u) so the in-kernel mixture
        # logsumexp is a sublane-group reshape view [M, U8, B]
        wg = jnp.zeros((n_mix * sb8, in8), jnp.float32)
        lwr = jnp.zeros((n_mix * sb8, 1), jnp.float32)
        for mi in range(n_mix):
            wg = wg.at[mi * sb8 : mi * sb8 + n_bank_g, :a_in].set(
                w_gm[:, mi, :].astype(jnp.float32))
            lwr = lwr.at[mi * sb8 : mi * sb8 + n_bank_g, 0].set(
                lw_gm[:, mi].astype(jnp.float32))
    elif sb8 != s_in or t8 != t_len:
        # emission pad rows/frames are zeros; padded GRAPH states get
        # POS_INF via band/init so zero emissions never matter, and in
        # bank mode no graph state maps to a padded bank row
        if input_ubt:
            nll_tb = jnp.pad(nll_tb, ((0, sb8 - s_in), (0, t8 - t_len),
                                      (0, 0)))
        else:
            nll_tb = jnp.pad(nll_tb, ((0, t8 - t_len), (0, sb8 - s_in),
                                      (0, 0)))
    nf_row = n_frames.astype(jnp.int32)[None, :]

    kernel = functools.partial(_kernel, topo=topo, eps_depth=eps_depth,
                               frames_per_step=k, bank_mode=bank_mode,
                               uniform=uniform, ubt=input_ubt,
                               emit_eps_prev=emit_eps_prev,
                               fuse_emission=fuse_emission,
                               n_mix=n_mix if fuse_emission else 0,
                               u8_mix=sb8 if fuse_emission else 0,
                               num_steps=t8 // k)
    const = lambda *_: (0, 0)
    nll_spec = (pl.BlockSpec((in8, k, b), lambda t: (0, t, 0),
                             memory_space=pltpu.VMEM)
                if input_ubt else
                pl.BlockSpec((k, sb8, b), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM))
    fuse_specs = ([pl.BlockSpec((n_mix * sb8, in8), const,
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((n_mix * sb8, 1), const,
                                memory_space=pltpu.VMEM)]
                  if fuse_emission else [])
    extra_specs = ([pl.BlockSpec((k, r8, b), lambda t: (t, 0, 0),
                                 memory_space=pltpu.VMEM)]
                   if emit_eps_prev else [])
    extra_shapes = ([jax.ShapeDtypeStruct((t8, r8, b), jnp.int32)]
                    if emit_eps_prev else [])
    outs = pl.pallas_call(
        kernel,
        grid=(t8 // k,),
        in_specs=[
            nll_spec,
            pl.BlockSpec(expand.shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec((s8, 8), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((r8, l8), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((l8, s8), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((r8, sb8), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((r8, s8), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((s8, r8), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((s8, 1), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b), const, memory_space=pltpu.VMEM),
        ] + fuse_specs,
        out_specs=[
            pl.BlockSpec((s8, b), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, s8, b), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, r8, b), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + extra_specs,
        out_shape=[
            jax.ShapeDtypeStruct((s8, b), jnp.float32),
            jax.ShapeDtypeStruct((t8, s8, b), jnp.int8),
            # eps origins are word-end slot ids: int8 while they fit
            # (saves 3/4 of the side plane's HBM write + backtrace read)
            jax.ShapeDtypeStruct((t8, r8, b),
                                 jnp.int8 if l <= 127 else jnp.int32),
        ] + extra_shapes,
        scratch_shapes=[pltpu.VMEM((s8, b), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(nll_tb, jnp.asarray(expand, jnp.bfloat16), band_t, eps_vals,
      jnp.asarray(e_end),
      jnp.asarray(e_start), jnp.asarray(sel_sg), jnp.asarray(p_start),
      init_col, nf_row, *((wg, lwr) if fuse_emission else ()))
    final, bp8, eps_u = outs[:3]
    eps_prev = outs[3] if emit_eps_prev else None
    final = final[pad_rows_j] if uniform else final[:s]
    if return_padded_bp:
        # hand the padded [T8, S8, B] planes straight to the Pallas
        # backtrace — slicing here and re-padding there would copy the
        # ~100 MB int8 tensor twice (pad rows/frames are inert)
        if emit_eps_prev:
            return final, bp8, eps_u, eps_prev
        return final, bp8, eps_u
    if uniform:
        bp8 = bp8[:t_len, pad_rows_j]  # back to original numbering
        if emit_eps_prev:  # prev-state VALUES also carry padded row ids
            w_live, w8 = uniform
            eps_prev = (eps_prev // w8) * w_live + eps_prev % w8
    else:
        bp8 = bp8[:t_len, :s]
    if emit_eps_prev:
        return (final, bp8, eps_u[:t_len, :r].astype(u_dtype),
                eps_prev[:t_len, :r])
    return final, bp8, eps_u[:t_len, :r].astype(u_dtype)


@functools.partial(jax.jit,
                   static_argnames=("topo", "interpret", "frames_per_step",
                                    "fuse_emission", "input_ubt"))
def viterbi_banded_wordtrace_pallas(nll_tb, g: BandedGraph, n_frames,
                                    topo: BandedTopo,
                                    interpret: bool = False,
                                    frames_per_step: int = 4,
                                    input_ubt: bool = False,
                                    fuse_emission: bool = False,
                                    bank_gemm=None):
    """Backtrace-FREE connected decode forward pass (uniform composed
    word graphs, eps_depth 1): the kernel carries an entry-time value
    plane (the lattice kernels' tau carry) and each eps re-entry
    records ``(origin word slot, origin entry time)`` into two small
    ``[R, B]`` side planes — so word recovery is an O(#words) chain
    walk (:func:`wordtrace_words_device`) instead of an O(T)
    full-plane backtrace kernel, and the ``[T, S, B]`` backpointer
    plane never exists.

    Inputs as :func:`viterbi_banded_tb_pallas` (compact bank emissions,
    or ``fuse_emission`` with the augmented feature block).  Returns
    ``(final [S, B], eps_u [T, R, B], eps_tau [T, R, B] int32,
    final_tau [S, B] int32)`` in original state numbering."""
    if not topo.uniform_w:
        raise ValueError("wordtrace needs a uniform composed word graph")
    if set(topo.word_starts) & set(topo.word_ends):
        raise ValueError("wordtrace needs disjoint word starts/ends")
    if getattr(g, "cross_src", None) is not None:
        raise NotImplementedError("wordtrace: cross-arc graphs run on the "
                                  "lex lattice kernel")
    if fuse_emission:
        if bank_gemm is None:
            raise ValueError("fuse_emission needs bank_gemm=(w, lw)")
        if not input_ubt:
            raise ValueError("fuse_emission expects the [A, T, B] layout")
        a_in, t_len, b = nll_tb.shape
        w_gm, lw_gm = bank_gemm
        n_bank_g, n_mix, a_w = w_gm.shape
        if a_w != a_in:
            raise ValueError(f"augmented dim mismatch: {a_w} vs {a_in}")
        s_in = n_bank_g
    else:
        if input_ubt:
            s_in, t_len, b = nll_tb.shape
        else:
            t_len, s_in, b = nll_tb.shape
    s = topo.n_states
    n_bank = max(topo.bank_map) + 1 if topo.bank_map else 0
    if not fuse_emission and s_in != n_bank:
        raise ValueError("wordtrace takes compact bank emissions "
                         f"({s_in} vs {n_bank})")
    r = len(topo.word_starts)
    l = len(topo.word_ends)
    r8 = _ceil(r, 8)
    l8 = _ceil(l, 8)
    sb8 = _ceil(s_in, 8)

    w_live = topo.uniform_w
    w8 = _ceil(w_live, 8)
    v8 = _ceil(r, 8)
    s8 = v8 * w8
    uniform = (w_live, w8)
    orig_rows = np.arange(s)
    pad_rows = (orig_rows // w_live) * w8 + orig_rows % w_live
    in8 = _ceil(a_in, 8) if fuse_emission else sb8
    per_k = 8 * in8 * b + 16 * r8 * b
    k = max(1, min(frames_per_step,
                   (12 * 2**20 - 4 * s8 * b) // max(per_k, 1)))
    if input_ubt:
        k = _ceil(k, 8)
    t8 = _ceil(t_len, k)

    e_end = np.zeros((l8, s8), np.float32)
    e_end[np.arange(l), pad_rows[list(topo.word_ends)]] = 1.0
    sel_sg = np.zeros((r8, s8), np.float32)
    sel_sg[np.arange(r), pad_rows[list(topo.word_starts)]] = 1.0
    p_start = np.zeros((s8, r8), np.float32)
    p_start[pad_rows[list(topo.word_starts)], np.arange(r)] = 1.0
    expand = np.zeros((s8, sb8), np.float32)
    expand[pad_rows, list(topo.bank_map)] = 1.0
    expand = np.concatenate([expand] * 3, axis=1)
    e_start = np.zeros((r8, sb8), np.float32)
    e_start[np.arange(r),
            [topo.bank_map[ws] for ws in topo.word_starts]] = 1.0

    pad_rows_j = jnp.asarray(pad_rows)
    band_t = jnp.full((s8, 8), POS_INF, jnp.float32)
    band_t = band_t.at[pad_rows_j, : MAX_BAND + 1].set(g.band.T)
    eps_vals = jnp.full((r8, l8), POS_INF, jnp.float32)
    eps_vals = eps_vals.at[:r, :l].set(g.eps_block)
    init_col = jnp.full((s8, 1), POS_INF, jnp.float32)
    init_col = init_col.at[pad_rows_j, 0].set(g.init_cost)
    if fuse_emission:
        if in8 != a_in or t8 != t_len:
            nll_tb = jnp.pad(nll_tb, ((0, in8 - a_in), (0, t8 - t_len),
                                      (0, 0)))
        wg = jnp.zeros((n_mix * sb8, in8), jnp.float32)
        lwr = jnp.zeros((n_mix * sb8, 1), jnp.float32)
        for mi in range(n_mix):
            wg = wg.at[mi * sb8 : mi * sb8 + n_bank_g, :a_in].set(
                w_gm[:, mi, :].astype(jnp.float32))
            lwr = lwr.at[mi * sb8 : mi * sb8 + n_bank_g, 0].set(
                lw_gm[:, mi].astype(jnp.float32))
    elif sb8 != s_in or t8 != t_len:
        if input_ubt:
            nll_tb = jnp.pad(nll_tb, ((0, sb8 - s_in), (0, t8 - t_len),
                                      (0, 0)))
        else:
            nll_tb = jnp.pad(nll_tb, ((0, t8 - t_len), (0, sb8 - s_in),
                                      (0, 0)))
    nf_row = n_frames.astype(jnp.int32)[None, :]

    kernel = functools.partial(
        _kernel, topo=topo, eps_depth=1, frames_per_step=k, bank_mode=True,
        uniform=uniform, ubt=input_ubt, emit_wordtrace=True,
        fuse_emission=fuse_emission,
        n_mix=n_mix if fuse_emission else 0,
        u8_mix=sb8 if fuse_emission else 0, num_steps=t8 // k)
    const = lambda *_: (0, 0)
    nll_spec = (pl.BlockSpec((in8, k, b), lambda t: (0, t, 0),
                             memory_space=pltpu.VMEM)
                if input_ubt else
                pl.BlockSpec((k, sb8, b), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM))
    fuse_specs = ([pl.BlockSpec((n_mix * sb8, in8), const,
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((n_mix * sb8, 1), const,
                                memory_space=pltpu.VMEM)]
                  if fuse_emission else [])
    final, eps_u, eps_tau, ftau = pl.pallas_call(
        kernel,
        grid=(t8 // k,),
        in_specs=[
            nll_spec,
            pl.BlockSpec(expand.shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec((s8, 8), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((r8, l8), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((l8, s8), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((r8, sb8), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((r8, s8), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((s8, r8), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((s8, 1), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b), const, memory_space=pltpu.VMEM),
        ] + fuse_specs,
        out_specs=[
            pl.BlockSpec((s8, b), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, r8, b), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, r8, b), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s8, b), const, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((s8, b), jnp.float32),
            jax.ShapeDtypeStruct((t8, r8, b),
                                 jnp.int8 if l <= 127 else jnp.int32),
            jax.ShapeDtypeStruct((t8, r8, b), jnp.int32),
            jax.ShapeDtypeStruct((s8, b), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((s8, b), jnp.float32),
                        pltpu.VMEM((s8, b), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(nll_tb, jnp.asarray(expand, jnp.bfloat16), band_t, eps_vals,
      jnp.asarray(e_end), jnp.asarray(e_start), jnp.asarray(sel_sg),
      jnp.asarray(p_start), init_col, nf_row,
      *((wg, lwr) if fuse_emission else ()))
    return (final[pad_rows_j], eps_u[:t_len, :r], eps_tau[:t_len, :r],
            ftau[pad_rows_j].astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("max_words",))
def wordtrace_words_device(eps_u, eps_tau, best_slot, entry_t, n_frames,
                           max_words: int = 128):
    """Device-side word recovery over the word-trace side planes.

    Follows the eps chain ``(t, v) -> (eps_tau[t, v], eps_u[t, v])``
    from each stream's final word for up to ``max_words`` steps —
    O(#words) tiny gathers instead of an O(T) backtrace, and only the
    ``[max_words, B]`` id plane crosses the host link.  Returns
    ``(words_rev [max_words, B] int32 with -1 past the first word,
    n_words [B])``; reverse per stream for the word sequence."""
    t_len, r, b = eps_u.shape
    flat_u = eps_u.reshape(-1, b).astype(jnp.int32)
    flat_t = eps_tau.reshape(-1, b)
    cols = jnp.arange(b)

    def step(carry, _):
        v, t, alive = carry
        word = jnp.where(alive, v, -1)
        idx = jnp.clip(t, 0, t_len - 1) * r + jnp.clip(v, 0, r - 1)
        u = flat_u[idx, cols]
        t2 = flat_t[idx, cols]
        cont = alive & (t > 0)
        return (jnp.where(cont, u, v), jnp.where(cont, t2, t),
                cont), (word, cont)

    alive0 = n_frames > 0
    (_, _, _), (words_rev, conts) = jax.lax.scan(
        step, (best_slot.astype(jnp.int32), entry_t.astype(jnp.int32),
               alive0), None, length=max_words)
    n_words = jnp.sum(words_rev >= 0, axis=0)
    return words_rev, n_words


def _backtrace_kernel(bp_ref, epsu_ref, end_oh_ref, p_we_ref, sel_sg_ref,
                      nf_ref, out_ref, oh_ref, *, t_len: int, eps_depth: int,
                      frames_per_step: int, uniform: Tuple[int, int] = ()):
    i = pl.program_id(0)
    n_blk = pl.num_programs(0)
    s8, b = oh_ref.shape
    r8 = sel_sg_ref.shape[0]
    l8 = p_we_ref.shape[1]

    def dotf(a, x):
        return jax.lax.dot_general(
            a, x, (((1,), (0,)), ((), ())),
            precision=_SELECT_PRECISION,
            preferred_element_type=jnp.float32,
        )

    iota_s = jax.lax.broadcasted_iota(jnp.int32, (s8, 1), 0).astype(jnp.float32)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (l8, 1), 0).astype(jnp.float32)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (r8, 1), 0).astype(jnp.float32)
    nf = nf_ref[...]  # [1, B]
    oh = oh_ref[...]

    for kk in range(frames_per_step - 1, -1, -1):
        t = (n_blk - 1 - i) * frames_per_step + kk
        # seed from the end state at the last real frame; padded tail
        # frames (t >= t_len) pass the carry through untouched
        oh = jnp.where(t == t_len - 1, end_oh_ref[...], oh)
        plane = bp_ref[kk].astype(jnp.float32)  # [S8, B]
        eps_plane = epsu_ref[kk].astype(jnp.float32)  # [R8, B]
        rec = oh  # recorded state for frame t (pre-unwind, XLA semantics)

        code = jnp.sum(plane * oh, axis=0, keepdims=True)  # [1, B]
        used = jnp.zeros((1, b), jnp.float32)
        st_val = jnp.sum(iota_s * oh, axis=0, keepdims=True)  # [1, B]
        for _ in range(eps_depth):
            m = (code == jnp.float32(_EPS)).astype(jnp.float32)  # [1, B]
            used = jnp.maximum(used, m)
            if uniform:
                # slot r = state // stride and end state = u*stride+off
                # are pure integer expressions on uniform graphs — the
                # eps unwind is compares + reductions, zero MXU passes
                stride, end_off = uniform
                r_row = jnp.floor(st_val / stride)  # [1, B]
                u_val = jnp.sum(
                    eps_plane * (iota_r == r_row).astype(jnp.float32),
                    axis=0, keepdims=True)
                u_state = u_val * stride + end_off
                oh_end = (iota_s == u_state).astype(jnp.float32)
            else:
                # origin u from the side plane at this state's start
                # slot: a one-hot select of the slot row, then a one-hot
                # of u itself (all-zero when not an eps code, incl.
                # garbage on inactive frames)
                r_oh = dotf(sel_sg_ref[...], oh)  # [R8, B] slot
                u_val = jnp.sum(eps_plane * r_oh, axis=0, keepdims=True)
                u_oh = (u_val == iota_l).astype(jnp.float32) * m
                oh_end = dotf(p_we_ref[...], u_oh)  # word_ends[u] one-hot
                u_state = jnp.sum(iota_s * oh_end, axis=0, keepdims=True)
            oh = oh * (1.0 - m) + oh_end * m
            st_val = st_val * (1.0 - m) + u_state * m
            code = jnp.sum(plane * oh, axis=0, keepdims=True)

        # prev = st - code, code in {0, 1, 2} (band: st >= code)
        prev_oh = jnp.zeros((s8, b), jnp.float32)
        for d in range(MAX_BAND + 1):
            md = (code == jnp.float32(d)).astype(jnp.float32)
            # roll up by d == roll down by s8-d (pltpu.roll shift >= 0)
            rolled = oh if d == 0 else pltpu.roll(oh, s8 - d, 0)
            prev_oh = prev_oh + rolled * md

        act = (jnp.where(t > 0, 1.0, 0.0) * (t < nf).astype(jnp.float32)
               * jnp.where(t <= t_len - 1, 1.0, 0.0))
        oh = prev_oh * act + rec * (1.0 - act)

        state_row = jnp.sum(iota_s * rec, axis=0, keepdims=True)  # [1, B]
        flag_row = used * (t < nf).astype(jnp.float32)
        out_ref[kk] = jnp.concatenate(
            [state_row, flag_row, jnp.zeros((6, b), jnp.float32)], axis=0)

    oh_ref[...] = oh


def _backtrace_kernel_val(bp_ref, epsp_ref, endv_ref, nf_ref, out_ref,
                          st_ref, *, t_len: int, frames_per_step: int,
                          stride: int):
    """Value-carried reverse walk: the per-stream state rides as ONE
    [1, B] value row, so each frame costs a single full-plane lookup
    (cast + iota-compare + mul + reduce) instead of the one-hot form's
    ~15 plane passes.  The eps unwind reads the post-unwind predecessor
    straight from the forward kernel's ``eps_prev`` side plane — no
    second full-plane lookup.  Requires eps_depth == 1 and disjoint
    word starts/ends (guarded at emit time)."""
    i = pl.program_id(0)
    n_blk = pl.num_programs(0)
    s8, b = bp_ref.shape[1], bp_ref.shape[2]
    r8 = epsp_ref.shape[1]

    iota_s = jax.lax.broadcasted_iota(jnp.int32, (s8, 1), 0).astype(jnp.float32)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (r8, 1), 0).astype(jnp.float32)
    nf = nf_ref[...].astype(jnp.float32)  # [1, B]
    st = st_ref[...]  # [1, B] carried state value

    for kk in range(frames_per_step - 1, -1, -1):
        t = (n_blk - 1 - i) * frames_per_step + kk
        st = jnp.where(t == t_len - 1, endv_ref[...], st)
        rec = st
        plane = bp_ref[kk].astype(jnp.float32)  # [S8, B] — the ONE big op
        code = jnp.sum(plane * (iota_s == st).astype(jnp.float32),
                       axis=0, keepdims=True)  # [1, B]
        m = (code == jnp.float32(_EPS)).astype(jnp.float32)
        # recorded state is a word-start row: its slot is st // stride
        r_row = jnp.floor(st / jnp.float32(stride))
        pprev = jnp.sum(epsp_ref[kk].astype(jnp.float32)
                        * (iota_r == r_row).astype(jnp.float32),
                        axis=0, keepdims=True)  # [1, B]
        band_prev = st - jnp.minimum(code, jnp.float32(MAX_BAND))
        prev = pprev * m + band_prev * (1.0 - m)
        act = (jnp.where(t > 0, 1.0, 0.0) * (t < nf).astype(jnp.float32)
               * jnp.where(t <= t_len - 1, 1.0, 0.0))
        st = prev * act + rec * (1.0 - act)
        out_ref[kk] = jnp.concatenate(
            [rec, m * (t < nf).astype(jnp.float32),
             jnp.zeros((6, b), jnp.float32)], axis=0)

    st_ref[...] = st


@functools.partial(jax.jit,
                   static_argnames=("topo", "eps_depth", "interpret",
                                    "frames_per_step"))
def banded_backtrace_tb_pallas(bp8, eps_u, g: BandedGraph, end_state, n_frames,
                               topo: BandedTopo, eps_depth: int = 1,
                               interpret: bool = False,
                               frames_per_step: int = 8, eps_prev=None):
    """Pallas twin of :func:`ops.viterbi_banded.banded_backtrace_tb`.

    The XLA form is a T-step ``lax.scan`` of [B]-scalar work — scan
    machinery dominates (~7 ms at T=500, B=512).  Here the current
    state rides as a one-hot [S, B] plane in VMEM: the per-frame
    backpointer read is an elementwise multiply + sublane reduction,
    the eps unwind is a one-hot MXU matmul over the side-plane origin,
    and the band step is three masked sublane rolls.  ``bp8 [T, S, B]``,
    ``eps_u [T, R, B]``, ``end_state [B]``, ``n_frames [B]`` ->
    ``(states [T, B] int32, eps_entered [T, B] bool)``, bit-identical
    to the XLA kernel.
    """
    t_len, s, b = bp8.shape
    r = len(topo.word_starts)
    l = len(topo.word_ends)
    r8 = _ceil(r, 8)
    l8 = _ceil(l, 8)
    w_live = topo.uniform_w
    # detect the uniform-padded plane layout (rows v*W8 + w) produced by
    # the uniform viterbi kernel's return_padded_bp path
    padded_layout = bool(
        w_live and s == r8 * _ceil(w_live, 8)
        and s != _ceil(topo.n_states, 8) and s != topo.n_states)
    if padded_layout:
        s8 = s
        w8 = _ceil(w_live, 8)
        uniform = (w8, w_live - 1)
        end_state = end_state.astype(jnp.int32)
        end_ids = (end_state // w_live) * w8 + end_state % w_live
    else:
        s8 = _ceil(topo.n_states, 8)
        if s == topo.n_states:
            if s8 != s:
                bp8 = jnp.pad(bp8, ((0, 0), (0, s8 - s), (0, 0)))
        elif s != s8:
            raise ValueError(f"graph/topology mismatch: {s} vs {topo.n_states}")
        uniform = (w_live, w_live - 1) if w_live else ()
        end_ids = end_state.astype(jnp.int32)
    # keep the plane's native dtype (int8 when origins fit): casting to
    # int32 here would re-materialize the ~80 MB plane in HBM; the
    # kernel casts per-block in VMEM
    if eps_u.shape[1] == r and r8 != r:
        eps_u = jnp.pad(eps_u, ((0, 0), (0, r8 - r), (0, 0)))
    elif eps_u.shape[1] not in (r, r8):
        raise ValueError(f"eps plane/topology mismatch: {eps_u.shape[1]} vs {r}")

    p_we = np.zeros((s8, l8), np.float32)
    if not padded_layout:
        p_we[[topo.word_ends[u] for u in range(l)], np.arange(l)] = 1.0
    sel_sg = np.zeros((r8, s8), np.float32)
    if not padded_layout:
        sel_sg[np.arange(r), list(topo.word_starts)] = 1.0
    end_oh = (jax.lax.broadcasted_iota(jnp.int32, (s8, b), 0)
              == end_ids[None, :]).astype(jnp.float32)
    nf_row = n_frames.astype(jnp.int32)[None, :]

    # block the reverse walk into k-frame grid steps: per-step fixed
    # overhead dominated the one-frame-per-step form (500 sequential
    # tiny steps)
    k = frames_per_step
    t8 = _ceil(bp8.shape[0], k)
    if bp8.shape[0] != t8:
        bp8 = jnp.pad(bp8, ((0, t8 - bp8.shape[0]), (0, 0), (0, 0)))
        eps_u = jnp.pad(eps_u, ((0, t8 - eps_u.shape[0]), (0, 0), (0, 0)))
    elif eps_u.shape[0] != t8:  # viterbi pads both to its own multiple
        eps_u = jnp.pad(eps_u, ((0, t8 - eps_u.shape[0]), (0, 0), (0, 0)))
    n_blk = t8 // k

    if eps_prev is not None and uniform and eps_depth == 1:
        # fast path: value-carried walk + eps_prev side plane (uniform
        # layouts only — the slot of a start row is st // stride)
        stride = w8 if padded_layout else w_live
        if eps_prev.shape[0] != t8:
            eps_prev = jnp.pad(
                eps_prev, ((0, t8 - eps_prev.shape[0]), (0, 0), (0, 0)))
        if eps_prev.shape[1] != r8:
            eps_prev = jnp.pad(eps_prev, ((0, 0), (0, r8 - eps_prev.shape[1]),
                                          (0, 0)))
        kernel = functools.partial(_backtrace_kernel_val, t_len=t_len,
                                   frames_per_step=k, stride=stride)
        const = lambda *_: (0, 0)
        rev = lambda i: (n_blk - 1 - i, 0, 0)
        endv = end_ids.astype(jnp.float32)[None, :]
        outs = pl.pallas_call(
            kernel,
            grid=(n_blk,),
            in_specs=[
                pl.BlockSpec((k, s8, b), rev, memory_space=pltpu.VMEM),
                pl.BlockSpec((k, r8, b), rev, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, b), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, b), const, memory_space=pltpu.VMEM),
            ],
            out_specs=[pl.BlockSpec((k, 8, b), rev, memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((t8, 8, b), jnp.float32)],
            scratch_shapes=[pltpu.VMEM((1, b), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 2**20),
            interpret=interpret,
        )(bp8, eps_prev, endv, nf_row)
        out = outs[0][:t_len]
        states = out[:, 0, :].astype(jnp.int32)
        if padded_layout:  # back to original numbering
            states = (states // w8) * w_live + states % w8
        return states, out[:, 1, :] > 0.5

    kernel = functools.partial(_backtrace_kernel, t_len=t_len,
                               eps_depth=eps_depth, frames_per_step=k,
                               uniform=uniform)
    const = lambda *_: (0, 0)
    rev = lambda i: (n_blk - 1 - i, 0, 0)
    outs = pl.pallas_call(
        kernel,
        grid=(n_blk,),
        in_specs=[
            pl.BlockSpec((k, s8, b), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, r8, b), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((s8, b), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((s8, l8), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((r8, s8), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b), const, memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((k, 8, b), rev, memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((t8, 8, b), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((s8, b), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(bp8, eps_u, end_oh, jnp.asarray(p_we), jnp.asarray(sel_sg), nf_row)
    out = outs[0][:t_len]
    states = out[:, 0, :].astype(jnp.int32)
    if padded_layout:  # back to original numbering
        states = (states // w8) * w_live + states % w8
    return states, out[:, 1, :] > 0.5
