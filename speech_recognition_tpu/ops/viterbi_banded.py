"""Banded min-cost Viterbi — the fast path for word graphs.

Every graph this framework composes (isolated word chains, transcript
linears, sausages, loop graphs) has structure the dense O(S^2)
relaxation ignores:

* frame-consuming edges exist only *within* a word, at state offsets
  0 (self), +1 (step), +2 (skip) — the reference's ``max_jump_dist=2``
  (``/root/reference/sr/recognition/kmeans.py:53``), and word states
  are enumerated consecutively;
* every cross-word edge is a same-column epsilon edge between the V
  word-end and V word-start states.

One frame step is therefore three shifted adds of the ``[B, S]`` cost
frontier plus a tiny dense ``[V, V]`` boundary block — O(3S + V^2)
instead of O(S^2), in pure VPU-friendly form:

* no scatters: the epsilon update re-enters the frontier through a
  constant-index gather (``start_pos``/``is_start`` maps), because TPU
  scatters serialize;
* compact backpointers: one int8 per (frame, state) — band offset
  0..2, or ``3 + end_index`` for an epsilon arrival — cutting the
  backpointer HBM traffic 8x vs the dense kernel's two int32 planes.

Results are bit-identical to :func:`ops.viterbi.viterbi` (asserted in
tests), including argmin tie-breaking.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from speech_recognition_tpu.utils.numerics import POS_INF

__all__ = [
    "BandedGraph",
    "banded_arrays",
    "eps_ranges",
    "viterbi_banded",
    "viterbi_banded_tb",
    "banded_backtrace",
    "banded_backtrace_tb",
]

MAX_BAND = 2  # reference max_jump_dist
_EPS_BASE = MAX_BAND + 1  # bp8 code for eps arrival from end u: _EPS_BASE + u

# Production scan-unroll factor.  The per-frame step is tiny relative to
# the TPU while-loop iteration overhead; unrolling amortizes it (sweep in
# RESULTS.md).  1 until measured otherwise.
DEFAULT_UNROLL = 1


class BandedGraph(NamedTuple):
    """Device-ready banded form of a WordGraph."""

    band: jnp.ndarray  # [MAX_BAND+1, S] cost of arriving from state v-d
    init_cost: jnp.ndarray  # [S]
    word_starts: jnp.ndarray  # [V]
    word_ends: jnp.ndarray  # [V]
    eps_block: jnp.ndarray  # [V, V] eps cost end[u] -> start[v]
    start_pos: jnp.ndarray  # [S] slot v if state is starts[v] else 0
    is_start: jnp.ndarray  # [S] bool
    end_states: jnp.ndarray  # [E]
    end_bonus: jnp.ndarray  # [E]
    bank_state: jnp.ndarray  # [S]

    @property
    def n_words(self) -> int:
        return self.word_starts.shape[0]


def banded_arrays(graph) -> BandedGraph:
    """Extract the banded form; raises ValueError if the graph is not
    banded (callers fall back to the dense kernel)."""
    s = graph.n_states
    trans = np.asarray(graph.trans)
    band = np.full((MAX_BAND + 1, s), POS_INF, dtype=np.float32)
    covered = np.zeros_like(trans, dtype=bool)
    for d in range(MAX_BAND + 1):
        idx = np.arange(d, s)
        band[d, idx] = trans[idx, idx - d]
        covered[idx, idx - d] = True
    if ((trans < POS_INF / 2) & ~covered).any():
        raise ValueError("graph has frame edges outside the +0..+2 band")

    slot = np.asarray(graph.slot)
    starts = np.flatnonzero(np.r_[True, slot[1:] != slot[:-1]])
    ends = np.r_[starts[1:] - 1, s - 1]
    for d in range(1, MAX_BAND + 1):
        idx = np.arange(d, s)
        crosses = slot[idx] != slot[idx - d]
        if np.any((band[d, idx] < POS_INF / 2) & crosses):
            raise ValueError("band edge crosses a word boundary")

    v = len(starts)
    if _EPS_BASE + v > 127:
        raise ValueError("too many words for int8 backpointers")

    eps = np.asarray(graph.eps_trans)
    eps_block = eps[np.ix_(starts, ends)].astype(np.float32)
    covered_eps = np.zeros_like(eps, dtype=bool)
    covered_eps[np.ix_(starts, ends)] = True
    if ((eps < POS_INF / 2) & ~covered_eps).any():
        raise ValueError("epsilon edge outside end->start structure")

    start_pos = np.zeros(s, dtype=np.int32)
    start_pos[starts] = np.arange(v)
    is_start = np.zeros(s, dtype=bool)
    is_start[starts] = True

    return BandedGraph(
        band=jnp.asarray(band),
        init_cost=jnp.asarray(graph.init_cost),
        word_starts=jnp.asarray(starts.astype(np.int32)),
        word_ends=jnp.asarray(ends.astype(np.int32)),
        eps_block=jnp.asarray(eps_block),
        start_pos=jnp.asarray(start_pos),
        is_start=jnp.asarray(is_start),
        end_states=jnp.asarray(graph.end_states),
        end_bonus=jnp.asarray(graph.end_bonus),
        bank_state=jnp.asarray(graph.bank_state),
    )


def eps_ranges(g: BandedGraph) -> tuple:
    """Static block-sparsity metadata for the eps relaxation.

    The ``[V, V]`` eps block of composed word graphs is block-banded:
    slot-k word arcs only receive epsilon edges from the adjacent
    slot(s), so most of the per-frame ``[V, V]`` eps score block is
    POS_INF.  Returns maximal runs of consecutive to-arcs sharing one
    finite from-arc span, as ``((v_lo, v_hi, u_lo, u_hi), ...)``.
    Host-side (concrete arrays only); results are bit-identical with
    and without (asserted in tests).

    Measured caveat: in the XLA kernels the block form is SLOWER than
    the full relaxation (86 ms vs 57 ms at B=512 — XLA fuses the full
    min/argmin reduction, and the per-block updates break that fusion),
    so the default call sites pass None; the metadata exists for the
    Pallas kernel, whose static topology exploits it directly."""
    blk = np.asarray(g.eps_block)
    v = blk.shape[0]
    spans = []
    for i in range(v):
        us = np.flatnonzero(blk[i] < POS_INF / 2)
        spans.append((int(us.min()), int(us.max()) + 1) if us.size else None)
    out, cur = [], None
    for i, sp in enumerate(spans):
        if sp is None:
            if cur:
                out.append(cur)
            cur = None
        elif cur and (cur[2], cur[3]) == sp:
            cur = (cur[0], i + 1, cur[2], cur[3])
        else:
            if cur:
                out.append(cur)
            cur = (i, i + 1, sp[0], sp[1])
    if cur:
        out.append(cur)
    return tuple(out)


def _eps_base(end_vals, g: BandedGraph, ranges):
    """min-plus product of the eps block with the word-end costs.

    ``end_vals [..., V]`` -> ``(base [..., V], origin [..., V] int8)``
    where ``base[v] = min_u eps[v,u] + end_vals[u]`` and ``origin`` is
    the first-minimum u (dense argmin tie-break).  With ``ranges``
    (from :func:`eps_ranges`) only the finite blocks are touched;
    to-arcs outside every block keep base=POS_INF / origin=0, which can
    never win the subsequent improvement test."""
    if ranges is None:
        scores = g.eps_block + end_vals[..., None, :]
        return jnp.min(scores, axis=-1), jnp.argmin(scores, axis=-1).astype(jnp.int8)
    v = g.eps_block.shape[0]
    lead = end_vals.shape[:-1]
    base = jnp.full(lead + (v,), POS_INF)
    origin = jnp.zeros(lead + (v,), jnp.int8)
    for (v_lo, v_hi, u_lo, u_hi) in ranges:
        sc = g.eps_block[v_lo:v_hi, u_lo:u_hi] + end_vals[..., None, u_lo:u_hi]
        base = base.at[..., v_lo:v_hi].set(jnp.min(sc, axis=-1))
        origin = origin.at[..., v_lo:v_hi].set(
            (jnp.argmin(sc, axis=-1) + u_lo).astype(jnp.int8))
    return base, origin


def _eps_base_tb(end_vals, g: BandedGraph, ranges):
    """State-major twin of :func:`_eps_base`: ``end_vals [V, B]`` ->
    ``(base [V, B], origin [V, B] int8)``."""
    if ranges is None:
        scores = g.eps_block[:, :, None] + end_vals[None, :, :]
        return jnp.min(scores, axis=1), jnp.argmin(scores, axis=1).astype(jnp.int8)
    v, b = g.eps_block.shape[0], end_vals.shape[-1]
    base = jnp.full((v, b), POS_INF)
    origin = jnp.zeros((v, b), jnp.int8)
    for (v_lo, v_hi, u_lo, u_hi) in ranges:
        sc = (g.eps_block[v_lo:v_hi, u_lo:u_hi, None]
              + end_vals[None, u_lo:u_hi, :])
        base = base.at[v_lo:v_hi].set(jnp.min(sc, axis=1))
        origin = origin.at[v_lo:v_hi].set(
            (jnp.argmin(sc, axis=1) + u_lo).astype(jnp.int8))
    return base, origin


def _shift(x, d):
    """x[v-d] with POS_INF fill (last axis)."""
    if d == 0:
        return x
    return jnp.concatenate(
        [jnp.full(x.shape[:-1] + (d,), POS_INF, x.dtype), x[..., :-d]], axis=-1
    )


def _select_band(cands):
    """Tie-break selection shared by every layout: dense-argmin
    tie-break = smallest origin index = largest d, so iterate d
    ascending and replace on <=.  ``cands[d]`` is the cost of arriving
    via band offset d."""
    best = jnp.full(cands[0].shape, POS_INF)
    d_sel = jnp.zeros(cands[0].shape, jnp.int8)
    for d, cand in enumerate(cands):
        take = cand <= best
        best = jnp.where(take, cand, best)
        d_sel = jnp.where(take, jnp.int8(d), d_sel)
    return jnp.minimum(best, POS_INF), d_sel


def _band_relax(prev, band):
    """frontier [..., S] -> (base cost, band offset d int8)."""
    return _select_band(
        [band[d] + _shift(prev, d) for d in range(MAX_BAND + 1)])


def _eps_relax(cost, emis, g: BandedGraph, ranges=None):
    """One same-column pass, gather-only.  Returns (cost, bp8_update)
    where bp8_update[s] = _EPS_BASE + origin_u for improved start states,
    -1 elsewhere."""
    end_vals = cost[..., g.word_ends]  # [V] constant-index gather
    base, origin_u = _eps_base(end_vals, g, ranges)
    cand = jnp.minimum(base + emis[..., g.word_starts], POS_INF)
    # dense re-entry via gather
    cand_dense = cand[..., g.start_pos]
    u_dense = origin_u[..., g.start_pos]
    better = g.is_start & (cand_dense < cost)
    cost = jnp.where(better, cand_dense, cost)
    bp_upd = jnp.where(better, _EPS_BASE + u_dense, jnp.int8(-1))
    return cost, bp_upd


@functools.partial(jax.jit,
                   static_argnames=("eps_depth", "need_bp", "beam_width", "unroll",
                                    "eps_ranges"))
def viterbi_banded(nll, g: BandedGraph, n_frames, eps_depth: int = 1,
                   need_bp: bool = True, beam_width: int = 0,
                   unroll: int = 1, eps_ranges=None):
    """Banded Viterbi for one utterance.

    Returns ``(final_cost [S], bp8 [T, S] int8)`` — decode bp8 with
    :func:`banded_backtrace`.  With ``need_bp=False`` the backpointer
    plane is skipped entirely (isolated scoring / likelihood only).
    ``beam_width > 0`` enables rank-based frontier pruning per frame
    (threshold form, exact ties with the k-th best survive — the
    reference's ``dtw`` beam semantics, ``decode.py:62-68``).
    ``unroll`` is passed to the frame scan: the step is tiny relative
    to TPU loop overhead, so unrolling amortizes the per-iteration
    latency (measured sweep in RESULTS.md).
    """
    t_len, s = nll.shape
    nll = jnp.minimum(nll, POS_INF)

    def column(base_cost, d_sel, emis):
        cost = jnp.minimum(base_cost + emis, POS_INF)
        bp8 = d_sel
        for _ in range(eps_depth):
            cost, bp_upd = _eps_relax(cost, emis, g, eps_ranges)
            bp8 = jnp.where(bp_upd >= 0, bp_upd, bp8)
        if beam_width:
            thresh = -jax.lax.top_k(-cost, beam_width)[0][-1]
            cost = jnp.where(cost <= thresh, cost, POS_INF)
        return cost, bp8

    cost0, bp0 = column(g.init_cost, jnp.zeros((s,), jnp.int8), nll[0])

    def step(carry, inputs):
        prev, final = carry
        t, emis = inputs
        base, d_sel = _band_relax(prev, g.band)
        cost, bp8 = column(base, d_sel, emis)
        active = t < n_frames
        cost = jnp.where(active, cost, prev)
        final = jnp.where(t == n_frames - 1, cost, final)
        out = bp8 if need_bp else None
        return (cost, final), out

    ts = jnp.arange(1, t_len)
    init_final = jnp.where(n_frames == 1, cost0, POS_INF)
    (last, final), bps = jax.lax.scan(step, (cost0, init_final), (ts, nll[1:]),
                                      unroll=unroll)
    if need_bp:
        bp8 = jnp.concatenate([bp0[None], bps], axis=0)
    else:
        bp8 = jnp.zeros((0, s), jnp.int8)
    return final, bp8


@functools.partial(jax.jit, static_argnames=("eps_depth", "unroll", "eps_ranges"))
def viterbi_banded_tb(nll_tb, g: BandedGraph, n_frames, eps_depth: int = 1,
                      unroll: int = 1, eps_ranges=None):
    """State-major batched banded Viterbi: ``nll_tb [T, S, B]``,
    ``n_frames [B]`` -> ``(final [S, B], bp8 [T, S, B])``.

    Bit-identical to ``vmap(viterbi_banded)`` (asserted in tests) but
    with the batch on the TPU lane (minor) axis: S=385 padded to 512
    lanes wastes 25% of every VPU op in the ``[B, S]`` layout, while a
    batch that is a multiple of 128 packs exactly — measured 23% faster
    at B=512 on v5e.  Beam pruning needs a per-item top-k along S
    (lane-hostile here); callers wanting a beam use the vmapped kernel.
    """
    t_len, s, b = nll_tb.shape
    nll_tb = jnp.minimum(nll_tb, POS_INF)

    def shift_s(x, d):
        if d == 0:
            return x
        pad = jnp.full((d, x.shape[-1]), POS_INF, x.dtype)
        return jnp.concatenate([pad, x[:-d, :]], axis=0)

    def band_relax(prev):
        return _select_band(
            [g.band[d][:, None] + shift_s(prev, d)
             for d in range(MAX_BAND + 1)])

    def eps_relax(cost, emis):
        end_vals = cost[g.word_ends, :]  # [V, B]
        base, origin_u = _eps_base_tb(end_vals, g, eps_ranges)
        cand = jnp.minimum(base + emis[g.word_starts, :], POS_INF)
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

    init = jnp.broadcast_to(g.init_cost[:, None], (s, b))
    cost0, bp0 = column(init, jnp.zeros((s, b), jnp.int8), nll_tb[0])

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
    (_, final), bps = jax.lax.scan(step, (cost0, init_final), (ts, nll_tb[1:]),
                                   unroll=unroll)
    bp8 = jnp.concatenate([bp0[None], bps], axis=0)
    return final, bp8


@functools.partial(jax.jit, static_argnames=("eps_depth", "unroll"))
def banded_backtrace_tb(bp8, g: BandedGraph, end_state, n_frames,
                        eps_depth: int = 1, unroll: int = 1):
    """Batched backtrace for the state-major layout: ``bp8 [T, S, B]``,
    ``end_state [B]``, ``n_frames [B]`` -> ``(states [T, B],
    eps_entered [T, B])`` with :func:`banded_backtrace` semantics."""
    t_len, s, b = bp8.shape

    def step(carry, t):
        rec = carry  # [B]
        st = carry
        plane = bp8[t]  # [S, B]
        code = jnp.take_along_axis(plane, st[None, :], axis=0)[0]
        used_eps = jnp.zeros((b,), bool)
        for _ in range(eps_depth):
            is_eps = code >= _EPS_BASE
            used_eps = used_eps | is_eps
            st = jnp.where(is_eps, g.word_ends[jnp.maximum(code - _EPS_BASE, 0)], st)
            code = jnp.where(
                is_eps, jnp.take_along_axis(plane, st[None, :], axis=0)[0], code
            )
        prev = st - code.astype(jnp.int32)
        active = (t > 0) & (t < n_frames)
        return jnp.where(active, prev, rec), (rec, used_eps & (t < n_frames))

    ts = jnp.arange(t_len - 1, -1, -1)
    _, (states_rev, eps_rev) = jax.lax.scan(step, end_state.astype(jnp.int32), ts,
                                            unroll=unroll)
    return states_rev[::-1], eps_rev[::-1]


@functools.partial(jax.jit, static_argnames=("eps_depth", "unroll"))
def banded_backtrace(bp8, g: BandedGraph, end_state, n_frames, eps_depth: int = 1,
                     unroll: int = 1):
    """Decode int8 backpointers to (states [T], eps_entered [T]) with the
    same semantics as :func:`ops.viterbi.viterbi_backtrace`."""
    t_len, s = bp8.shape

    def step(carry, t):
        rec = carry  # recorded state for frame t (pre-unwind, like dense)
        st = carry
        code = bp8[t, st]
        used_eps = jnp.array(False)
        for _ in range(eps_depth):
            is_eps = code >= _EPS_BASE
            used_eps = used_eps | is_eps
            st = jnp.where(is_eps, g.word_ends[jnp.maximum(code - _EPS_BASE, 0)], st)
            code = jnp.where(is_eps, bp8[t, st], code)
        prev = st - code.astype(jnp.int32)
        active = (t > 0) & (t < n_frames)
        return jnp.where(active, prev, rec), (rec, used_eps & (t < n_frames))

    ts = jnp.arange(t_len - 1, -1, -1)
    _, (states_rev, eps_rev) = jax.lax.scan(step, end_state.astype(jnp.int32), ts,
                                            unroll=unroll)
    return states_rev[::-1], eps_rev[::-1]
