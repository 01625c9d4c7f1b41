"""Pallas TPU kernel for lexical-tree (cross-edge) banded Viterbi.

The word-graph Pallas kernel (``ops/viterbi_banded_pallas.py``) rejects
graphs with cross-arc frame edges, so large-vocabulary lextree decoding
(``models/lexgraph.py``) fell back to the XLA ``lax.scan`` kernel —
~300 us per frame at [S~9.6k, B=256], 50x above the VPU bound, all scan
machinery and dynamic gathers.  This kernel keeps the big frontier in
VMEM and turns every irregular access into TPU-native structure:

* **SoA state layout**: with uniform W-state units, state (arc a,
  offset j) lives at row ``j * A + a`` of the ``[W*A, B]`` frontier.
  Then *all* arc starts are rows ``[0, A)``, *all* arc ends are rows
  ``[(W-1)*A, W*A)`` — contiguous slices — and the band relaxation's
  ``j-d -> j`` step is one ``pltpu.roll`` by ``d*A`` (the POS_INF
  additive mask reproduces the shift fill bit-exactly);
* **cross edges level-blocked**: arcs are reordered BFS-level-major
  (roots first), so the parent-end gather decomposes into one small
  exact one-hot matmul per trie level ``[n_{d+1}, n_d] @ [n_d, B]`` —
  sum(n_d * n_{d+1}) is ~1/6 of the naive [A, A] one-hot for real
  lexica, and the selectors stay int8 in VMEM (cast per use);
* **eps re-entry without scatters**: root arcs occupy rows ``[0, R)``,
  so the leaf -> root re-entry is a per-root min-reduction over the
  contiguous end slice followed by a concat — no start-state gather at
  all.  Tie-breaking matches the XLA kernel exactly (first minimum in
  preorder-leaf order, via a masked leaf-id min).

Bit-identical to :func:`ops.viterbi_banded.viterbi_banded_tb` modulo
the static SoA renumbering (asserted in tests, interpret mode on CPU
and compiled on-chip).  Replaces the reference's per-token Python dict
decoder (``/root/reference/sr/recognition/decode.py:45-68``) at
vocabulary scales the reference never reaches.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from speech_recognition_tpu.ops.viterbi_banded import _CROSS, _EPS, MAX_BAND
from speech_recognition_tpu.utils.numerics import POS_INF

__all__ = ["LexTopo", "LexPlan", "lex_pallas_plan", "viterbi_lex_pallas",
           "viterbi_lex_pallas_lattice", "viterbi_lex_pallas_wide_lattice",
           "lex_backtrace_soa", "lex_pallas_fits", "lex_pallas_batch_chunk",
           "lex_pallas_lattice_batch_chunk"]

_SELECT_PRECISION = jax.lax.Precision.HIGHEST


class LexTopo(NamedTuple):
    """Hashable static shape data for the kernel."""

    su: int  # uniform unit state count
    a_pad: int  # padded arc count (sum of 8-padded level sizes)
    n_roots: int  # R (root arcs = re-entry slots)
    n_leaves: int  # L
    level_sizes: Tuple[int, ...]  # 8-padded arcs per level
    n_bank: int  # bank emission rows (= n_units * su_bank)
    # True when every eps_block row is constant (wic + smear graphs):
    # the per-root reduction collapses to ONE masked min over the end
    # slice.  The shared argmin is taken on the raw end values; it can
    # pick a different (equal-cost) origin than the XLA kernel only if
    # f32 rounding of c_r + end creates a tie the raw ends don't have
    # (measure-zero for continuous costs).
    eps_rowconst: bool = False
    # True: selectors are bf16 tripled along the contraction (ONE MXU
    # pass per level — fastest, 6 bytes/entry).  False: int8 singles
    # cast in-kernel, three passes per level (1 byte/entry — doubles
    # the vocabulary that fits VMEM).
    sel_tripled: bool = True
    # Lane-major ([B, S_soa]) kernel layout for reference-dictionary
    # scale graphs — see lex_pallas_plan(layout="wide").
    lane_major: bool = False
    # Block-banded selector mode (reference-dictionary scale): the
    # parent-major child order makes each level's one-hot selector a
    # monotone staircase, so every <=128-row child block references a
    # narrow contiguous parent window.  Selectors shrink from
    # sum(n_d * n_{d+1}) (92 MB int8 at 6,250 words) to ~a_pad * W
    # bytes (5-7 MB).  sel_blocks = (sel_row0, n_rows, win_start) per
    # block, rows into ONE [A_nr, W] int8 array (A_nr = a_pad - roots).
    sel_banded: bool = False
    sel_w: int = 0
    sel_blocks: Tuple[Tuple[int, int, int], ...] = ()
    # Factored emission expansion: instead of one [S_soa, 3*U8] bf16
    # one-hot over BANK rows (40 MB at dict scale), an [a_pad, U8p]
    # int8 one-hot over UNIT ids applied per within-unit offset j to a
    # [su, U8p, B] re-arranged emission block (2 MB).
    expand_factored: bool = False
    n_units_pad: int = 0  # U8p when factored


class LexPlan(NamedTuple):
    """Runtime arrays for the kernel plus decode-side remapping."""

    topo: LexTopo
    band_soa: jnp.ndarray  # [W*A, MAX_BAND+1] f32
    cross_cost: jnp.ndarray  # [A, 1] f32 (POS_INF at roots/pads)
    eps_exit: jnp.ndarray  # [A, R8] f32: eps_block[r, leaf(a)] by arc
    eps_rows: jnp.ndarray  # [R8, 1] f32 row constants (rowconst graphs)
    leaf_id: jnp.ndarray  # [A, 1] f32 preorder leaf slot (L at non-leaf)
    expand: jnp.ndarray  # [W*A, 3*U8] bf16 one-hot bank -> SoA, x3 planes
    init_soa: jnp.ndarray  # [W*A, 1] f32
    sels: Tuple[jnp.ndarray, ...]  # per-level bf16 [n_{d+1}, 3*n_d] one-hots
    # decode-side maps (host numpy)
    state_of_soa: np.ndarray  # [W*A] original state id (-1 at pads)
    cross_src_soa: jnp.ndarray  # [W*A] int32 SoA parent-end row
    ends_soa: jnp.ndarray  # [L] int32 SoA rows of leaf ends (leaf order)


def _ceil8(x: int) -> int:
    return (x + 7) // 8 * 8


def _ceil(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def lex_pallas_plan(lexg, sel_mode: str = None,
                    expand_mode: str = None, layout: str = "soa") -> LexPlan:
    """Build the SoA/level plan for a LexGraph, or raise ValueError if
    the graph is outside the kernel's structure (non-uniform units or
    too many root arcs) — callers fall back to the XLA kernel.

    ``sel_mode``: None auto-selects by VMEM budget; 'tripled' (bf16 x3,
    one MXU pass/level), 'int8' (dense int8, 3 passes), 'banded'
    (block-banded staircase int8 — the reference-dictionary-scale
    format, see LexTopo.sel_banded).  ``expand_mode``: None auto,
    'full' ([S_soa, 3*U8] bf16 one-hot over bank rows) or 'factored'
    ([a_pad, U8p] int8 over unit ids, applied per offset j).

    ``layout``: 'soa' = the state-major [S_soa, B] kernel (batch on
    lanes; Mosaic pads lanes to 128, so every live frontier plane costs
    S_soa * 128 * 4 bytes — caps out near ~25k states); 'wide' = the
    lane-major [B, S_soa] kernel for reference-dictionary-scale graphs
    (states on lanes, batch on sublanes: plane bytes scale with the
    true batch, levels padded to 128 so every lane slice/concat is
    tile-aligned; forces banded selectors + factored expansion)."""
    wide = layout == "wide"
    if wide:
        if sel_mode not in (None, "banded") or expand_mode not in (
                None, "factored"):
            raise ValueError("wide layout uses banded selectors and the "
                             "factored expansion")
        sel_mode, expand_mode = "banded", "factored"
    g = lexg.banded
    band = np.asarray(g.band)
    arc_of_state = np.asarray(lexg.arc_of_state)
    n_arcs = lexg.n_arcs
    s = lexg.n_states
    if s % n_arcs != 0:
        raise ValueError("lex Pallas kernel needs uniform unit sizes")
    su = s // n_arcs
    if not np.all(np.bincount(arc_of_state, minlength=n_arcs) == su):
        raise ValueError("lex Pallas kernel needs uniform unit sizes")
    roots_orig = np.asarray(g.word_starts) // su  # arc ids (preorder)
    r = len(roots_orig)
    if r > 64:
        raise ValueError("lex Pallas kernel: too many root arcs "
                         f"({r}); use the XLA kernel")
    cross_src = np.asarray(g.cross_src)
    cross_cost = np.asarray(g.cross_cost)
    parent = np.full(n_arcs, -1, np.int64)  # parent arc (preorder ids)
    ccost = np.full(n_arcs, POS_INF, np.float32)
    for a in range(n_arcs):
        st = a * su
        if cross_cost[st] < POS_INF / 2:
            parent[a] = cross_src[st] // su
            ccost[a] = cross_cost[st]

    # BFS-level order, roots first, children parent-major.
    depth = np.zeros(n_arcs, np.int64)
    for a in range(n_arcs):  # preorder: parent precedes child
        if parent[a] >= 0:
            depth[a] = depth[parent[a]] + 1
    children = [[] for _ in range(n_arcs)]
    order = [int(a) for a in range(n_arcs) if parent[a] < 0]
    if len(order) != r or not np.array_equal(np.sort(roots_orig),
                                             np.sort(order)):
        raise ValueError("root arcs do not match eps re-entry slots")
    # re-entry slot order must match eps_block rows: use word_starts order
    order = [int(a) for a in roots_orig]
    for a in range(n_arcs):
        if parent[a] >= 0:
            children[parent[a]].append(a)
    levels = [order[:]]
    while True:
        nxt = [c for p in levels[-1] for c in children[p]]
        if not nxt:
            break
        levels.append(nxt)
        order += nxt
    order = np.asarray(order, np.int64)

    # padded level layout (wide: 128 so lane slices/concats are aligned)
    lvpad = 128 if wide else 8
    lv_sizes = tuple(_ceil(len(lv), lvpad) for lv in levels)
    a_pad = sum(lv_sizes)
    pos = np.full(n_arcs, -1, np.int64)  # preorder arc -> padded BFS pos
    off = 0
    for lv, p8 in zip(levels, lv_sizes):
        for i, a in enumerate(lv):
            pos[a] = off + i
        off += p8

    s_soa = su * a_pad
    bank_state = np.asarray(g.bank_state)
    n_bank = int(bank_state.max()) + 1
    u8 = _ceil8(n_bank)

    band_soa = np.full((s_soa, MAX_BAND + 1), POS_INF, np.float32)
    init_soa = np.full((s_soa, 1), POS_INF, np.float32)
    state_of_soa = np.full(s_soa, -1, np.int64)
    cross_src_soa = np.zeros(s_soa, np.int32)
    init_orig = np.asarray(g.init_cost)
    arc_unit_pos = np.full(a_pad, -1, np.int64)  # unit id per padded slot
    for a in range(n_arcs):
        p = pos[a]
        rows = np.arange(su) * a_pad + p
        sts = a * su + np.arange(su)
        band_soa[rows] = band[:, sts].T
        init_soa[rows, 0] = init_orig[sts]
        state_of_soa[rows] = sts
        arc_unit_pos[p] = bank_state[sts[0]] // su
        if parent[a] >= 0:
            cross_src_soa[p] = (su - 1) * a_pad + pos[parent[a]]

    cc = np.full((a_pad, 1), POS_INF, np.float32)
    for a in range(n_arcs):
        if parent[a] >= 0:
            cc[pos[a], 0] = ccost[a]

    # --- emission expansion format ---------------------------------
    if n_bank % su != 0:
        raise ValueError("bank rows are not unit-major multiples of su")
    n_units = n_bank // su
    u8p = _ceil(n_units, 128) if wide else _ceil8(n_units)
    if expand_mode is None:
        # full one-hot is the fastest (one MXU pass); switch to the
        # factored form when its bf16 bytes get big
        expand_mode = "full" if s_soa * 3 * u8 * 2 <= 4 * 2**20 \
            else "factored"
    if expand_mode == "factored":
        expand_np = np.zeros((a_pad, u8p), np.float32)
        for p in range(a_pad):
            if arc_unit_pos[p] >= 0:
                expand_np[p, arc_unit_pos[p]] = 1.0
        expand = jnp.asarray(expand_np, jnp.int8)
        expand_factored = True
    else:
        expand_np = np.zeros((s_soa, u8), np.float32)
        for a in range(n_arcs):
            p = pos[a]
            rows = np.arange(su) * a_pad + p
            sts = a * su + np.arange(su)
            expand_np[rows, bank_state[sts]] = 1.0
        expand = jnp.asarray(
            np.concatenate([expand_np] * 3, axis=1), jnp.bfloat16)
        expand_factored = False

    # --- cross-edge selector format ---------------------------------
    # dense per-level one-hots (child-local row, parent-local col):
    # 'tripled' bf16x3 (one MXU pass/level) or 'int8' (3 passes); at
    # reference-dictionary scale both blow VMEM and 'banded' kicks in.
    sel_entries = sum(a * b_ for a, b_ in zip(lv_sizes[:-1], lv_sizes[1:]))
    if sel_mode is None:
        if 6 * sel_entries <= 16 * 2**20:
            sel_mode = "tripled"
        elif sel_entries <= 16 * 2**20:
            sel_mode = "int8"
        else:
            sel_mode = "banded"
    sel_tripled = sel_mode == "tripled"
    sel_banded = sel_mode == "banded"
    sel_blocks: list = []
    sel_w = 0
    if sel_banded and len(levels) > 1:
        # Children are parent-major within each level, so parent
        # positions are monotone: a <=128-row child block references a
        # contiguous parent window.  One [A_nr, W] int8 array, W = the
        # widest (8-aligned, 128-rounded) window over all blocks.
        cb = 128
        gpar = np.full(a_pad, -1, np.int64)
        for a in range(n_arcs):
            if parent[a] >= 0:
                gpar[pos[a]] = pos[parent[a]]
        raw = []  # (rows slice in level space, lo8, hi)
        off = lv_sizes[0]
        for li in range(1, len(levels)):
            n8 = lv_sizes[li]
            for c0 in range(0, n8, cb):
                nr = min(cb, n8 - c0)
                ps = gpar[off + c0 : off + c0 + nr]
                valid = ps >= 0
                if valid.any():
                    lo = int(ps[valid].min())
                    hi = int(ps[valid].max())
                else:
                    lo = hi = 0
                lo8 = lo - lo % lvpad
                raw.append((off + c0, nr, lo8, hi))
            off += n8
        span = max(hi - lo8 + 1 for (_, _, lo8, hi) in raw)
        sel_w = min(_ceil(span, 128), a_pad - a_pad % 8)
        if sel_w < span:
            raise ValueError("lex Pallas kernel: banded selector window "
                             f"needs {span} parent rows > a_pad; use XLA")
        a_nr = a_pad - lv_sizes[0]
        sel_np = np.zeros((a_nr, sel_w), np.float32)
        row0 = 0
        for (c_abs, nr, lo8, hi) in raw:
            w0 = min(lo8, a_pad - sel_w)
            if hi - w0 >= sel_w:
                raise ValueError("banded selector window overflow")
            ps = gpar[c_abs : c_abs + nr]
            for i in range(nr):
                if ps[i] >= 0:
                    sel_np[row0 + i, ps[i] - w0] = 1.0
            sel_blocks.append((row0, nr, int(w0)))
            row0 += nr
        sels = [jnp.asarray(sel_np, jnp.int8)]
    else:
        if sel_banded:  # single-level (flat) graph: nothing to gather
            sel_banded = False
            sel_tripled = not wide
        sels = []
        src_off = 0
        for li in range(1, len(levels)):
            n_p = lv_sizes[li - 1]
            sel = np.zeros((lv_sizes[li], n_p), np.float32)
            for i, a in enumerate(levels[li]):
                sel[i, pos[parent[a]] - src_off] = 1.0
            if sel_tripled:
                sels.append(jnp.asarray(np.concatenate([sel] * 3, axis=1),
                                        jnp.bfloat16))
            else:
                sels.append(jnp.asarray(sel, jnp.int8))
            src_off += n_p

    # eps exit: eps_block[r, leaf_slot(a)] laid out per arc column
    eps_block = np.asarray(g.eps_block)
    l = eps_block.shape[1]
    r8 = _ceil8(r)
    eps_exit = np.full((a_pad, r8), POS_INF, np.float32)
    leaf_id = np.full((a_pad, 1), float(l), np.float32)
    ends_orig_arcs = np.asarray(g.word_ends) // su  # leaf arcs, slot order
    for slot, a in enumerate(ends_orig_arcs):
        eps_exit[pos[a], :r] = eps_block[:, slot]
        leaf_id[pos[a], 0] = float(slot)
    ends_soa = ((su - 1) * a_pad + pos[ends_orig_arcs]).astype(np.int32)
    # Row-constant eps fast path: selected only when every eps_block row
    # is constant across leaves (wic + unigram-smear graphs).  Caveat
    # (documented restriction): the kernel then takes ONE shared argmin
    # over the RAW end values, while the XLA kernel argmins per root
    # over f32-rounded (c_r + end).  If that rounding creates a tie the
    # raw ends do not have (plausible with quantized/int8-derived
    # emission costs), the recorded eps ORIGIN — and hence the word
    # sequence — can differ from the XLA kernel at equal path cost.
    # Continuous (float) acoustic costs make this measure-zero; callers
    # feeding quantized costs who need bit-identical origins should
    # force the XLA backend.
    eps_rowconst = bool(np.all(eps_block == eps_block[:, :1]))
    eps_rows = np.full((r8, 1), POS_INF, np.float32)
    eps_rows[:r, 0] = eps_block[:, 0]

    topo = LexTopo(su=su, a_pad=a_pad, n_roots=r, n_leaves=l,
                   level_sizes=lv_sizes, n_bank=n_bank,
                   eps_rowconst=eps_rowconst, sel_tripled=sel_tripled,
                   lane_major=wide,
                   sel_banded=sel_banded, sel_w=sel_w,
                   sel_blocks=tuple(sel_blocks),
                   expand_factored=expand_factored, n_units_pad=u8p)
    if wide:
        # lane-major array orientations: per-state constants become
        # broadcastable ROWS ([1, S] / [1, A]), the band a [8, S] panel,
        # the eps exit block [R8, A]; a row's true lanes are the array
        # dim, so no 128-lane padding waste on narrow columns.
        band_w = np.full((8, s_soa), POS_INF, np.float32)
        band_w[: MAX_BAND + 1] = band_soa.T
        eps_rows_w = np.full((8, lv_sizes[0]), POS_INF, np.float32)
        eps_rows_w[0, :r] = eps_rows[:r, 0]
        return LexPlan(
            topo=topo,
            band_soa=jnp.asarray(band_w),
            cross_cost=jnp.asarray(cc.T),
            eps_exit=jnp.asarray(eps_exit.T.copy()),
            eps_rows=jnp.asarray(eps_rows_w),
            leaf_id=jnp.asarray(leaf_id.T.copy()),
            expand=expand,
            init_soa=jnp.asarray(init_soa.T.copy()),
            sels=tuple(sels),
            state_of_soa=state_of_soa,
            cross_src_soa=jnp.asarray(cross_src_soa),
            ends_soa=jnp.asarray(ends_soa),
        )
    return LexPlan(
        topo=topo,
        band_soa=jnp.asarray(band_soa),
        cross_cost=jnp.asarray(cc),
        eps_exit=jnp.asarray(eps_exit),
        eps_rows=jnp.asarray(eps_rows),
        leaf_id=jnp.asarray(leaf_id),
        expand=expand,
        init_soa=jnp.asarray(init_soa),
        sels=tuple(sels),
        state_of_soa=state_of_soa,
        cross_src_soa=jnp.asarray(cross_src_soa),
        ends_soa=jnp.asarray(ends_soa),
    )


def lex_pallas_vmem_bytes(plan: "LexPlan", batch: int,
                          frames_per_step: int = 2) -> int:
    """Scoped-VMEM estimate for one kernel invocation at ``batch``:
    resident constants (selectors, expansion, band/init/eps columns)
    plus the batch-scaled planes (prev scratch, final out, ~3.5 live
    f32 transients, double-buffered int8 bp blocks).

    Batch rides the LANE axis in the state-major layout and Mosaic pads
    lanes to 128, so a [S_soa, B] plane occupies S_soa * ceil128(B) * 4
    bytes regardless of how small B is — at reference-dictionary scale
    (~83k SoA states) that is 42 MB per plane at ANY batch, which is
    exactly why the lane-major 'wide' layout exists."""
    topo = plan.topo
    s_soa = topo.su * topo.a_pad
    bl = _ceil(batch, 128)  # Mosaic lane padding
    sel_bytes = sum(int(np.prod(s.shape)) * s.dtype.itemsize
                    for s in plan.sels)
    exp_bytes = int(np.prod(plan.expand.shape)) * plan.expand.dtype.itemsize
    const_bytes = (sel_bytes + exp_bytes + s_soa * (MAX_BAND + 1) * 4
                   + topo.a_pad * (plan.eps_exit.shape[1] + 2) * 4
                   + s_soa * 4)
    plane = s_soa * bl * 4
    per_b = int(5.5 * plane) + 2 * frames_per_step * s_soa * bl
    return const_bytes + per_b


def lex_pallas_fits(plan: "LexPlan", batch: int,
                    frames_per_step: int = 2) -> bool:
    """VMEM envelope for the kernel (128 MB physical on v5e; Mosaic
    scoped budget raised to 127 MB).  Round-2's measured failures —
    a 2k-word trie with 35 MB dense tripled selectors at ANY batch —
    are reproduced by the byte model in
    :func:`lex_pallas_vmem_bytes`; batches beyond the envelope are
    CHUNKED by the decode layer (``lex_pallas_batch_chunk``), not
    rejected."""
    return lex_pallas_vmem_bytes(plan, batch, frames_per_step) <= 100 * 2**20


def lex_pallas_wide_vmem_bytes(plan: "LexPlan", batch: int,
                               frames_per_step: int = 2) -> int:
    """Scoped-VMEM estimate for the lane-major kernel: constants plus
    ~7.5 live [B, S] f32 planes and double-buffered int8 bp blocks."""
    topo = plan.topo
    s_w = topo.su * topo.a_pad
    sel_bytes = sum(int(np.prod(s.shape)) * s.dtype.itemsize
                    for s in plan.sels)
    exp_bytes = int(np.prod(plan.expand.shape)) * plan.expand.dtype.itemsize
    const_bytes = (sel_bytes + exp_bytes + 8 * s_w * 4
                   + plan.eps_exit.shape[0] * topo.a_pad * 4
                   + 4 * 8 * s_w)
    plane = s_w * batch * 4
    # 5.5 live planes: recalibrated on-chip after the round-4 trims
    # (freeze-trick final capture + row-stacked gathers removed live
    # [B, S] planes) — dict1 B=32 compiles and runs (22.58 ms), the
    # round-3 9.5-plane model had clamped it to 16
    per_b = int(5.5 * plane) + 2 * frames_per_step * s_w * batch
    return const_bytes + per_b


def lex_pallas_wide_batch_chunk(plan: "LexPlan", batch: int,
                                frames_per_step: int = 2) -> int:
    """Largest 8-multiple batch tile for the wide kernel inside the
    VMEM envelope (0 if nothing fits)."""
    bc = min(_ceil8(batch), 64)
    while bc >= 8:
        if lex_pallas_wide_vmem_bytes(plan, min(bc, batch),
                                      frames_per_step) <= 100 * 2**20:
            return min(bc, batch)
        bc -= 8
    return 0


def lex_pallas_lattice_vmem_bytes(plan: "LexPlan", batch: int,
                                  frames_per_step: int = 2) -> int:
    """Scoped-VMEM estimate for the LATTICE variants: the base kernel's
    budget plus the tau scratch plane and its ~2 live transients
    (tau_b / tau_g), minus nothing that matters (the dropped bp blocks
    are smaller than the added endc/endt f32+int32 blocks only at
    su < 2, which the lex builder rejects anyway — keep the estimate
    conservative)."""
    topo = plan.topo
    s = topo.su * topo.a_pad
    extra = 3 * s * batch * 4 + 2 * frames_per_step * topo.a_pad * batch * 8
    if topo.lane_major:
        # wide lattice carries tau + the stacked [2B, A] gather
        # transients on top of the base kernel: ~4.5 extra live planes
        # (on-chip: dict1 B=16 compiles, B=24 OOMs)
        extra = int(4.5 * s * batch * 4) + (
            2 * frames_per_step * topo.a_pad * batch * 8)
        return lex_pallas_wide_vmem_bytes(plan, batch, frames_per_step) + extra
    return lex_pallas_vmem_bytes(plan, batch, frames_per_step) + extra


def lex_pallas_lattice_batch_chunk(plan: "LexPlan", batch: int,
                                   frames_per_step: int = 2) -> int:
    """Largest batch tile for the lattice kernel matching the plan's
    layout (8-multiples for wide, powers of two for SoA); 0 if nothing
    fits — callers fall back to the XLA lattice scan."""
    if plan.topo.lane_major:
        bc = min(_ceil8(batch), 64)
        while bc >= 8:
            if lex_pallas_lattice_vmem_bytes(
                    plan, min(bc, batch), frames_per_step) <= 100 * 2**20:
                return min(bc, batch)
            bc -= 8
        return 0
    bc = min(1 << max(0, int(batch - 1).bit_length()), 512)
    while bc >= 1:
        eff = min(bc, batch)
        if lex_pallas_lattice_vmem_bytes(plan, eff,
                                         frames_per_step) <= 100 * 2**20:
            return eff
        if eff <= 1:
            break
        bc //= 2
    return 0


def lex_pallas_batch_chunk(plan: "LexPlan", batch: int,
                           frames_per_step: int = 2) -> int:
    """Largest batch tile (a power of two, or ``batch`` itself when it
    is smaller) inside the VMEM envelope; 0 if nothing fits."""
    bc = min(1 << max(0, int(batch - 1).bit_length()), 512)
    while bc >= 1:
        eff = min(bc, batch)
        if lex_pallas_fits(plan, eff, frames_per_step):
            return eff
        if eff <= 1:
            break
        bc //= 2
    return 0


def _lex_kernel(nll_ref, expand_ref, band_ref, cc_ref, eps_ref, rows_ref,
                lid_ref, init_ref, nf_ref, *rest, topo: LexTopo,
                n_levels: int, frames_per_step: int,
                emit_eps_prev: bool = False, emit_lattice: bool = False,
                num_steps: int = 0):
    sel_refs = rest[:n_levels]
    epsp_ref = bp_ref = epsu_ref = endc_ref = endt_ref = tau_ref = None
    if emit_lattice:
        # lattice mode: no backpointer planes at all — pass 2 rescoring
        # replaces the backtrace; instead the end-slice costs and the
        # carried entry times stream out per frame
        final_ref, endc_ref, endt_ref, cost_ref, tau_ref = rest[n_levels:]
    elif emit_eps_prev:
        final_ref, bp_ref, epsu_ref, epsp_ref, cost_ref = rest[n_levels:]
    else:
        final_ref, bp_ref, epsu_ref, cost_ref = rest[n_levels:]
    ti = pl.program_id(0)
    s8, b = cost_ref.shape
    su, a_pad, r = topo.su, topo.a_pad, topo.n_roots
    r8 = eps_ref.shape[1]
    end_lo = (su - 1) * a_pad

    def dotd(sel, x):  # bf16 x bf16 -> f32 accumulate, one MXU pass
        return jax.lax.dot_general(
            sel, x, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32)

    def split3(v):
        """f32 -> three stacked bf16 planes reconstructing v exactly
        (24 = 3 x 8 mantissa bits; the one-hot select re-sums the
        non-overlapping parts exactly in the f32 accumulator)."""
        v0 = v.astype(jnp.bfloat16)
        r1 = v - v0.astype(jnp.float32)
        v1 = r1.astype(jnp.bfloat16)
        v2 = (r1 - v1.astype(jnp.float32)).astype(jnp.bfloat16)
        return jnp.concatenate([v0, v1, v2], axis=0)

    prev = cost_ref[...]
    tau = tau_ref[...] if emit_lattice else None
    nf_b = nf_ref[...]  # [1, B]; where() broadcasts over sublanes
    inf_sb = jnp.full((s8, b), POS_INF, jnp.float32)

    def gather_ends(src, fill0):
        """Level-blocked one-hot gather of an [A, B] end-slice plane to
        child-start rows (the cross-edge parent map), shared by the
        cost relaxation and the lattice entry-time carry."""
        pieces = [jnp.full((topo.level_sizes[0], b), fill0, jnp.float32)]
        if topo.sel_banded:
            w = topo.sel_w
            sel_all = sel_refs[0]
            for (row0, nr, w0) in topo.sel_blocks:
                selb = sel_all[row0 : row0 + nr, :].astype(jnp.bfloat16)
                s3 = split3(src[w0 : w0 + w, :])
                pieces.append(dotd(selb, s3[:w]) + dotd(selb, s3[w : 2 * w])
                              + dotd(selb, s3[2 * w :]))
        else:
            src_off = 0
            for li in range(n_levels):
                n_src = topo.level_sizes[li]
                sl = slice(src_off, src_off + n_src)
                if topo.sel_tripled:
                    pieces.append(dotd(sel_refs[li][...], split3(src[sl, :])))
                else:
                    selb = sel_refs[li][...].astype(jnp.bfloat16)
                    s3 = split3(src[sl, :])
                    pieces.append(dotd(selb, s3[:n_src])
                                  + dotd(selb, s3[n_src:2 * n_src])
                                  + dotd(selb, s3[2 * n_src:]))
                src_off += n_src
        return (jnp.concatenate(pieces, axis=0)
                if len(pieces) > 1 else pieces[0])
    if topo.expand_factored:
        expand_bf = expand_ref[...].astype(jnp.bfloat16)  # [a_pad, U8p]
    if emit_eps_prev:
        # SoA row index along the end slice, for the eps_prev plane
        iota_a = jax.lax.broadcasted_iota(
            jnp.int32, (a_pad, 1), 0).astype(jnp.float32)

    for k in range(frames_per_step):
        t_abs = ti * frames_per_step + k
        if topo.expand_factored:
            # per-offset-j int8 unit one-hot on the [su, U8p, B]
            # re-arranged block: rows j*a_pad+p get nll[j, unit(p)]
            nll_k = nll_ref[k]  # [su, U8p, B]
            u8p = nll_k.shape[1]
            pieces_e = []
            for j in range(su):
                s3 = split3(nll_k[j])  # [3*U8p, B]
                pieces_e.append(dotd(expand_bf, s3[:u8p])
                                + dotd(expand_bf, s3[u8p : 2 * u8p])
                                + dotd(expand_bf, s3[2 * u8p :]))
            emis = (jnp.concatenate(pieces_e, axis=0)
                    if su > 1 else pieces_e[0])
        else:
            # [S_soa, B] exact one-hot bank expansion, one MXU pass
            emis = dotd(expand_ref[...], split3(nll_ref[k]))

        # band relaxation: SoA j-1 -> j is a roll by a_pad rows.  No
        # wrap penalty: band columns are POS_INF at rows < d*a_pad, and
        # POS_INF + x == POS_INF bitwise for |x| << ulp(1e30) ~ 1e23,
        # so wrapped garbage can never leak past the final clamp.  The
        # min-chain + post-hoc code derivation replaces per-d selects;
        # tie-breaking is unchanged (largest finite d wins: c2 checked
        # first, matching dense first-minimum-origin semantics).
        c0 = band_ref[:, 0:1] + prev
        c1 = band_ref[:, 1:2] + pltpu.roll(prev, a_pad, 0)
        c2 = band_ref[:, 2:3] + pltpu.roll(prev, 2 * a_pad, 0)
        best = jnp.minimum(jnp.minimum(c0, c1), c2)
        dsel = jnp.where(best == c2, jnp.float32(2),
                         jnp.where(best == c1, jnp.float32(1),
                                   jnp.float32(0)))
        # no clamp: the post-emission min clamps, and min(x + e, POS_INF)
        # == min(min(x, POS_INF) + e, POS_INF) bitwise for real costs
        base = best

        # cross edges: level-blocked one-hot gathers of the previous
        # frontier's arc-end slice (reads PREV, like the XLA kernel).
        # The f32 end values split exactly into three bf16 planes
        # (24 = 3 x 8 mantissa bits), so each gather is three DEFAULT
        # bf16 matmuls instead of HIGHEST's six passes — the select
        # stays bit-exact (one-hot rows pick one value; the f32
        # accumulator re-sums the non-overlapping parts exactly).
        if emit_lattice:
            # entry-time carry follows the band decision (wrapped rows
            # only matter where the cost is POS_INF — harmless garbage)
            tau_prev_f = tau
            tau_b = jnp.where(dsel == jnp.float32(1),
                              pltpu.roll(tau, a_pad, 0), tau)
            tau_b = jnp.where(dsel == jnp.float32(2),
                              pltpu.roll(tau, 2 * a_pad, 0), tau_b)

        ends_prev = prev[end_lo:, :]  # [A, B]
        gath = gather_ends(ends_prev, POS_INF)
        cand_start = jnp.minimum(gath + cc_ref[...], POS_INF)  # [A, B]
        if su > 1:
            cand_cross = jnp.concatenate(
                [cand_start,
                 jnp.full((end_lo, b), POS_INF, jnp.float32)], axis=0)
        else:
            cand_cross = cand_start
        take = cand_cross <= base
        base = jnp.where(take, cand_cross, base)
        dsel = jnp.where(take, jnp.float32(_CROSS), dsel)
        if emit_lattice:
            tau_g = gather_ends(tau[end_lo:, :], 0.0)  # [A, B]
            if su > 1:
                tau_g = jnp.concatenate(
                    [tau_g, jnp.zeros((end_lo, b), jnp.float32)], axis=0)
            tau_b = jnp.where(take, tau_g, tau_b)

        if k == 0:  # first frame of step 0 seeds from init
            is0 = ti == 0
            init_b = init_ref[...] + jnp.zeros((s8, b), jnp.float32)
            base = jnp.where(is0, init_b, base)
            dsel = jnp.where(is0, jnp.float32(0), dsel)
            prev = jnp.where(is0, inf_sb, prev)
            if emit_lattice:
                tau_b = jnp.where(is0, jnp.float32(0), tau_b)
                tau_prev_f = jnp.where(is0, jnp.float32(0), tau_prev_f)

        cost = jnp.minimum(base + emis, POS_INF)
        bp = dsel

        # eps re-entry: per-root min over the end slice, first minimum
        # in preorder-leaf order (masked leaf-id min), then a concat
        # update of the root rows [0, R8)
        end_vals = cost[end_lo:, :]  # [A, B]
        big = jnp.float32(topo.n_leaves + 1)
        if emit_eps_prev:
            # post-unwind predecessor per end row: end rows carry band
            # codes only (cross edges enter starts, eps enters roots —
            # su >= 2 guards both), so prev(row) = row - d * a_pad.
            # Packed as one combo plane; the winner's value is selected
            # by its unique leaf id.
            combo = (jnp.float32(end_lo) + iota_a
                     - dsel[end_lo:, :] * jnp.float32(a_pad))  # [A, B]
        if topo.eps_rowconst:
            # constant eps rows (wic + smear): ONE masked min over the
            # end slice serves every root; eps_rows broadcasts on top
            masked = jnp.where(lid_ref[...] < jnp.float32(topo.n_leaves),
                               end_vals, POS_INF)
            m = jnp.min(masked, axis=0, keepdims=True)  # [1, B]
            ids = jnp.where(masked == m, lid_ref[...], big)
            u = jnp.min(ids, axis=0, keepdims=True)
            eps_min = jnp.minimum(rows_ref[...] + m, POS_INF)  # [R8, B]
            eps_arg = u + jnp.zeros((r8, b), jnp.float32)
            if emit_eps_prev:
                pv = jnp.sum(combo * (lid_ref[...] == u).astype(jnp.float32),
                             axis=0, keepdims=True)  # [1, B]
                eps_prev = pv + jnp.zeros((r8, b), jnp.float32)
        else:
            mins, args, prevs = [], [], []
            for ri in range(r):
                sc = jnp.minimum(eps_ref[:, ri : ri + 1] + end_vals, POS_INF)
                m = jnp.min(sc, axis=0, keepdims=True)  # [1, B]
                ids = jnp.where(sc == m, lid_ref[...], big)
                arg = jnp.min(ids, axis=0, keepdims=True)
                mins.append(m)
                args.append(arg)
                if emit_eps_prev:
                    prevs.append(jnp.sum(
                        combo * (lid_ref[...] == arg).astype(jnp.float32),
                        axis=0, keepdims=True))
            pad_rows = r8 - r
            if pad_rows:
                mins.append(jnp.full((pad_rows, b), POS_INF, jnp.float32))
                args.append(jnp.zeros((pad_rows, b), jnp.float32))
                if emit_eps_prev:
                    prevs.append(jnp.zeros((pad_rows, b), jnp.float32))
            eps_min = jnp.concatenate(mins, axis=0)  # [R8, B]
            eps_arg = jnp.concatenate(args, axis=0)
            if emit_eps_prev:
                eps_prev = jnp.concatenate(prevs, axis=0)
        cand_re = jnp.minimum(eps_min + emis[:r8, :], POS_INF)
        head_cost = cost[:r8, :]
        better = cand_re < head_cost
        new_head_cost = jnp.where(better, cand_re, head_cost)
        new_head_bp = jnp.where(better, jnp.float32(_EPS), bp[:r8, :])
        cost = jnp.concatenate([new_head_cost, cost[r8:, :]], axis=0)
        bp = jnp.concatenate([new_head_bp, bp[r8:, :]], axis=0)
        side = jnp.where(better, eps_arg, jnp.float32(0))
        if emit_eps_prev:
            epsp_ref[k] = jnp.where(better, eps_prev,
                                    jnp.float32(0)).astype(jnp.int32)
        if emit_lattice:
            t_abs_f = (t_abs * jnp.ones((), jnp.int32)).astype(jnp.float32)
            tau_new = jnp.concatenate(
                [jnp.where(better, t_abs_f, tau_b[:r8, :]),
                 tau_b[r8:, :]], axis=0)

        # the length mask freezes cost/tau at their frame nf-1 values,
        # so the end-of-grid carry IS the final plane — written once on
        # the last grid step instead of a per-frame capture select
        cost = jnp.where(t_abs < nf_b, cost, prev)
        if emit_lattice:
            tau = jnp.where(t_abs < nf_b, tau_new, tau_prev_f)
            endc_ref[k] = cost[end_lo:, :]
            endt_ref[k] = tau[end_lo:, :].astype(jnp.int32)
        else:
            bp_ref[k] = bp.astype(jnp.int8)
            epsu_ref[k] = side.astype(jnp.int32)
        prev = cost

    cost_ref[...] = prev
    if emit_lattice:
        tau_ref[...] = tau

    @pl.when(ti == num_steps - 1)
    def _write_final():
        final_ref[...] = prev


@functools.partial(jax.jit, static_argnames=("topo", "interpret",
                                             "frames_per_step",
                                             "emit_eps_prev"))
def viterbi_lex_pallas(nll_tub, plan: LexPlan, n_frames, topo: LexTopo,
                       interpret: bool = False, frames_per_step: int = 2,
                       emit_eps_prev: bool = False):
    """Lexical-tree banded Viterbi over compact bank emissions.

    ``nll_tub [T, U, B]`` (bank rows), ``n_frames [B]`` ->
    ``(final [S_soa, B], bp8 [T, S_soa, B] int8, eps_u [T, R8, B]
    int32)`` in the plan's SoA numbering — decode with
    :func:`lex_backtrace_soa` and remap via ``plan.state_of_soa``.
    ``emit_eps_prev`` adds a 4th output ``eps_prev [T, R8, B] int32``
    (each re-entry winner's post-unwind predecessor SoA row) enabling
    the single-lookup value backtrace."""
    t_len, u_in, b = nll_tub.shape
    su, a_pad = topo.su, topo.a_pad
    s_soa = su * a_pad
    if not topo.expand_factored:
        u8 = plan.expand.shape[1] // 3
    r8 = plan.eps_exit.shape[1]
    n_levels = len(plan.sels)
    k = frames_per_step
    t8 = (t_len + k - 1) // k * k
    if topo.expand_factored:
        n_units = topo.n_units_pad  # U8p (8-padded unit count)
        # slice to whole units, reshape unit-major, pad/trim to U8p
        n_u_in = u_in // su
        nll_u = nll_tub[:, : n_u_in * su].reshape(t_len, n_u_in, su, b)
        nll_u = jnp.transpose(nll_u, (0, 2, 1, 3))  # [T, su, U_in, B]
        if n_u_in > n_units:
            nll_u = nll_u[:, :, :n_units]
        elif n_u_in < n_units:
            nll_u = jnp.pad(nll_u, ((0, 0), (0, 0), (0, n_units - n_u_in),
                                    (0, 0)))
        if t8 != t_len:
            nll_u = jnp.pad(nll_u, ((0, t8 - t_len), (0, 0), (0, 0), (0, 0)))
        nll_in = nll_u
        nll_spec = pl.BlockSpec((k, su, n_units, b), lambda t: (t, 0, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        if u_in > u8:
            # Bank emissions cover n_models * su rows; a lexicon that
            # never references the trailing bank units makes u8 < u_in.
            # The dropped rows are unreferenced by the expand one-hot.
            nll_tub = nll_tub[:, :u8]
            u_in = u8
        if u8 != u_in or t8 != t_len:
            nll_tub = jnp.pad(nll_tub,
                              ((0, t8 - t_len), (0, u8 - u_in), (0, 0)))
        nll_in = nll_tub
        nll_spec = pl.BlockSpec((k, u8, b), lambda t: (t, 0, 0),
                                memory_space=pltpu.VMEM)
    nf_row = n_frames.astype(jnp.int32)[None, :]

    kernel = functools.partial(_lex_kernel, topo=topo, n_levels=n_levels,
                               frames_per_step=k,
                               emit_eps_prev=emit_eps_prev,
                               num_steps=t8 // k)
    const = lambda *_: (0, 0)
    sel_specs = [pl.BlockSpec(s.shape, const, memory_space=pltpu.VMEM)
                 for s in plan.sels]
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
            pl.BlockSpec(plan.expand.shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec((s_soa, MAX_BAND + 1), const,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((a_pad, 1), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((a_pad, r8), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((r8, 1), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((a_pad, 1), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((s_soa, 1), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b), const, memory_space=pltpu.VMEM),
        ] + sel_specs,
        out_specs=[
            pl.BlockSpec((s_soa, b), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, s_soa, b), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, r8, b), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + extra_specs,
        out_shape=[
            jax.ShapeDtypeStruct((s_soa, b), jnp.float32),
            jax.ShapeDtypeStruct((t8, s_soa, b), jnp.int8),
            jax.ShapeDtypeStruct((t8, r8, b), jnp.int32),
        ] + extra_shapes,
        scratch_shapes=[pltpu.VMEM((s_soa, b), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=127 * 2**20),
        interpret=interpret,
    )(nll_in, plan.expand, plan.band_soa, plan.cross_cost, plan.eps_exit,
      plan.eps_rows, plan.leaf_id, plan.init_soa, nf_row, *plan.sels)
    if emit_eps_prev:
        final, bp8, eps_u, eps_prev = outs
        return final, bp8[:t_len], eps_u[:t_len], eps_prev[:t_len]
    final, bp8, eps_u = outs
    return final, bp8[:t_len], eps_u[:t_len]


def _lex_bt_kernel(bp_ref, epsu_ref, endv_ref, cross_ref, ends_ref, nf_ref,
                   out_ref, st_ref, *, t_len: int, a_pad: int,
                   frames_per_step: int):
    """Reverse-walk kernel: the per-stream state rides as a VALUE row
    [1, B]; every lookup is an iota-compare + masked reduction (zero
    MXU).  Cross codes follow the SoA parent column, eps codes the
    preorder-leaf side plane."""
    i = pl.program_id(0)
    n_blk = pl.num_programs(0)
    s8, b = cross_ref.shape[0], endv_ref.shape[1]
    r8 = epsu_ref.shape[1]
    l8 = ends_ref.shape[0]

    iota_s = jax.lax.broadcasted_iota(jnp.int32, (s8, 1), 0).astype(jnp.float32)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (r8, 1), 0).astype(jnp.float32)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (l8, 1), 0).astype(jnp.float32)
    nf = nf_ref[...].astype(jnp.float32)  # [1, B]
    st = st_ref[...]  # [1, B] carried state value

    for kk in range(frames_per_step - 1, -1, -1):
        t = (n_blk - 1 - i) * frames_per_step + kk
        st = jnp.where(t == t_len - 1, endv_ref[...], st)
        plane = bp_ref[kk].astype(jnp.float32)  # [S8, B]
        eps_plane = epsu_ref[kk].astype(jnp.float32)  # [R8, B]
        rec = st

        oh = (iota_s == st).astype(jnp.float32)  # [S8, B]
        code = jnp.sum(plane * oh, axis=0, keepdims=True)
        m = (code == jnp.float32(_EPS)).astype(jnp.float32)
        used = m
        # root rows [0, R): the re-entry slot IS the row value
        u = jnp.sum(eps_plane * (iota_r == st).astype(jnp.float32),
                    axis=0, keepdims=True)
        end_st = jnp.sum(ends_ref[...] * (iota_l == u).astype(jnp.float32),
                         axis=0, keepdims=True)
        st = st * (1.0 - m) + end_st * m
        oh = (iota_s == st).astype(jnp.float32)
        code = jnp.sum(plane * oh, axis=0, keepdims=True)

        src = jnp.sum(cross_ref[...] * oh, axis=0, keepdims=True)
        band_prev = st - jnp.minimum(code, jnp.float32(MAX_BAND)) * a_pad
        prev = jnp.where(code == jnp.float32(_CROSS), src, band_prev)

        act = (jnp.where(t > 0, 1.0, 0.0) * (t < nf).astype(jnp.float32)
               * jnp.where(t <= t_len - 1, 1.0, 0.0))
        st = prev * act + rec * (1.0 - act)
        out_ref[kk] = jnp.concatenate(
            [rec, used * (t < nf).astype(jnp.float32),
             jnp.zeros((6, b), jnp.float32)], axis=0)

    st_ref[...] = st


@functools.partial(jax.jit, static_argnames=("topo", "interpret",
                                             "frames_per_step"))
def viterbi_lex_pallas_lattice(nll_tub, plan: LexPlan, n_frames,
                               topo: LexTopo, interpret: bool = False,
                               frames_per_step: int = 2):
    """Lattice-generation variant of :func:`viterbi_lex_pallas`: no
    backpointer planes (pass-2 rescoring replaces the backtrace);
    instead an entry-time value plane rides the DP and the kernel
    streams out per-frame end-slice costs + entry times.  Returns
    ``(ends_cost [T, L, B], ends_tau [T, L, B] int32)`` in LEAF-SLOT
    order, matching :func:`ops.lattice.viterbi_lattice_tb`."""
    t_len, u_in, b = nll_tub.shape
    su, a_pad = topo.su, topo.a_pad
    s_soa = su * a_pad
    if not topo.expand_factored:
        u8 = plan.expand.shape[1] // 3
    r8 = plan.eps_exit.shape[1]
    n_levels = len(plan.sels)
    k = frames_per_step
    t8 = (t_len + k - 1) // k * k
    if topo.expand_factored:
        n_units = topo.n_units_pad
        n_u_in = u_in // su
        nll_u = nll_tub[:, : n_u_in * su].reshape(t_len, n_u_in, su, b)
        nll_u = jnp.transpose(nll_u, (0, 2, 1, 3))
        if n_u_in > n_units:
            nll_u = nll_u[:, :, :n_units]
        elif n_u_in < n_units:
            nll_u = jnp.pad(nll_u, ((0, 0), (0, 0), (0, n_units - n_u_in),
                                    (0, 0)))
        if t8 != t_len:
            nll_u = jnp.pad(nll_u, ((0, t8 - t_len), (0, 0), (0, 0), (0, 0)))
        nll_in = nll_u
        nll_spec = pl.BlockSpec((k, su, n_units, b), lambda t: (t, 0, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        if u_in > u8:
            nll_tub = nll_tub[:, :u8]
            u_in = u8
        if u8 != u_in or t8 != t_len:
            nll_tub = jnp.pad(nll_tub,
                              ((0, t8 - t_len), (0, u8 - u_in), (0, 0)))
        nll_in = nll_tub
        nll_spec = pl.BlockSpec((k, u8, b), lambda t: (t, 0, 0),
                                memory_space=pltpu.VMEM)
    nf_row = n_frames.astype(jnp.int32)[None, :]

    kernel = functools.partial(_lex_kernel, topo=topo, n_levels=n_levels,
                               frames_per_step=k, emit_lattice=True,
                               num_steps=t8 // k)
    const = lambda *_: (0, 0)
    sel_specs = [pl.BlockSpec(s.shape, const, memory_space=pltpu.VMEM)
                 for s in plan.sels]
    final, endc, endt = pl.pallas_call(
        kernel,
        grid=(t8 // k,),
        in_specs=[
            nll_spec,
            pl.BlockSpec(plan.expand.shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec((s_soa, MAX_BAND + 1), const,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((a_pad, 1), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((a_pad, r8), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((r8, 1), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((a_pad, 1), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((s_soa, 1), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b), const, memory_space=pltpu.VMEM),
        ] + sel_specs,
        out_specs=[
            pl.BlockSpec((s_soa, b), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, a_pad, b), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, a_pad, b), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((s_soa, b), jnp.float32),
            jax.ShapeDtypeStruct((t8, a_pad, b), jnp.float32),
            jax.ShapeDtypeStruct((t8, a_pad, b), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((s_soa, b), jnp.float32),
                        pltpu.VMEM((s_soa, b), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=127 * 2**20),
        interpret=interpret,
    )(nll_in, plan.expand, plan.band_soa, plan.cross_cost, plan.eps_exit,
      plan.eps_rows, plan.leaf_id, plan.init_soa, nf_row, *plan.sels)
    # end-slice arc order -> leaf-slot order
    leaf_cols = plan.ends_soa - (su - 1) * a_pad  # [L] arc positions
    ends_cost = endc[:t_len, leaf_cols, :]
    ends_tau = endt[:t_len, leaf_cols, :]
    return ends_cost, ends_tau


def _lex_kernel_wide(nll_ref, expand_ref, band_ref, cc_ref, eps_ref,
                     rows_ref, lid_ref, init_ref, nf_ref, *rest,
                     topo: LexTopo, frames_per_step: int,
                     emit_lattice: bool = False, num_steps: int = 0):
    """Lane-major ([B, S_soa]) twin of :func:`_lex_kernel` for
    reference-dictionary-scale graphs: states ride the LANE axis so a
    live frontier plane costs B * S_soa * 4 bytes instead of the
    state-major form's S_soa * 128 * 4 (Mosaic pads lane dims to 128 —
    at 83k states that is 42 MB per plane and the kernel needs ~10
    live planes).  Levels are 128-padded so every lane slice, shift
    and concat lands on a vreg boundary.  Always banded selectors +
    factored expansion + eps_prev side plane (the value backtrace is
    the only walk at this scale).

    ``emit_lattice``: the lattice-generation twin (the wide-layout
    counterpart of ``_lex_kernel(emit_lattice=True)``): no backpointer
    planes at all — an entry-time value plane ``tau [B, S]`` rides the
    DP (band decisions follow ``dsel``, cross decisions gather the
    parent's tau through the SAME staircase selectors, eps re-entries
    stamp the current frame), and per frame the end-slice costs + entry
    times stream out for pass-2 bigram rescoring (``ops/lattice.py``)."""
    sel_ref = rest[0] if topo.sel_blocks else None
    n_sel = 1 if topo.sel_blocks else 0
    endc_ref = endt_ref = tau_ref = None
    bp_ref = epsu_ref = epsp_ref = None
    if emit_lattice:
        final_ref, endc_ref, endt_ref, cost_ref, tau_ref = rest[n_sel:]
    else:
        final_ref, bp_ref, epsu_ref, epsp_ref, cost_ref = rest[n_sel:]
    ti = pl.program_id(0)
    b, s_w = cost_ref.shape
    su, a_pad, r = topo.su, topo.a_pad, topo.n_roots
    lv0 = topo.level_sizes[0]
    end_lo = (su - 1) * a_pad
    u128 = topo.n_units_pad

    def dot_nt(x, sel):
        """[B, K] x [N, K] -> [B, N], bf16 single pass, f32 accumulate."""
        return jax.lax.dot_general(
            x, sel, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32)

    def split3_l(v):
        """f32 [B, K] -> three exact bf16 planes (summed by 3 passes)."""
        v0 = v.astype(jnp.bfloat16)
        r1 = v - v0.astype(jnp.float32)
        v1 = r1.astype(jnp.bfloat16)
        v2 = (r1 - v1.astype(jnp.float32)).astype(jnp.bfloat16)
        return v0, v1, v2

    def gather3(x, sel):
        """Exact one-hot gather of f32 lanes: 3 bf16 passes."""
        p0, p1, p2 = split3_l(x)
        return dot_nt(p0, sel) + dot_nt(p1, sel) + dot_nt(p2, sel)

    def shift_lanes(x, d, fill=POS_INF):
        """x[:, j - d] with constant fill (lane concat, 128-aligned d)."""
        return jnp.concatenate(
            [jnp.full((b, d), fill, jnp.float32), x[:, :-d]], axis=1)

    def gather_ends_wide(src, fill0, fill1=None):
        """Block-banded staircase gather of a [B, A] (or, with two fill
        values, a row-stacked [2B, A]) end-slice plane to child-start
        lanes (the cross-edge parent map).  The lattice kernel stacks
        the cost AND entry-time planes on the row axis so ONE staircase
        pass (3 bf16 dots per block) serves both carries — the selector
        is one-hot, so the tau select through split3 stays exact."""
        w = topo.sel_w
        nrow = src.shape[0]
        if fill1 is None:
            pieces = [jnp.full((nrow, lv0), fill0, jnp.float32)]
        else:
            pieces = [jnp.concatenate(
                [jnp.full((nrow // 2, lv0), fill0, jnp.float32),
                 jnp.full((nrow - nrow // 2, lv0), fill1, jnp.float32)],
                axis=0)]
        for (row0, nr, w0) in topo.sel_blocks:
            selb = sel_ref[row0 : row0 + nr, :].astype(jnp.bfloat16)
            pieces.append(gather3(src[:, w0 : w0 + w], selb))
        return jnp.concatenate(pieces, axis=1)  # [nrow, A]

    prev = cost_ref[...]  # [B, S]
    tau = tau_ref[...] if emit_lattice else None
    nf_c = nf_ref[...]  # [B, 1]
    inf_bs = jnp.full((b, s_w), POS_INF, jnp.float32)
    expand_bf = expand_ref[...].astype(jnp.bfloat16)  # [a_pad, U128]
    iota_a = jax.lax.broadcasted_iota(
        jnp.int32, (1, a_pad), 1).astype(jnp.float32)

    for k in range(frames_per_step):
        t_abs = ti * frames_per_step + k
        # factored emission: [B, U128] per offset j -> [B, a_pad].  The
        # su offset planes stack on the ROW axis so ONE gather3 serves
        # all of them — MXU dots are row-starved at serving batches
        # (B=16 of 128 systolic rows), so su x more rows per dot is
        # su x better MXU utilization at identical MACs.
        nll_k = nll_ref[k]  # [su, B, U128]
        if su > 1:
            stacked = gather3(nll_k.reshape(su * b, u128), expand_bf)
            emis = jnp.concatenate([stacked[j * b : (j + 1) * b]
                                    for j in range(su)], axis=1)
        else:
            emis = gather3(nll_k[0], expand_bf)

        # band relaxation: lane shifts by whole 128-multiples
        c0 = band_ref[0:1, :] + prev
        c1 = band_ref[1:2, :] + shift_lanes(prev, a_pad)
        c2 = band_ref[2:3, :] + shift_lanes(prev, 2 * a_pad)
        best = jnp.minimum(jnp.minimum(c0, c1), c2)
        dsel = jnp.where(best == c2, jnp.float32(2),
                         jnp.where(best == c1, jnp.float32(1),
                                   jnp.float32(0)))
        # no clamp: the post-emission min clamps, and min(x + e, POS_INF)
        # == min(min(x, POS_INF) + e, POS_INF) bitwise for real costs
        base = best
        if emit_lattice:
            # entry-time carry follows the band decision (0-filled
            # wrap lanes only matter where the cost is POS_INF)
            tau_prev_f = tau
            tau_b = jnp.where(dsel == jnp.float32(1),
                              shift_lanes(tau, a_pad, 0.0), tau)
            tau_b = jnp.where(dsel == jnp.float32(2),
                              shift_lanes(tau, 2 * a_pad, 0.0), tau_b)

        # cross edges: block-banded staircase gathers of the end slice.
        # In lattice mode the cost AND entry-time planes stack on the
        # row axis so ONE staircase pass serves both carries — the
        # tau gather was doubling the kernel's dominant (row-starved)
        # MXU term.
        ends_prev = prev[:, end_lo:]  # [B, A]
        tau_gA = None
        if topo.sel_blocks and emit_lattice:
            both = gather_ends_wide(
                jnp.concatenate([ends_prev, tau[:, end_lo:]], axis=0),
                POS_INF, 0.0)  # [2B, A]
            gath, tau_gA = both[:b], both[b:]
            cand_start = jnp.minimum(gath + cc_ref[...], POS_INF)
        elif topo.sel_blocks:
            gath = gather_ends_wide(ends_prev, POS_INF)
            cand_start = jnp.minimum(gath + cc_ref[...], POS_INF)
        else:  # flat vocabulary: no cross edges at all
            cand_start = jnp.full((b, a_pad), POS_INF, jnp.float32)
        if su > 1:
            cand_cross = jnp.concatenate(
                [cand_start, jnp.full((b, end_lo), POS_INF, jnp.float32)],
                axis=1)
        else:
            cand_cross = cand_start
        take = cand_cross <= base
        base = jnp.where(take, cand_cross, base)
        dsel = jnp.where(take, jnp.float32(_CROSS), dsel)
        if emit_lattice:
            tau_g = (tau_gA if tau_gA is not None
                     else jnp.zeros((b, a_pad), jnp.float32))
            if su > 1:
                tau_g = jnp.concatenate(
                    [tau_g, jnp.zeros((b, end_lo), jnp.float32)], axis=1)
            tau_b = jnp.where(take, tau_g, tau_b)

        if k == 0:
            is0 = ti == 0
            init_b = init_ref[0:1, :] + jnp.zeros((b, s_w), jnp.float32)
            base = jnp.where(is0, init_b, base)
            dsel = jnp.where(is0, jnp.float32(0), dsel)
            prev = jnp.where(is0, inf_bs, prev)
            if emit_lattice:
                tau_b = jnp.where(is0, jnp.float32(0), tau_b)
                tau_prev_f = jnp.where(is0, jnp.float32(0), tau_prev_f)

        cost = jnp.minimum(base + emis, POS_INF)
        bp = dsel

        # eps re-entry + eps_prev side plane (lattice mode stamps the
        # current frame into tau instead and records no predecessors)
        end_vals = cost[:, end_lo:]  # [B, A]
        big = jnp.float32(topo.n_leaves + 1)
        lid = lid_ref[0:1, :]  # [1, A]
        if not emit_lattice:
            combo = (jnp.float32(end_lo) + iota_a
                     - dsel[:, end_lo:] * jnp.float32(a_pad))  # [B, A]
        if topo.eps_rowconst:
            masked = jnp.where(lid < jnp.float32(topo.n_leaves),
                               end_vals, POS_INF)
            m = jnp.min(masked, axis=1, keepdims=True)  # [B, 1]
            eps_min = jnp.minimum(rows_ref[0:1, :] + m, POS_INF)  # [B, lv0]
            if not emit_lattice:
                ids = jnp.where(masked == m, lid, big)
                u = jnp.min(ids, axis=1, keepdims=True)  # [B, 1]
                eps_arg = u + jnp.zeros((b, lv0), jnp.float32)
                pv = jnp.sum(combo * (lid == u).astype(jnp.float32),
                             axis=1, keepdims=True)  # [B, 1]
                eps_prev = pv + jnp.zeros((b, lv0), jnp.float32)
        else:
            mins, args, prevs = [], [], []
            for ri in range(r):
                sc = jnp.minimum(eps_ref[ri : ri + 1, :] + end_vals, POS_INF)
                m = jnp.min(sc, axis=1, keepdims=True)  # [B, 1]
                mins.append(m)
                if not emit_lattice:
                    ids = jnp.where(sc == m, lid, big)
                    arg = jnp.min(ids, axis=1, keepdims=True)
                    args.append(arg)
                    prevs.append(jnp.sum(
                        combo * (lid == arg).astype(jnp.float32),
                        axis=1, keepdims=True))
            pad_c = lv0 - r
            if pad_c:
                mins.append(jnp.full((b, pad_c), POS_INF, jnp.float32))
                if not emit_lattice:
                    args.append(jnp.zeros((b, pad_c), jnp.float32))
                    prevs.append(jnp.zeros((b, pad_c), jnp.float32))
            eps_min = jnp.concatenate(mins, axis=1)  # [B, lv0]
            if not emit_lattice:
                eps_arg = jnp.concatenate(args, axis=1)
                eps_prev = jnp.concatenate(prevs, axis=1)
        cand_re = jnp.minimum(eps_min + emis[:, :lv0], POS_INF)
        head = cost[:, :lv0]
        better = cand_re < head
        cost = jnp.concatenate(
            [jnp.where(better, cand_re, head), cost[:, lv0:]], axis=1)
        if emit_lattice:
            t_abs_f = (t_abs * jnp.ones((), jnp.int32)).astype(jnp.float32)
            tau_new = jnp.concatenate(
                [jnp.where(better, t_abs_f, tau_b[:, :lv0]),
                 tau_b[:, lv0:]], axis=1)
        else:
            bp = jnp.concatenate(
                [jnp.where(better, jnp.float32(_EPS), bp[:, :lv0]),
                 bp[:, lv0:]], axis=1)
            side = jnp.where(better, eps_arg, jnp.float32(0))
            side_prev = jnp.where(better, eps_prev, jnp.float32(0))

        # freeze-trick final (see _lex_kernel): the end-of-grid carry
        # IS the final plane; written once on the last grid step
        cost = jnp.where(t_abs < nf_c, cost, prev)
        if emit_lattice:
            tau = jnp.where(t_abs < nf_c, tau_new, tau_prev_f)
            endc_ref[k] = cost[:, end_lo:]
            endt_ref[k] = tau[:, end_lo:].astype(jnp.int32)
        else:
            bp_ref[k] = bp.astype(jnp.int8)
            epsu_ref[k] = side.astype(jnp.int32)
            epsp_ref[k] = side_prev.astype(jnp.int32)
        prev = cost

    cost_ref[...] = prev
    if emit_lattice:
        tau_ref[...] = tau

    @pl.when(ti == num_steps - 1)
    def _write_final():
        final_ref[...] = prev


@functools.partial(jax.jit, static_argnames=("topo", "interpret",
                                             "frames_per_step"))
def viterbi_lex_pallas_wide(nll_tub, plan: LexPlan, n_frames, topo: LexTopo,
                            interpret: bool = False,
                            frames_per_step: int = 2):
    """Lane-major lex Viterbi for huge graphs (``layout='wide'`` plans).

    ``nll_tub [T, U, B]`` -> ``(final [B, S_soa], bp8 [T, B, S_soa],
    eps_u [T, B, lv0], eps_prev [T, B, lv0])``; decode with
    :func:`lex_backtrace_wide`."""
    if not topo.lane_major:
        raise ValueError("plan was not built with layout='wide'")
    t_len, u_in, b_in = nll_tub.shape
    # the kernel's row-stacked emission gather slices rows at multiples
    # of b, which Mosaic's concatenate requires 8-aligned (round-5
    # finding; a b=4 call compiled fine before the round-4 row-stacking
    # landed) — pad small batches to 8 with inert length-1 streams
    b = (b_in + 7) // 8 * 8
    if b != b_in:
        nll_tub = jnp.pad(nll_tub, ((0, 0), (0, 0), (0, b - b_in)))
        n_frames = jnp.pad(jnp.asarray(n_frames), (0, b - b_in),
                           constant_values=1)
    su, a_pad = topo.su, topo.a_pad
    s_w = su * a_pad
    lv0 = topo.level_sizes[0]
    u128 = topo.n_units_pad
    k = frames_per_step
    t8 = (t_len + k - 1) // k * k
    # [T, U, B] -> [T, su, B, U128] (unit-major lanes, batch sublanes)
    n_u_in = u_in // su
    nll_u = nll_tub[:, : n_u_in * su].reshape(t_len, n_u_in, su, b)
    nll_u = jnp.transpose(nll_u, (0, 2, 3, 1))  # [T, su, B, U_in]
    if n_u_in > u128:
        nll_u = nll_u[..., :u128]
    elif n_u_in < u128:
        nll_u = jnp.pad(nll_u, ((0, 0), (0, 0), (0, 0), (0, u128 - n_u_in)))
    if t8 != t_len:
        nll_u = jnp.pad(nll_u, ((0, t8 - t_len), (0, 0), (0, 0), (0, 0)))
    nf_col = n_frames.astype(jnp.int32)[:, None]

    kernel = functools.partial(_lex_kernel_wide, topo=topo,
                               frames_per_step=k, num_steps=t8 // k)
    const = lambda *_: (0, 0)
    sel_specs = [pl.BlockSpec(s.shape, const, memory_space=pltpu.VMEM)
                 for s in plan.sels]
    outs = pl.pallas_call(
        kernel,
        grid=(t8 // k,),
        in_specs=[
            pl.BlockSpec((k, su, b, u128), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(plan.expand.shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, s_w), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, a_pad), const, memory_space=pltpu.VMEM),
            pl.BlockSpec(plan.eps_exit.shape, const,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, lv0), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, a_pad), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_w), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), const, memory_space=pltpu.VMEM),
        ] + sel_specs,
        out_specs=[
            pl.BlockSpec((b, s_w), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, b, s_w), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, b, lv0), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, b, lv0), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, s_w), jnp.float32),
            jax.ShapeDtypeStruct((t8, b, s_w), jnp.int8),
            jax.ShapeDtypeStruct((t8, b, lv0), jnp.int32),
            jax.ShapeDtypeStruct((t8, b, lv0), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((b, s_w), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=127 * 2**20),
        interpret=interpret,
    )(nll_u, plan.expand, plan.band_soa, plan.cross_cost, plan.eps_exit,
      plan.eps_rows, plan.leaf_id, plan.init_soa, nf_col, *plan.sels)
    final, bp8, eps_u, eps_prev = outs
    return (final[:b_in], bp8[:t_len, :b_in], eps_u[:t_len, :b_in],
            eps_prev[:t_len, :b_in])


@functools.partial(jax.jit, static_argnames=("topo", "interpret",
                                             "frames_per_step"))
def viterbi_lex_pallas_wide_lattice(nll_tub, plan: LexPlan, n_frames,
                                    topo: LexTopo, interpret: bool = False,
                                    frames_per_step: int = 2):
    """Lattice-generation variant of :func:`viterbi_lex_pallas_wide`:
    the lane-major kernel carries an entry-time plane and streams out
    per-frame end-slice costs + entry times (no backpointer planes —
    pass-2 rescoring replaces the backtrace).  Returns
    ``(ends_cost [T, L, B], ends_tau [T, L, B] int32)`` in LEAF-SLOT
    order, matching :func:`ops.lattice.viterbi_lattice_tb` — the
    reference-dictionary-scale half of the bigram north star
    (``/root/reference/sr/langmodel/langmodel.py:1`` +
    ``/root/reference/tests/test_data/dict1.txt``)."""
    if not topo.lane_major:
        raise ValueError("plan was not built with layout='wide'")
    t_len, u_in, b_in = nll_tub.shape
    # pad small batches to a sublane multiple (see
    # viterbi_lex_pallas_wide: the row-stacked emission gather needs
    # 8-aligned row slices)
    b = (b_in + 7) // 8 * 8
    if b != b_in:
        nll_tub = jnp.pad(nll_tub, ((0, 0), (0, 0), (0, b - b_in)))
        n_frames = jnp.pad(jnp.asarray(n_frames), (0, b - b_in),
                           constant_values=1)
    su, a_pad = topo.su, topo.a_pad
    s_w = su * a_pad
    u128 = topo.n_units_pad
    k = frames_per_step
    t8 = (t_len + k - 1) // k * k
    n_u_in = u_in // su
    nll_u = nll_tub[:, : n_u_in * su].reshape(t_len, n_u_in, su, b)
    nll_u = jnp.transpose(nll_u, (0, 2, 3, 1))  # [T, su, B, U_in]
    if n_u_in > u128:
        nll_u = nll_u[..., :u128]
    elif n_u_in < u128:
        nll_u = jnp.pad(nll_u, ((0, 0), (0, 0), (0, 0), (0, u128 - n_u_in)))
    if t8 != t_len:
        nll_u = jnp.pad(nll_u, ((0, t8 - t_len), (0, 0), (0, 0), (0, 0)))
    nf_col = n_frames.astype(jnp.int32)[:, None]

    kernel = functools.partial(_lex_kernel_wide, topo=topo,
                               frames_per_step=k, emit_lattice=True,
                               num_steps=t8 // k)
    const = lambda *_: (0, 0)
    sel_specs = [pl.BlockSpec(s.shape, const, memory_space=pltpu.VMEM)
                 for s in plan.sels]
    final, endc, endt = pl.pallas_call(
        kernel,
        grid=(t8 // k,),
        in_specs=[
            pl.BlockSpec((k, su, b, u128), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(plan.expand.shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, s_w), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, a_pad), const, memory_space=pltpu.VMEM),
            pl.BlockSpec(plan.eps_exit.shape, const,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, topo.level_sizes[0]), const,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, a_pad), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_w), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), const, memory_space=pltpu.VMEM),
        ] + sel_specs,
        out_specs=[
            pl.BlockSpec((b, s_w), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, b, a_pad), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, b, a_pad), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, s_w), jnp.float32),
            jax.ShapeDtypeStruct((t8, b, a_pad), jnp.float32),
            jax.ShapeDtypeStruct((t8, b, a_pad), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((b, s_w), jnp.float32),
                        pltpu.VMEM((b, s_w), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=127 * 2**20),
        interpret=interpret,
    )(nll_u, plan.expand, plan.band_soa, plan.cross_cost, plan.eps_exit,
      plan.eps_rows, plan.leaf_id, plan.init_soa, nf_col, *plan.sels)
    # end-slice arc lanes -> leaf-slot order: gather the (small) leaf
    # subset FIRST ([T, B, L] written once), then transpose to [T, L, B]
    leaf_cols = plan.ends_soa - (su - 1) * a_pad  # [L] arc positions
    ends_cost = jnp.transpose(endc[:t_len, :b_in, leaf_cols], (0, 2, 1))
    ends_tau = jnp.transpose(endt[:t_len, :b_in, leaf_cols], (0, 2, 1))
    return ends_cost, ends_tau


def _lex_bt_wide_kernel(bp_ref, epsp_ref, cross_ref, endv_ref, nf_ref,
                        out_ref, st_ref, *, t_len: int, a_pad: int,
                        frames_per_step: int):
    """Wide-layout value backtrace: the state rides as a [B, 1] column,
    lookups are lane-iota compares + lane reductions."""
    i = pl.program_id(0)
    n_blk = pl.num_programs(0)
    b, s_w = bp_ref.shape[1], bp_ref.shape[2]
    lv0 = epsp_ref.shape[2]

    iota_s = jax.lax.broadcasted_iota(
        jnp.int32, (1, s_w), 1).astype(jnp.float32)
    iota_r = jax.lax.broadcasted_iota(
        jnp.int32, (1, lv0), 1).astype(jnp.float32)
    nf = nf_ref[...].astype(jnp.float32)  # [B, 1]
    st = st_ref[...]  # [B, 1]

    for kk in range(frames_per_step - 1, -1, -1):
        t = (n_blk - 1 - i) * frames_per_step + kk
        st = jnp.where(t == t_len - 1, endv_ref[...], st)
        rec = st
        comb = (bp_ref[kk].astype(jnp.float32)
                + cross_ref[0:1, :] * jnp.float32(8))  # [B, S]
        v = jnp.sum(comb * (iota_s == st).astype(jnp.float32),
                    axis=1, keepdims=True)  # [B, 1]
        src = jnp.floor(v * jnp.float32(0.125))
        code = v - src * jnp.float32(8)
        m = (code == jnp.float32(_EPS)).astype(jnp.float32)
        pprev = jnp.sum(epsp_ref[kk].astype(jnp.float32)
                        * (iota_r == st).astype(jnp.float32),
                        axis=1, keepdims=True)
        band_prev = st - jnp.minimum(code, jnp.float32(MAX_BAND)) * a_pad
        rest_p = jnp.where(code == jnp.float32(_CROSS), src, band_prev)
        prev = pprev * m + rest_p * (1.0 - m)
        act = (jnp.where(t > 0, 1.0, 0.0) * (t < nf).astype(jnp.float32)
               * jnp.where(t <= t_len - 1, 1.0, 0.0))
        st = prev * act + rec * (1.0 - act)
        out_ref[kk] = jnp.concatenate(
            [rec, m * (t < nf).astype(jnp.float32),
             jnp.zeros((b, 126), jnp.float32)], axis=1)

    st_ref[...] = st


@functools.partial(jax.jit, static_argnames=("topo", "interpret"))
def lex_backtrace_wide(bp8, eps_u, eps_prev, plan: LexPlan, end_state_soa,
                       n_frames, topo: LexTopo, interpret: bool = False):
    """Value backtrace for the wide kernel: ``bp8 [T, B, S]``,
    ``eps_prev [T, B, lv0]``, ``end_state_soa [B]`` ->
    ``(states_soa [T, B] int32, eps_entered [T, B] bool)``."""
    t_len, b, s_w = bp8.shape
    cross_row = plan.cross_src_soa.astype(jnp.float32)[None, :]  # [1, S]
    endv = end_state_soa.astype(jnp.float32)[:, None]  # [B, 1]
    nf_col = n_frames.astype(jnp.int32)[:, None]
    k = max(1, min(8, (24 * 2**20) // max(s_w * b, 1)))
    t8 = _ceil(t_len, k)
    if t8 != t_len:
        bp8 = jnp.pad(bp8, ((0, t8 - t_len), (0, 0), (0, 0)))
        eps_prev = jnp.pad(eps_prev, ((0, t8 - t_len), (0, 0), (0, 0)))
    n_blk = t8 // k
    kernel = functools.partial(_lex_bt_wide_kernel, t_len=t_len,
                               a_pad=topo.a_pad, frames_per_step=k)
    const = lambda *_: (0, 0)
    rev = lambda i: (n_blk - 1 - i, 0, 0)
    outs = pl.pallas_call(
        kernel,
        grid=(n_blk,),
        in_specs=[
            pl.BlockSpec((k, b, s_w), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, b, topo.level_sizes[0]), rev,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_w), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), const, memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((k, b, 128), rev, memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((t8, b, 128), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((b, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(bp8, eps_prev, cross_row, endv, nf_col)
    out = outs[0][:t_len]
    return out[:, :, 0].astype(jnp.int32), out[:, :, 1] > 0.5


def _lex_bt_val_kernel(bp_ref, epsp_ref, cross_ref, endv_ref, nf_ref,
                       out_ref, st_ref, *, t_len: int, a_pad: int,
                       frames_per_step: int):
    """Single-lookup reverse walk: band/cross codes and the cross source
    are packed into ONE combo plane (code + src * 8, exact in f32 up to
    2^24 rows), and the eps unwind reads the post-unwind predecessor
    from the forward kernel's eps_prev side plane — one full-plane
    lookup per frame total (vs two in :func:`_lex_bt_kernel`)."""
    i = pl.program_id(0)
    n_blk = pl.num_programs(0)
    s8, b = bp_ref.shape[1], endv_ref.shape[1]
    r8 = epsp_ref.shape[1]

    iota_s = jax.lax.broadcasted_iota(jnp.int32, (s8, 1), 0).astype(jnp.float32)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (r8, 1), 0).astype(jnp.float32)
    nf = nf_ref[...].astype(jnp.float32)  # [1, B]
    st = st_ref[...]  # [1, B]

    for kk in range(frames_per_step - 1, -1, -1):
        t = (n_blk - 1 - i) * frames_per_step + kk
        st = jnp.where(t == t_len - 1, endv_ref[...], st)
        rec = st
        comb = (bp_ref[kk].astype(jnp.float32)
                + cross_ref[...] * jnp.float32(8))  # [S8, B]
        v = jnp.sum(comb * (iota_s == st).astype(jnp.float32),
                    axis=0, keepdims=True)  # [1, B]
        src = jnp.floor(v * jnp.float32(0.125))
        code = v - src * jnp.float32(8)
        m = (code == jnp.float32(_EPS)).astype(jnp.float32)
        # eps-recorded states are root rows [0, R): slot == row value
        pprev = jnp.sum(epsp_ref[kk].astype(jnp.float32)
                        * (iota_r == st).astype(jnp.float32),
                        axis=0, keepdims=True)
        band_prev = st - jnp.minimum(code, jnp.float32(MAX_BAND)) * a_pad
        rest = jnp.where(code == jnp.float32(_CROSS), src, band_prev)
        prev = pprev * m + rest * (1.0 - m)
        act = (jnp.where(t > 0, 1.0, 0.0) * (t < nf).astype(jnp.float32)
               * jnp.where(t <= t_len - 1, 1.0, 0.0))
        st = prev * act + rec * (1.0 - act)
        out_ref[kk] = jnp.concatenate(
            [rec, m * (t < nf).astype(jnp.float32),
             jnp.zeros((6, b), jnp.float32)], axis=0)

    st_ref[...] = st


@functools.partial(jax.jit, static_argnames=("topo", "interpret"))
def lex_backtrace_soa_pallas(bp8, eps_u, plan: LexPlan, end_state_soa,
                             n_frames, topo: LexTopo,
                             interpret: bool = False, eps_prev=None):
    """Pallas twin of :func:`lex_backtrace_soa`: blocked reverse grid,
    value-carried states, bit-identical output (asserted in tests).
    With ``eps_prev`` (from ``viterbi_lex_pallas(emit_eps_prev=True)``)
    the walk needs ONE full-plane lookup per frame instead of two."""
    t_len, s_soa, b = bp8.shape
    r8 = eps_u.shape[1]
    l8 = _ceil8(topo.n_leaves)
    if eps_prev is not None:
        cross_col = plan.cross_src_soa.astype(jnp.float32)[:, None]
        cross_full = jnp.concatenate(
            [cross_col, jnp.zeros((s_soa - topo.a_pad, 1), jnp.float32)],
            axis=0)
        endv = end_state_soa.astype(jnp.float32)[None, :]
        nf_row = n_frames.astype(jnp.int32)[None, :]
        # block size bounded by the double-buffered bp window
        k = max(1, min(8, (24 * 2**20) // max(s_soa * b, 1)))
        t8 = _ceil(t_len, k)
        if t8 != t_len:
            bp8 = jnp.pad(bp8, ((0, t8 - t_len), (0, 0), (0, 0)))
            eps_prev = jnp.pad(eps_prev, ((0, t8 - t_len), (0, 0), (0, 0)))
        elif eps_prev.shape[0] != t8:
            eps_prev = jnp.pad(eps_prev,
                               ((0, t8 - eps_prev.shape[0]), (0, 0), (0, 0)))
        n_blk = t8 // k
        kernel = functools.partial(_lex_bt_val_kernel, t_len=t_len,
                                   a_pad=topo.a_pad, frames_per_step=k)
        const = lambda *_: (0, 0)
        rev = lambda i: (n_blk - 1 - i, 0, 0)
        outs = pl.pallas_call(
            kernel,
            grid=(n_blk,),
            in_specs=[
                pl.BlockSpec((k, s_soa, b), rev, memory_space=pltpu.VMEM),
                pl.BlockSpec((k, r8, b), rev, memory_space=pltpu.VMEM),
                pl.BlockSpec((s_soa, 1), const, memory_space=pltpu.VMEM),
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
        )(bp8, eps_prev, cross_full, endv, nf_row)
        out = outs[0][:t_len]
        return out[:, 0, :].astype(jnp.int32), out[:, 1, :] > 0.5
    ends_col = jnp.zeros((l8, 1), jnp.float32).at[: topo.n_leaves, 0].set(
        plan.ends_soa.astype(jnp.float32))
    cross_col = plan.cross_src_soa.astype(jnp.float32)[:, None]  # [A, 1]
    cross_full = jnp.concatenate(
        [cross_col, jnp.zeros((s_soa - topo.a_pad, 1), jnp.float32)], axis=0)
    endv = end_state_soa.astype(jnp.float32)[None, :]
    nf_row = n_frames.astype(jnp.int32)[None, :]

    k = 8
    t8 = _ceil8(t_len)
    if t8 != t_len:
        bp8 = jnp.pad(bp8, ((0, t8 - t_len), (0, 0), (0, 0)))
        eps_u = jnp.pad(eps_u, ((0, t8 - t_len), (0, 0), (0, 0)))
    n_blk = t8 // k

    kernel = functools.partial(_lex_bt_kernel, t_len=t_len,
                               a_pad=topo.a_pad, frames_per_step=k)
    const = lambda *_: (0, 0)
    rev = lambda i: (n_blk - 1 - i, 0, 0)
    outs = pl.pallas_call(
        kernel,
        grid=(n_blk,),
        in_specs=[
            pl.BlockSpec((k, s_soa, b), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, r8, b), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((s_soa, 1), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((l8, 1), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b), const, memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((k, 8, b), rev, memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((t8, 8, b), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((1, b), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(bp8, eps_u, endv, cross_full, ends_col, nf_row)
    out = outs[0][:t_len]
    return out[:, 0, :].astype(jnp.int32), out[:, 1, :] > 0.5


@functools.partial(jax.jit, static_argnames=("topo", "unroll"))
def lex_backtrace_soa(bp8, eps_u, plan: LexPlan, end_state_soa, n_frames,
                      topo: LexTopo, unroll: int = 1):
    """SoA twin of :func:`ops.viterbi_banded.banded_backtrace_tb`:
    band codes step by ``a_pad`` rows, cross codes follow the SoA
    parent map, eps codes re-enter via the preorder-leaf side plane.
    ``bp8 [T, S_soa, B]``, ``end_state_soa [B]`` ->
    ``(states_soa [T, B], eps_entered [T, B])``."""
    t_len, s_soa, b = bp8.shape
    a_pad = topo.a_pad

    def take(plane, idx):
        return jnp.take_along_axis(plane, idx[None, :], axis=0)[0]

    def step(carry, t):
        rec = carry
        st = carry
        plane = bp8[t]
        code = take(plane, st).astype(jnp.int32)
        is_eps = code == _EPS
        # root rows [0, R): the re-entry slot index IS the row
        u = take(eps_u[t], jnp.minimum(st, eps_u.shape[1] - 1))
        st = jnp.where(is_eps, plan.ends_soa[jnp.clip(u, 0,
                                                      topo.n_leaves - 1)], st)
        code = jnp.where(is_eps, take(plane, st).astype(jnp.int32), code)
        prev = jnp.where(code == _CROSS, plan.cross_src_soa[st],
                         st - jnp.minimum(code, MAX_BAND) * a_pad)
        active = (t > 0) & (t < n_frames)
        return jnp.where(active, prev, rec), (rec, is_eps & (t < n_frames))

    ts = jnp.arange(t_len - 1, -1, -1)
    _, (states_rev, eps_rev) = jax.lax.scan(
        step, end_state_soa.astype(jnp.int32), ts, unroll=unroll)
    return states_rev[::-1], eps_rev[::-1]
