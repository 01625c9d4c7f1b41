"""Speed-of-light accounting for the hot kernels.

BASELINE.md asks for "speed-of-light per chip" on the decode-path
kernels; RESULTS.md round 1 had measured times but no bytes/FLOPs
model, so nobody could say whether 6 ms was 15% or 85% of the bound.
This module prices each stage of the connected decode against the
TPU v5e's published peaks and an explicit op count read off the kernel
structure, so every measured number can carry a % -of-bound.

Peaks (1 chip):
* MXU: 197 TFLOP/s bf16 (v5e datasheet).  The exact one-hot selects
  run at ``Precision.HIGHEST`` = the 6-pass bf16 decomposition, so an
  f32-exact matmul costs 6x its nominal FLOPs in bf16 passes.
* HBM: 819 GB/s.
* VPU: modeled at 8 sublanes x 128 lanes x 4 ALUs x 0.94 GHz
  ~= 3.85 Top/s f32 (not published; derived from the core layout — the
  VPU numbers below are estimates and labeled as such).

The model is deliberately *optimistic* (no overlap penalties, perfect
fusion): "100%" means the hardware could not do the counted work any
faster, so measured/bound is a true upper bound on efficiency.
"""

from __future__ import annotations

from typing import Dict

MXU_BF16 = 197e12  # FLOP/s
HBM = 819e9  # B/s
VPU = 3.85e12  # op/s (estimate, see module docstring)
HIGHEST_PASSES = 6  # f32-exact matmul = 6 bf16 MXU passes


def _ceil8(x):
    return (x + 7) // 8 * 8


def stage_bound(flops_bf16=0.0, hbm_bytes=0.0, vpu_ops=0.0) -> Dict:
    """Time lower bound for one stage: each resource priced at peak,
    stage time >= max over resources."""
    t = {
        "mxu_s": flops_bf16 / MXU_BF16,
        "hbm_s": hbm_bytes / HBM,
        "vpu_s": vpu_ops / VPU,
    }
    t["bound_s"] = max(t.values())
    t["limiter"] = max(("mxu_s", "hbm_s", "vpu_s"), key=lambda k: t[k])[:3]
    return t


def emission_gemm(batch, frames, n_bank_states, n_mix, dim) -> Dict:
    """Quadratic-form GMM emission GEMM: [B·T, D+2] x [D+2, NS·M] at
    HIGHEST, plus the logsumexp over mixtures and the HBM traffic for
    features in / bank-NLL out."""
    bt = batch * frames
    nsm = n_bank_states * n_mix
    flops = 2.0 * bt * (dim + 2) * nsm * HIGHEST_PASSES
    read = bt * dim * 4.0
    write = bt * n_bank_states * 4.0
    lse_ops = bt * nsm * 6.0  # exp/max/sum/log chain over mixtures
    return stage_bound(flops, read + write, lse_ops)


def banded_viterbi(batch, frames, n_graph_states, n_bank_states,
                   n_starts, n_ends, eps_terms=None, bank_mode=True,
                   uniform_w=0) -> Dict:
    """Per-frame work of the Pallas banded kernel (state-major [S, B]):

    * band relaxation: 3 offsets x (roll + add + cmp + 2 selects) plus
      emission add/clamp and length masking ~= 24 elem-ops on [S8, B];
    * epsilon block: with ``uniform_w`` the arc extraction/scatter is
      reshape views + broadcasts (VPU only) and the ONLY remaining MXU
      select is the bank expansion; otherwise one-hot MXU selects
      (expand [S8, SB8], end-gather [L8, S8], start-emis [R8, SB8], two
      scatters [S8, R8]); either way the per-block min chain costs ~4
      ops per finite (r, u) term;
    * HBM: emission block in, int8 bp plane + eps side plane out
      (frontier stays in VMEM — zero carry traffic).
    """
    r8 = _ceil8(n_starts)
    l8 = _ceil8(n_ends)
    if uniform_w:
        s8 = r8 * _ceil8(uniform_w)  # words padded to 8 states
    else:
        s8 = _ceil8(n_graph_states)
    sb8 = _ceil8(n_bank_states) if bank_mode else s8
    b = batch
    if eps_terms is None:
        eps_terms = n_starts * n_ends  # dense block worst case
    per_frame_mxu = 2.0 * b * s8 * sb8 * HIGHEST_PASSES  # bank expand
    if not uniform_w:
        per_frame_mxu += 2.0 * b * (l8 * s8  # end gather
                                    + r8 * sb8  # start emissions
                                    + 2 * s8 * r8  # cand+better scatters
                                    ) * HIGHEST_PASSES
    per_frame_vpu = b * (24.0 * s8 + 4.0 * eps_terms + 8.0 * r8)
    per_frame_hbm = b * (sb8 * 4.0 + s8 * 1.0 + r8 * 4.0)
    return stage_bound(frames * per_frame_mxu, frames * per_frame_hbm,
                       frames * per_frame_vpu)


def banded_backtrace(batch, frames, n_graph_states, n_starts, n_ends,
                     uniform_w=0) -> Dict:
    """One-hot backtrace: per frame one [S8, B] plane read (int8) +
    eps plane, multiply-reduce for the code, 3 masked rolls, and —
    only on irregular graphs — an eps one-hot matmul pair (uniform
    graphs use slot arithmetic instead)."""
    r8 = _ceil8(n_starts)
    l8 = _ceil8(n_ends)
    if uniform_w:
        s8 = r8 * _ceil8(uniform_w)
    else:
        s8 = _ceil8(n_graph_states)
    b = batch
    per_frame_hbm = b * (s8 * 1.0 + r8 * 4.0)
    per_frame_mxu = 0.0 if uniform_w else (
        2.0 * b * (s8 * l8 + r8 * s8) * HIGHEST_PASSES)
    per_frame_vpu = b * (12.0 * s8)
    return stage_bound(frames * per_frame_mxu, frames * per_frame_hbm,
                       frames * per_frame_vpu)


def lex_viterbi(batch, frames, n_arcs_pad, su, n_bank_states,
                level_sizes, n_roots, sel_blocks=(), sel_w=0,
                n_units_pad=0, lattice=False) -> Dict:
    """Per-frame work of the Pallas lexical-tree kernel
    (``ops/viterbi_lex_pallas.py``, SoA [su*A, B] layout):

    * bank expansion: one bf16 pass over [su*A, 3*U8];
    * band: 3 offsets x (roll + add + cmp + 2 selects) on [su*A, B];
    * cross edges: one bf16 pass per trie level,
      sum(3 * n_{d+1} * n_d) MACs, plus the split/concat traffic;
    * eps (row-constant): masked min + leaf-id argmin over [A, B];
    * HBM: compact bank block in, int8 bp plane + side plane out.
    """
    s8 = su * n_arcs_pad
    u8 = _ceil8(n_bank_states)
    b = batch
    # both selector formats move 3 bf16 value planes through the MXU
    # (tripled contraction or three separate dots) — same MAC count.
    # Banded-staircase plans (dictionary scale) do sum(nr_i * sel_w)
    # MACs instead of the level-dense sum(n_d * n_{d+1}) — pass
    # (sel_blocks, sel_w) so the bound prices the plan actually run.
    if sel_blocks:
        cross_macs = 3.0 * sum(nr for (_, nr, _) in sel_blocks) * sel_w
    else:
        cross_macs = 3.0 * sum(a * c for a, c in zip(level_sizes[:-1],
                                                     level_sizes[1:]))
    if lattice:
        cross_macs *= 2.0  # the entry-time carry rides the same gathers
    if n_units_pad:
        # factored expansion: per-offset unit one-hots on [A, U128]
        expand_macs = 3.0 * s8 * n_units_pad
    else:
        expand_macs = s8 * 3 * u8
    per_frame_mxu = 2.0 * b * (expand_macs + cross_macs)  # one bf16 pass
    # NOTE: this MAC bound assumes full 128-row MXU occupancy; at
    # serving batches the dots are row-starved (B or su*B rows), so
    # measured/bound gaps here are utilization, addressable by batching
    # — see the row-stacking notes in ops/viterbi_lex_pallas.py.
    per_frame_vpu = b * (24.0 * s8  # band chain
                         + 10.0 * n_arcs_pad  # eps min/argmin + cross merge
                         + 12.0 * n_arcs_pad)  # splits/concats (3 planes)
    per_frame_hbm = b * (u8 * 4.0 + s8 * 1.0 + _ceil8(n_roots) * 4.0)
    return stage_bound(frames * per_frame_mxu, frames * per_frame_hbm,
                       frames * per_frame_vpu)


def mfcc_frontend(batch, samples, n_fft=512, n_frames=None, n_mel=40,
                  n_ceps=13, dim39=39) -> Dict:
    """GEMM-native frontend: framing matmuls, DFT as two [T, F] x
    [F, NFFT/2+1] GEMMs, mel + DCT GEMMs, deltas/CMVN elementwise."""
    if n_frames is None:
        n_frames = samples // 160
    t = batch * n_frames
    f = 400  # window samples
    nb = n_fft // 2 + 1
    flops = 2.0 * t * f * nb * 2 * HIGHEST_PASSES  # cos+sin DFT GEMMs
    flops += 2.0 * t * nb * n_mel * HIGHEST_PASSES
    flops += 2.0 * t * n_mel * n_ceps * HIGHEST_PASSES
    hbm = batch * samples * 4.0 + t * dim39 * 4.0
    vpu = t * (nb * 6.0 + dim39 * 20.0)
    return stage_bound(flops, hbm, vpu)


def lex_wide_kernel(batch, frames, n_arcs_pad, su, n_units_pad,
                    sel_blocks, sel_w, lv0, lattice=False) -> Dict:
    """Per-frame work of the lane-major ("wide") lexical-tree kernel
    (``ops/viterbi_lex_pallas._lex_kernel_wide``), the dict1-scale
    production path.  Counted off the kernel body:

    * ~17 full-plane [B, S] VPU passes for the band chain / dsel /
      cross-take / emission add / freeze (plus ~6 more with the
      lattice tau carry), and ~8 [B, A] passes for the eps head;
    * MXU: factored emission expansion (3 bf16 passes over
      [su*B, U128] x [A, U128]) + the block-banded staircase cross
      gathers (3 passes, x2 rows when the lattice stacks cost+tau);
    * HBM: the compact [su, B, U128] emission block in; int8 bp +
      int32 side planes out (plain), or the f32+i32 end-slice
      cost/tau streams (lattice).

    NOTE: this kernel is VPU-bound and every counted term scales
    linearly in B — batch growth past the VMEM envelope (chunking)
    cannot change audio-s/s by more than the per-chunk fixed costs,
    which is why the dict1 bar is "within x of this bound", not a
    batch-scaling multiple (round-5 finding)."""
    s = su * n_arcs_pad
    full_passes = 17.0 + (6.0 if lattice else 0.0)
    vpu = frames * batch * (full_passes * s + 8.0 * n_arcs_pad)
    expand_macs = 3.0 * su * batch * n_units_pad * n_arcs_pad
    rows = 2 * batch if lattice else batch
    cross_macs = 3.0 * rows * sum(nr for (_, nr, _) in sel_blocks) * sel_w
    mxu = frames * 2.0 * (expand_macs + cross_macs)
    if lattice:
        out_bytes = 2.0 * n_arcs_pad * 4.0  # f32 end costs + i32 taus
    else:
        out_bytes = s * 1.0 + lv0 * 8.0  # int8 bp + two i32 side planes
    hbm = frames * batch * (su * n_units_pad * 4.0 + out_bytes)
    return stage_bound(mxu, hbm, vpu)


#: measured lane-gather throughput on this v5e (elements/s) — round-4
#: exp_take_micro: ~10 G elem/s in either orientation, independent of
#: transposes; the sliced-backoff takes are priced at this rate.
GATHER_ELEMS = 10e9


def lattice_rescore_stage(batch, frames, n_leaves_pad, nnz, dmax=128,
                          f_blk=8) -> Dict:
    """Per-frame work of the exact bigram lattice rescorer
    (``ops/lattice.lattice_rescore``, combined H-Q ring + sliced
    backoff):

    * ring lookup (the dominant term): each element needs ring[slot]
      at a per-element dynamic index along the D axis, which no TPU
      unit gathers — the in-VMEM Pallas compare-sweep costs
      dmax x (cmp + select) over every [B, L] output element per frame
      (2*dmax*B*L VPU ops; the XLA masked-sum form trades this for
      HBM-side ring materialization and loses in-scan, round-4
      finding).  Priced as VPU ops; the ring-bytes HBM term is kept
      (the XLA form's floor) but the VPU term binds at dict1 shapes.
    * sliced backoff: per frame the lane takes cover exactly the LM's
      nnz seen pairs + one [B, L] un-permute take, priced at the
      measured ~10 G elem/s gather rate (folded into the VPU term);
    * ~22 [B, L] VPU passes for recombine/min/select/ring-write.
    """
    ring_bytes = dmax * batch * n_leaves_pad * 4.0 / f_blk
    stream_bytes = batch * n_leaves_pad * (4.0 + 4.0)  # s0 + tau in
    vpu = frames * (batch * n_leaves_pad * (22.0 + 2.0 * dmax)
                    + batch * (nnz + n_leaves_pad) * (VPU / GATHER_ELEMS))
    return stage_bound(0.0, frames * (ring_bytes + stream_bytes), vpu)


def mfcc_fused(batch, samples, n_fft=512, n_frames=None, n_mel=40,
               n_ceps=13, mel_passes=3, dct_passes=3) -> Dict:
    """Fused Pallas spectral chain (``ops/frontend_pallas.py``), priced
    at the physical MXU tile layout it runs:

    * staged radix-4 DIF DFT at HIGHEST: y0 [N2, N2] + y2 [N2, N2] +
      y13 [2N2, 2N2] = 6*N2^2 MACs/frame (98.3k at 512-FFT — the dense
      NDFT is 205.6k), every contraction and output 128-aligned;
    * mel GEMM over the packed z plane: [4N2, 128-padded n_mel] at
      ``mel_passes`` (positive operands — HIGH suffices, measured
      5.7e-4 class);
    * DCT+lifter [n_mel-pad, 128] at ``dct_passes``;
    * VPU: pre-emphasis/framing/butterfly/squares/log/deltas/
      standardize, all VMEM-resident (~3.3k elem-ops per frame);
    * HBM: raw signal in, [3, F, n_ceps] features out — no
      intermediate ever leaves the chip.
    """
    if n_frames is None:
        n_frames = samples // 160
    t = batch * n_frames
    n2 = n_fft // 4
    mel_pad = ((n_mel + 127) // 128) * 128
    dft_macs = 6.0 * n2 * n2
    mel_macs = 4.0 * n2 * mel_pad
    dct_macs = mel_pad * 128.0
    flops = 2.0 * t * (dft_macs * HIGHEST_PASSES + mel_macs * mel_passes
                       + dct_macs * dct_passes)
    hbm = batch * samples * 4.0 + t * 3 * n_ceps * 4.0
    vpu = t * (n_fft * 4.0 + 160 * 5.0 + 3 * n2 * 2.0 + n_mel * 8.0
               + n_ceps * 40.0)
    return stage_bound(flops, hbm, vpu)


def report(stages: Dict[str, Dict], measured_s: float) -> str:
    """Human line: total bound, % of bound achieved, per-stage limits."""
    total = sum(s["bound_s"] for s in stages.values())
    pct = 100.0 * total / measured_s if measured_s > 0 else float("nan")
    parts = ", ".join(
        f"{k}: {v['bound_s']*1e3:.2f}ms@{v['limiter']}" for k, v in stages.items()
    )
    return (f"roofline: bound {total*1e3:.2f} ms vs measured "
            f"{measured_s*1e3:.2f} ms -> {pct:.0f}% of speed-of-light "
            f"({parts})")
