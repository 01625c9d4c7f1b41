"""Fused Pallas spectral-chain MFCC frontend — the production TPU path.

One kernel per utterance runs the ENTIRE feature chain VMEM-resident:

    signal blocks [NB, step] -> pre-emphasis -> framing -> window ->
    staged radix-4 GEMM FFT -> power -> mel -> log -> DCT+lifter ->
    deltas x2 -> per-utterance standardize -> [3, F, n_ceps]

Replaces the reference's two-stage feature path
(``/root/reference/sr/core.py:34-45`` ->
``python_speech_features.mfcc``, and the from-scratch
``/root/reference/sr/feature/feature.py:43-83``) at the *production*
(psf) semantics.  The XLA pipeline (``ops.frontend.mfcc39``) remains
the reference implementation and the fallback for the 'scratch'
variant / CPU.

Why fused (round-4 measured conclusion, RESULTS.md staged-FFT
section): at the XLA level the staged GEMM FFT's MAC savings are
buried under ~1.6 ms of elementwise HBM round trips between the
dot_generals.  Inside one kernel those stages are free — every
intermediate (frames, butterfly planes, spectra, mel energies) lives
in VMEM and dies there; HBM sees only the raw signal in (~82 MB at
batch 256 x 5 s) and the 39-dim features out.

Design notes (all shapes for the production 16 kHz / 400-sample /
160-step / 512-FFT config):

* **Framing in-kernel**: the signal arrives as ``[NB, 160]`` step
  blocks; frame f = rows f..f+2 lane-concatenated (480 samples >= 400)
  — sublane slices + lane concats, no gathers.  Pre-emphasis is ONE
  block-level shifted concat: ``prev = [P[:, 159:] | S[:, :159]]``
  where P is S sublane-rolled by one row (row 0 zero — which also
  reproduces psf's ``emph[0] = s[0]`` boundary exactly).
* **Staged DFT, tight re|im packing**: decimation-in-frequency
  radix-4 — exact +-1 butterfly over 128-lane slices, then one GEMM
  per residue with the twiddle folded into the basis (y0 [128,128],
  y2 [128,128], y13 [256,256]) — 98.3k MACs/frame vs the dense NDFT's
  205.6k with every contraction >= 128 deep.  The r=0 Nyquist bin is
  dropped: its mel weight is exactly zero (the last triangle ends AT
  bin 256), asserted at constant-build time, which makes every packed
  segment exactly 64 bins and every lane boundary 128-aligned.
* **Power-pair fold**: |X|^2 = re^2 + im^2 never materializes as a
  257-bin plane.  z = y*y is fed straight to the mel GEMM whose
  weight matrix carries each bin's filterbank weight on BOTH its re
  and im columns — the pair-sum is absorbed into the contraction.
* **Precision**: DFT GEMMs at ``Precision.HIGHEST`` (6-pass bf16 =
  f32-exact; the staged form at highest measured 1.578e-4 vs the
  float64 oracle — full-HIGHEST class, vs 1.0e-2 for the production
  XLA ndft:high default).  Mel/DCT default to HIGH: their inputs are
  positive (no cancellation), round-3 measured 5.7e-4-class there.
* **Deltas + standardize in-kernel**: sublane shifts and masked
  sublane reductions on the [F, 13] planes; output is the finished
  ``[3, F, n_ceps]`` feature stack (``/root/reference/sr/core.py:41-45``
  semantics, including the one-sided delta rows at frame nf-1).

Roofline (``utils.roofline.mfcc_fused``): MXU-bound at ~1.1 ms for
batch 256 x 5 s — vs the XLA production path's 2.38-3.90 ms with 60x
worse feature error.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from speech_recognition_tpu.config import FrontendConfig
from speech_recognition_tpu.ops.frontend import (
    _dct2_ortho_matrix,
    _frontend_constants,
    _mel_filterbank,
    _num_frames,
)

__all__ = ["mfcc39_pallas_batch", "fused_frontend_constants"]

_PREC = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}


def _ceil(a, b):
    return -(-a // b)


@functools.lru_cache(maxsize=8)
def fused_frontend_constants(cfg: FrontendConfig):
    """Tightly packed staged-FFT bases + fold matrices (float32 numpy).

    Layout contract (nfft = cfg.n_fft, N2 = nfft/4, H = N2/2):
      fftd_r0  [N2, N2]      cols 0:H  re of bins 0,4,..  | H:2H  im
      fftd_r2  [N2, N2]      cols 0:H  re of bins 2,6,..  | H:2H  im
      fftd_r13 [2*N2, 2*N2]  re1 | im1 | re3 | im3 (H each)
      wmel     [4*N2, n_mels]  rows follow z = [y0^2|y2^2|y13^2];
               each bin's fbank weight (already / nfft) appears on both
               its re and its im row
      dct_lift [n_mels, n_ceps]  ortho DCT-II with the sinusoidal
               lifter folded in
      window   [nfft]  Hamming over frame_len, zero beyond
    """
    assert cfg.variant == "psf", "fused kernel implements the production path"
    nfft = cfg.n_fft
    assert nfft % 8 == 0
    n2 = nfft // 4
    hh = n2 // 2
    rate = cfg.sample_rate
    high = cfg.high_freq if cfg.high_freq is not None else rate / 2.0
    fbank = _mel_filterbank(cfg.n_mels, nfft, rate, cfg.low_freq, high)
    # Nyquist-bin drop: the packed r=0 segment keeps bins 0,4,..,nfft/2-4
    # (H of them); bin nfft/2 must carry zero mel weight for this to be
    # exact.  True whenever high_freq lands ON the last bin (the last
    # triangle's upper edge), which the psf/Nyquist default guarantees.
    assert np.all(fbank[:, nfft // 2] == 0.0), (
        "fused frontend requires zero mel weight at the Nyquist bin; "
        "use the XLA path for this config")

    nn = np.arange(n2, dtype=np.float64)

    def basis(r, n_k):
        k2 = np.arange(n_k, dtype=np.float64)
        ph = 2.0 * np.pi * np.outer(nn, 4.0 * k2 + r) / nfft
        return np.cos(ph), np.sin(ph)

    c0, s0 = basis(0, hh)  # bins 0,4,..,nfft/2-4 (Nyquist dropped)
    fftd_r0 = np.concatenate([c0, -s0], axis=1)
    c2, s2 = basis(2, hh)
    fftd_r2 = np.concatenate([c2, -s2], axis=1)
    # u1 = b - i d, u3 = b + i d (b = g0 - g2, d = g1 - g3)
    c1, s1 = basis(1, hh)
    c3, s3 = basis(3, hh)
    m1 = np.concatenate([np.concatenate([c1, -s1], axis=0),
                         np.concatenate([-s1, -c1], axis=0)], axis=1)
    m3 = np.concatenate([np.concatenate([c3, s3], axis=0),
                         np.concatenate([-s3, c3], axis=0)], axis=1)
    fftd_r13 = np.concatenate([m1, m3], axis=1)  # [2*N2, 2*N2]

    # mel fold: z columns -> bins (re and im both carry the weight)
    w = fbank.T * (1.0 / nfft)  # [n_bins, n_mels]
    b0 = np.arange(0, nfft // 2, 4)
    b1 = np.arange(1, nfft // 2, 4)
    b2 = np.arange(2, nfft // 2, 4)
    b3 = np.arange(3, nfft // 2, 4)
    wmel = np.zeros((4 * n2, cfg.n_mels), np.float64)
    wmel[0 * hh:1 * hh] = wmel[1 * hh:2 * hh] = w[b0]
    wmel[2 * hh:3 * hh] = wmel[3 * hh:4 * hh] = w[b2]
    wmel[4 * hh:5 * hh] = wmel[5 * hh:6 * hh] = w[b1]
    wmel[6 * hh:7 * hh] = wmel[7 * hh:8 * hh] = w[b3]

    lift_n = np.arange(cfg.n_ceps, dtype=np.float64)
    lifter = (1.0 + (cfg.cep_lifter / 2.0)
              * np.sin(np.pi * lift_n / cfg.cep_lifter)
              if cfg.cep_lifter > 0 else np.ones(cfg.n_ceps))
    dct_lift = _dct2_ortho_matrix(cfg.n_mels, cfg.n_ceps) * lifter[None, :]

    window = np.zeros(nfft, np.float64)
    window[:cfg.frame_len] = np.hamming(cfg.frame_len)

    def hilo(m):
        """f32 -> stacked bf16 (hi, lo) planes: Mosaic has no HIGH dot
        lowering, so the 3-pass form is issued manually (hi@hi + hi@lo
        + lo@hi, each a native single-pass bf16 dot)."""
        import ml_dtypes

        bf16 = ml_dtypes.bfloat16
        m32 = m.astype(np.float32)
        mhi = m32.astype(bf16)
        mlo = (m32 - mhi.astype(np.float32)).astype(bf16)
        return np.stack([mhi, mlo])

    return {
        "fftd_r0": fftd_r0.astype(np.float32),
        "fftd_r2": fftd_r2.astype(np.float32),
        "fftd_r13": fftd_r13.astype(np.float32),
        "wmel": wmel.astype(np.float32),
        "wmel_hilo": hilo(wmel),
        "dct_lift": dct_lift.astype(np.float32),
        "dct_hilo": hilo(dct_lift),
        "window": window.astype(np.float32),
    }


def _mfcc39_kernel(len_ref, sig_ref, r0_ref, r2_ref, r13_ref, wmel_ref,
                   wmel_hl_ref, dct_ref, dct_hl_ref, win_ref, out_ref,
                   prev_ref, raw_ref, *, cfg: FrontendConfig, f_pad: int,
                   norm: str, mel_prec: str, dct_prec: str,
                   debug_stages: str = "full"):
    bi = pl.program_id(0)
    fl, fs, nfft = cfg.frame_len, cfg.frame_step, cfg.n_fft
    n2 = nfft // 4
    nslice = _ceil(fl, fs)
    u_step = sig_ref.shape[0]  # utterances per grid step
    nb = sig_ref.shape[1]
    lengths = [len_ref[bi * u_step + u] for u in range(u_step)]

    # Mosaic data-movement rules on this chip
    # (scripts/exp_r5_mosaic_probe.py): tpu.concatenate rejects inputs
    # whose layout carries a nonzero offset on a non-concat dim, and
    # layout inference FOLDS row-shifted slices/rolls into such offsets
    # — so no concatenate here ever sees a shifted operand.  What does
    # lower: pltpu.roll feeding elementwise ops, and vector STORES to
    # non-128-aligned lane slices of scratch refs.  All shifted
    # assembly below is rolls + stores.
    #
    # The u_step utterances are stacked on the ROW axis of one shared
    # raw-frame scratch ([U*nb, nfft]) so every GEMM in the chain runs
    # once with U*nb rows — at U=1 the 504-row dots leave the MXU
    # pipeline ~35% idle (fill/drain per pass), the dominant gap in the
    # round-5 stage split.  Rows [u*nb + f_pad, (u+1)*nb) carry roll
    # wrap-around; they flow through the GEMMs and are masked at the
    # per-utterance tail.
    row1 = jax.lax.broadcasted_iota(jnp.int32, (nb, fs), 0)
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (nb, fs), 1)
    for u in range(u_step):
        # ---- pre-emphasis at block level --------------------------------
        # prev[r, c] = sample (r*fs + c - 1); prev[0, 0] = 0 makes
        # emph[0] = s[0] exactly (psf _preemphasis boundary,
        # /root/reference/sr/core.py:40 semantics).
        s = sig_ref[u]  # [nb, fs]
        prev_ref[:, 1:fs] = s[:, 0:fs - 1]
        down = pltpu.roll(s, 1, 0)  # down[r] = s[r-1] (row 0 wrap: masked)
        last_col = jnp.sum(
            jnp.where((lane1 == fs - 1) & (row1 > 0), down, 0.0),
            axis=1, keepdims=True)
        prev_ref[:, 0:1] = last_col
        e = s - cfg.effective_preemph * prev_ref[...]
        # zero at/after `length` (masked variable length; padded samples
        # must be exact zeros so trailing frames are exact zeros)
        e = jnp.where(row1 * fs + lane1 < lengths[u], e, 0.0)

        # ---- framing: frame f = rows f..f+nslice-1 of the block ----
        # stream, assembled by storing rolled copies into column bands
        # (rows >= nb - j hold roll wrap — never read: f_pad + nslice <= nb)
        for j in range(nslice):
            raw_ref[u * nb:(u + 1) * nb, j * fs:(j + 1) * fs] = (
                pltpu.roll(e, nb - j, 0) if j else e)
    if nslice * fs < nfft:
        raw_ref[:, nslice * fs:nfft] = jnp.zeros(
            (u_step * nb, nfft - nslice * fs), jnp.float32)
    g = raw_ref[...] * win_ref[...]  # window zeroes cols >= fl

    # ---- exact radix-4 DIF butterfly (128-aligned lane slices) ---------
    g0, g1 = g[:, 0 * n2:1 * n2], g[:, 1 * n2:2 * n2]
    g2, g3 = g[:, 2 * n2:3 * n2], g[:, 3 * n2:4 * n2]
    a_, c_ = g0 + g2, g1 + g3
    u0, u2 = a_ + c_, a_ - c_
    bd = jnp.concatenate([g0 - g2, g1 - g3], axis=1)  # [U*nb, 2*N2]

    hi = jax.lax.Precision.HIGHEST

    def dot(x, m, prec=None):
        return jax.lax.dot_general(
            x, m, (((1,), (0,)), ((), ())),
            precision=prec, preferred_element_type=jnp.float32)

    def dot_p(x, m_ref, hl_ref, mode):
        """Matmul at a named precision tier.  Mosaic lowers only
        DEFAULT/HIGHEST, so 'high' is issued as its 3-pass definition
        explicitly: x and m split into bf16 hi/lo (m pre-split
        host-side) and hi@hi + hi@lo + lo@hi accumulated in f32."""
        if mode == "highest":
            return dot(x, m_ref[...], hi)
        if mode == "default":
            return dot(x, m_ref[...])
        xh = x.astype(jnp.bfloat16)
        xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
        mh, ml = hl_ref[0], hl_ref[1]
        return dot(xh, mh) + dot(xh, ml) + dot(xl, mh)

    y0 = dot(u0, r0_ref[...], hi)    # [U*nb, N2]
    y2 = dot(u2, r2_ref[...], hi)    # [U*nb, N2]
    y13 = dot(bd, r13_ref[...], hi)  # [U*nb, 2*N2]

    if debug_stages == "dftonly":  # measurement-only stage accounting
        y = y0 + y2 + y13[:, :n2] + y13[:, n2:]
        for u in range(u_step):
            yu = y[u * nb:u * nb + f_pad, :cfg.n_ceps]
            for k in range(3):
                out_ref[u, k] = yu
        return

    # ---- power fold -> mel -> log -> DCT+lifter ------------------------
    z = jnp.concatenate([y0 * y0, y2 * y2, y13 * y13], axis=1)
    mel = dot_p(z, wmel_ref, wmel_hl_ref, mel_prec)  # pair-sum folded in
    eps = np.float32(np.finfo(np.float64).eps)
    mel = jnp.where(mel <= 0.0, eps, mel)
    ceps_all = dot_p(jnp.log(mel), dct_ref, dct_hl_ref, dct_prec)

    if debug_stages == "notail":  # measurement-only stage accounting
        for u in range(u_step):
            cu = ceps_all[u * nb:u * nb + f_pad, :]
            for k in range(3):
                out_ref[u, k] = cu
        return

    # ---- per-utterance tail: frame mask, deltas, standardize -----------
    fi = jax.lax.broadcasted_iota(jnp.int32, (f_pad, cfg.n_ceps), 0)
    for u in range(u_step):
        length = lengths[u]
        extra = jnp.maximum(length - fl, 0)
        nf = jnp.where(length <= fl, 1, 1 + (extra + fs - 1) // fs)
        nf = jnp.minimum(nf, f_pad).astype(jnp.int32)
        ceps = jnp.where(fi < nf, ceps_all[u * nb:u * nb + f_pad, :], 0.0)

        def delta(x, nf=nf):
            # /root/reference/sr/core.py:13-22 semantics (see
            # ops.frontend.delta_feature), shift-by-roll form: fwd wraps
            # at row f_pad-1 (only read when nf == f_pad, where the nf-1
            # branch overrides it) and bwd wraps at row 0 (clamped to
            # x[0] like the XLA path, which also makes the nf == 1
            # single-frame delta exactly 0).
            fwd = pltpu.roll(x, f_pad - 1, 0)  # fwd[i] = x[i+1 mod f_pad]
            bwd = pltpu.roll(x, 1, 0)          # bwd[i] = x[i-1 mod f_pad]
            bwd = jnp.where(fi == 0, x, bwd)
            d = jnp.where(fi == nf - 1, x - bwd, fwd - bwd)
            return jnp.where(fi < nf, d, 0.0)

        d1 = delta(ceps)
        d2 = delta(d1)

        nf_f = nf.astype(jnp.float32)

        def std(x, nf=nf, nf_f=nf_f):
            if norm != "utterance":
                return x
            mean = jnp.sum(x, axis=0, keepdims=True) / nf_f  # masked: 0
            cen = jnp.where(fi < nf, x - mean, 0.0)
            var = jnp.sum(cen * cen, axis=0, keepdims=True) / nf_f
            return cen * jax.lax.rsqrt(jnp.maximum(var, 1e-20))

        out_ref[u, 0] = std(ceps)
        out_ref[u, 1] = std(d1)
        out_ref[u, 2] = std(d2)


@functools.partial(jax.jit, static_argnames=("cfg", "n_frames_cap", "norm",
                                             "mel_precision", "dct_precision",
                                             "interpret", "debug_stages",
                                             "utts_per_step"))
def mfcc39_pallas_batch(signals, lengths, cfg: FrontendConfig = FrontendConfig(),
                        n_frames_cap: int = None, norm: str = "utterance",
                        mel_precision: str = "high",
                        dct_precision: str = "high",
                        interpret: bool = False,
                        debug_stages: str = "full",
                        utts_per_step: int = 4) -> Tuple[jax.Array, jax.Array]:
    """Batched fused frontend: ``[B, L] -> ([B, F, 3*n_ceps], [B])``.

    Drop-in for :func:`ops.frontend.mfcc39_batch` (psf variant).  The
    DFT runs f32-exact (HIGHEST); ``mel_precision``/``dct_precision``
    default to 'high' (positive-operand GEMMs, 5.7e-4 class — see
    scripts/exp_r5_frontend_chip.py for the on-chip sweep).

    ``signals`` should be padded to ``(ceil8(F) + ceil(fl/fs)) *
    frame_step`` samples for a copy-free launch; shorter buffers are
    jnp.pad-ed here (one extra HBM pass).
    """
    b, L = signals.shape
    fl, fs = cfg.frame_len, cfg.frame_step
    consts = fused_frontend_constants(cfg)
    F = n_frames_cap or (1 + max(0, (L - fl) // fs))
    f_pad = _ceil(F, 8) * 8
    nslice = _ceil(fl, fs)
    nb = f_pad + nslice  # rows touched: f_pad-1 + nslice-1, +1 spare
    need = nb * fs
    if not jnp.issubdtype(signals.dtype, jnp.floating):
        signals = signals.astype(jnp.float32)
    signals = signals.astype(jnp.float32)
    if L < need:
        signals = jnp.pad(signals, ((0, 0), (0, need - L)))
    lengths = jnp.minimum(jnp.asarray(lengths, jnp.int32), L)
    # pad the batch to a u_step multiple (filler rows are dropped below)
    u_step = max(1, min(utts_per_step, b))
    b_pad = _ceil(b, u_step) * u_step
    if b_pad != b:
        signals = jnp.pad(signals[:, :need], ((0, b_pad - b), (0, 0)))
        lengths = jnp.pad(lengths, (0, b_pad - b))
    sig_blocks = signals[:, :need].reshape(b_pad, nb, fs)

    n2 = cfg.n_fft // 4
    kern = functools.partial(
        _mfcc39_kernel, cfg=cfg, f_pad=f_pad, norm=norm,
        mel_prec=mel_precision, dct_prec=dct_precision,
        debug_stages=debug_stages)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b_pad // u_step,),
        in_specs=[
            pl.BlockSpec((u_step, nb, fs), lambda i, ln: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n2, n2), lambda i, ln: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n2, n2), lambda i, ln: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * n2, 2 * n2), lambda i, ln: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * n2, cfg.n_mels), lambda i, ln: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 4 * n2, cfg.n_mels), lambda i, ln: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cfg.n_mels, cfg.n_ceps), lambda i, ln: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, cfg.n_mels, cfg.n_ceps),
                         lambda i, ln: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cfg.n_fft), lambda i, ln: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((u_step, 3, f_pad, cfg.n_ceps),
                               lambda i, ln: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((nb, fs), jnp.float32),
                        pltpu.VMEM((u_step * nb, cfg.n_fft), jnp.float32)],
    )

    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b_pad, 3, f_pad, cfg.n_ceps),
                                       jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=127 * 2**20),
    )(lengths,
      sig_blocks,
      jnp.asarray(consts["fftd_r0"]),
      jnp.asarray(consts["fftd_r2"]),
      jnp.asarray(consts["fftd_r13"]),
      jnp.asarray(consts["wmel"]),
      jnp.asarray(consts["wmel_hilo"]),
      jnp.asarray(consts["dct_lift"]),
      jnp.asarray(consts["dct_hilo"]),
      jnp.asarray(consts["window"])[None, :])

    feats = out[:b].transpose(0, 2, 1, 3).reshape(b, f_pad, 3 * cfg.n_ceps)
    nf = jnp.minimum(_num_frames(cfg, lengths[:b]), F)
    return feats[:, :F], nf
