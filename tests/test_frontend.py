"""MFCC frontend golden tests vs the float64 numpy oracle.

Replaces the reference's visual-only MFCC check
(``/root/reference/tests/test_mfcc.py:6-24``, which plt.show()s two
spectrograms with no asserts) with allclose assertions — the BASELINE.md
MFCC-parity gate.
"""

import numpy as np
import pytest

from speech_recognition_tpu.config import FrontendConfig
from speech_recognition_tpu.ops.frontend import (
    mfcc,
    mfcc39,
    max_frames,
    padded_length,
)
from tests.oracles.frontend_ref import (
    load_wav_as_mfcc_oracle,
    mfcc_psf_oracle,
    mfcc_scratch_oracle,
)

PSF = FrontendConfig()
SCRATCH = FrontendConfig(variant="scratch")  # preemph/low_freq variant defaults


def synth_signal(rng, n, sample_rate=16000):
    """Speech-ish test signal: a few tones + noise, int16 range."""
    t = np.arange(n) / sample_rate
    sig = (
        4000 * np.sin(2 * np.pi * 350 * t)
        + 2500 * np.sin(2 * np.pi * 1200 * t + 0.7)
        + 1000 * np.sin(2 * np.pi * 2400 * t + 1.1)
        + 400 * rng.standard_normal(n)
    )
    env = np.minimum(1.0, np.arange(n) / 800.0) * np.minimum(1.0, (n - np.arange(n)) / 800.0)
    return np.round(sig * env).astype(np.int16)


def _run_padded(cfg, sig, cap_len, dtype=np.float64):
    L = padded_length(cfg, cap_len)
    buf = np.zeros(L, dtype)
    buf[: len(sig)] = sig
    return buf, len(sig)


@pytest.mark.parametrize("n", [7000, 7321, 16000])
def test_psf_mfcc_matches_oracle(rng, n):
    sig = synth_signal(rng, n)
    buf, length = _run_padded(PSF, sig, 16000)
    ceps, nf = mfcc(buf, length, PSF)
    ref = mfcc_psf_oracle(sig)
    assert int(nf) == ref.shape[0]
    np.testing.assert_allclose(np.asarray(ceps)[: ref.shape[0]], ref, rtol=1e-9, atol=1e-9)
    # masked frames are exact zeros
    assert np.all(np.asarray(ceps)[ref.shape[0] :] == 0)


@pytest.mark.parametrize("n", [7000, 9999])
def test_scratch_mfcc_matches_oracle(rng, n):
    sig = synth_signal(rng, n)
    buf, length = _run_padded(SCRATCH, sig, 16000)
    ceps, nf = mfcc(buf, length, SCRATCH)
    ref = mfcc_scratch_oracle(sig)
    assert int(nf) == ref.shape[0]
    np.testing.assert_allclose(np.asarray(ceps)[: ref.shape[0]], ref, rtol=1e-9, atol=1e-9)


def test_full_39dim_path_matches_reference(rng):
    sig = synth_signal(rng, 12000)
    buf, length = _run_padded(PSF, sig, 16000)
    feats, nf = mfcc39(buf, length, PSF)
    ref = load_wav_as_mfcc_oracle(sig)
    assert int(nf) == ref.shape[0]
    np.testing.assert_allclose(np.asarray(feats)[: ref.shape[0]], ref, rtol=1e-8, atol=1e-9)


def test_dft_gemm_equals_fft(rng):
    sig = synth_signal(rng, 8000)
    cfg_fft = FrontendConfig(dft_as_gemm=False)
    buf, length = _run_padded(PSF, sig, 8000)
    a, _ = mfcc(buf, length, PSF)
    b, _ = mfcc(buf, length, cfg_fft)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-9)


def test_staged_fft_matches_ndft(rng):
    """The decimation-in-frequency staged GEMM FFT (dft_stage='staged')
    agrees with the dense NDFT and jnp.fft.rfft to f32 reassociation
    tolerance, on both frontend variants."""
    import dataclasses

    sig = synth_signal(rng, 9000)
    for variant in ("psf", "scratch"):
        base = dataclasses.replace(PSF, variant=variant)
        buf, length = _run_padded(base, sig, 9000)
        a, _ = mfcc(buf, length, base)
        b, _ = mfcc(buf, length, dataclasses.replace(base,
                                                     dft_stage="staged"))
        c, _ = mfcc(buf, length, dataclasses.replace(base,
                                                     dft_as_gemm=False))
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=2e-3)
        np.testing.assert_allclose(np.asarray(b), np.asarray(c),
                                   rtol=1e-4, atol=2e-3)


def test_padding_invariance(rng):
    """Extra zero padding beyond padded_length must not change features."""
    sig = synth_signal(rng, 7000)
    buf1, length = _run_padded(PSF, sig, 7000)
    f1, nf1 = mfcc39(buf1, length, PSF)
    buf2 = np.zeros(padded_length(PSF, 20000), np.float32)
    buf2[:7000] = sig
    f2, nf2 = mfcc39(buf2, length, PSF)
    assert int(nf1) == int(nf2)
    # f32 buffers: different padded shapes change matmul reduction order,
    # so allow float32-level slack.
    np.testing.assert_allclose(
        np.asarray(f1)[: int(nf1)], np.asarray(f2)[: int(nf1)], rtol=1e-4, atol=1e-4
    )


def test_max_frames_consistency():
    for n in [400, 401, 7000, 7321]:
        cap = max_frames(PSF, n)
        sig = np.ones(n, np.float32)
        buf = np.zeros(padded_length(PSF, n), np.float32)
        buf[:n] = sig
        _, nf = mfcc(buf, np.int32(n), PSF)
        assert int(nf) <= cap


def test_float32_precision_bounded(rng):
    """Production f32 path stays close to the f64 oracle: standardized
    features are O(1), so an absolute tolerance is meaningful."""
    sig = synth_signal(rng, 12000)
    buf, length = _run_padded(PSF, sig, 16000, dtype=np.float32)
    feats, nf = mfcc39(buf, length, PSF)
    assert feats.dtype == np.float32
    ref = load_wav_as_mfcc_oracle(sig)
    np.testing.assert_allclose(
        np.asarray(feats)[: ref.shape[0]], ref, rtol=0, atol=5e-2
    )
