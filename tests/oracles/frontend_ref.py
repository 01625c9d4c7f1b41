"""Numpy float64 oracle for the reference feature paths.

``mfcc_psf_oracle`` reproduces ``python_speech_features.mfcc`` (v0.6)
with the exact arguments used by the reference's production path
(``/root/reference/sr/core.py:40``): nfilt=40, preemph=0.95,
appendEnergy=False, winfunc=np.hamming, defaults winlen=0.025,
winstep=0.01, numcep=13, nfft=512 (smallest pow2 >= winlen*rate),
lowfreq=0, highfreq=Nyquist, ceplifter=22.  psf is not installed in this
image, so this is an independent re-derivation of its published
semantics, used as the golden reference for ``allclose`` tests (the
BASELINE.md MFCC-parity requirement).

``mfcc_scratch_oracle`` reproduces the reference's from-scratch path
(``/root/reference/sr/feature/feature.py:43-83``) with modern numpy.

``load_wav_as_mfcc_oracle`` composes mfcc -> deltas -> standardize like
``/root/reference/sr/core.py:34-45``.
"""

import math

import numpy as np
from scipy.fftpack import dct


def _round_half_up(x):
    # psf uses decimal ROUND_HALF_UP; equivalent for positive values:
    return int(math.floor(x + 0.5))


def _preemphasis(signal, coeff):
    return np.append(signal[0], signal[1:] - coeff * np.asarray(signal[:-1], np.float64))


def _framesig(sig, frame_len, frame_step, winfunc):
    slen = len(sig)
    frame_len = _round_half_up(frame_len)
    frame_step = _round_half_up(frame_step)
    if slen <= frame_len:
        numframes = 1
    else:
        numframes = 1 + int(math.ceil((1.0 * slen - frame_len) / frame_step))
    padlen = int((numframes - 1) * frame_step + frame_len)
    padsignal = np.concatenate((sig, np.zeros(padlen - slen)))
    indices = (
        np.tile(np.arange(0, frame_len), (numframes, 1))
        + np.tile(np.arange(0, numframes * frame_step, frame_step), (frame_len, 1)).T
    )
    frames = padsignal[indices.astype(np.int32)]
    win = np.tile(winfunc(frame_len), (numframes, 1))
    return frames * win


def _hz2mel(hz):
    return 2595 * np.log10(1 + np.asarray(hz, np.float64) / 700.0)


def _mel2hz(mel):
    return 700 * (10 ** (np.asarray(mel, np.float64) / 2595.0) - 1)


def _get_filterbanks(nfilt, nfft, samplerate, lowfreq, highfreq):
    lowmel, highmel = _hz2mel(lowfreq), _hz2mel(highfreq)
    melpoints = np.linspace(lowmel, highmel, nfilt + 2)
    bins = np.floor((nfft + 1) * _mel2hz(melpoints) / samplerate)
    fbank = np.zeros([nfilt, nfft // 2 + 1])
    for j in range(0, nfilt):
        for i in range(int(bins[j]), int(bins[j + 1])):
            fbank[j, i] = (i - bins[j]) / (bins[j + 1] - bins[j])
        for i in range(int(bins[j + 1]), int(bins[j + 2])):
            fbank[j, i] = (bins[j + 2] - i) / (bins[j + 2] - bins[j + 1])
    return fbank


def _lifter(cepstra, L=22):
    if L > 0:
        _, ncoeff = cepstra.shape
        n = np.arange(ncoeff)
        lift = 1 + (L / 2.0) * np.sin(np.pi * n / L)
        return lift * cepstra
    return cepstra


def mfcc_psf_oracle(
    signal,
    samplerate=16000,
    winlen=0.025,
    winstep=0.01,
    numcep=13,
    nfilt=40,
    nfft=512,
    lowfreq=0,
    highfreq=None,
    preemph=0.95,
    ceplifter=22,
    winfunc=np.hamming,
):
    highfreq = highfreq or samplerate / 2
    signal = _preemphasis(np.asarray(signal, np.float64), preemph)
    frames = _framesig(signal, winlen * samplerate, winstep * samplerate, winfunc)
    mag = np.absolute(np.fft.rfft(frames, nfft))
    pspec = 1.0 / nfft * np.square(mag)
    fb = _get_filterbanks(nfilt, nfft, samplerate, lowfreq, highfreq)
    feat = np.dot(pspec, fb.T)
    feat = np.where(feat == 0, np.finfo(np.float64).eps, feat)
    feat = np.log(feat)
    feat = dct(feat, type=2, axis=1, norm="ortho")[:, :numcep]
    feat = _lifter(feat, ceplifter)
    return feat


def mfcc_scratch_oracle(signal, sample_rate=16000, frame_size=0.025, frame_stride=0.01,
                        low_freq=80, high_freq=None):
    """From-scratch path, /root/reference/sr/feature/feature.py:43-83."""
    signal = np.asarray(signal, np.float64)
    pre_emphasis = 0.97
    emphasized = np.append(signal[0], signal[1:] - pre_emphasis * signal[:-1])

    # segment(): frame count is ceil(len/step) — the slen>frame_len guard
    # compares samples against seconds and is always true (feature.py:11).
    frame_len1 = int(frame_size * sample_rate)
    frame_step1 = int(frame_stride * sample_rate)
    num_frames = math.ceil(emphasized.size / frame_step1)
    final_len = int((num_frames - 1) * frame_step1 + frame_len1)
    pad_sig = np.concatenate([emphasized, np.zeros(final_len - emphasized.size)])
    frames = np.zeros((num_frames, frame_len1))
    for i in range(num_frames):
        frames[i, :] = pad_sig[i * frame_step1 : i * frame_step1 + frame_len1]

    # zero_padding(): centre-pad to next power of two.
    width = frames.shape[1]
    frame_len = 1 << (width - 1).bit_length()
    pad_len = frame_len - width
    pad_left = pad_len // 2
    f = np.zeros((frames.shape[0], frame_len))
    f[:, pad_left : pad_left + width] = frames
    frames = f * np.hamming(frame_len)

    NFFT = 512
    mag = np.absolute(np.fft.rfft(frames, NFFT))
    pow_frames = (1.0 / NFFT) * (mag ** 2)

    nfilt = 40
    high_freq = high_freq or sample_rate / 2
    fb = _get_filterbanks(nfilt, NFFT, sample_rate, low_freq, high_freq)
    filter_banks = np.dot(pow_frames, fb.T)
    filter_banks = np.where(filter_banks == 0, np.finfo(float).eps, filter_banks)
    filter_banks = np.log10(filter_banks)

    num_ceps = 13
    return dct(filter_banks, type=2, axis=1, norm="ortho")[:, 1 : num_ceps + 1]


def delta_feature_oracle(feat):
    """/root/reference/sr/core.py:13-22."""
    delta = np.zeros_like(feat)
    for i in range(len(feat)):
        if i == 0:
            delta[i] = feat[i + 1] - feat[i]
        elif i == len(feat) - 1:
            delta[i] = feat[i] - feat[i - 1]
        else:
            delta[i] = feat[i + 1] - feat[i - 1]
    return delta


def standardize_oracle(data):
    """/root/reference/sr/feature/feature.py:85-88."""
    data = data - np.mean(data, axis=0)
    return data / np.std(data, axis=0)


def load_wav_as_mfcc_oracle(signal, sample_rate=16000, variant="psf"):
    """mfcc -> [c, d, dd] -> standardize (/root/reference/sr/core.py:25-45)."""
    if variant == "psf":
        m = mfcc_psf_oracle(signal, sample_rate)
    else:
        m = mfcc_scratch_oracle(signal, sample_rate)
    d = delta_feature_oracle(m)
    dd = delta_feature_oracle(d)
    return standardize_oracle(np.concatenate([m, d, dd], axis=1))
