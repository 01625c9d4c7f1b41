"""Wav file IO (scipy-backed, like the reference's
``scipy.io.wavfile`` usage at ``/root/reference/sr/core.py:40`` and
int16 writing at ``sr/audio_capture/record.py:250-264``)."""

from __future__ import annotations

import numpy as np
from scipy.io import wavfile


def read_wav(path):
    """Returns ``(sample_rate, samples)`` with samples as int16/float."""
    rate, sig = wavfile.read(path)
    if sig.ndim > 1:
        sig = sig[:, 0]
    return rate, sig


def write_wav(path, samples, sample_rate: int = 16000):
    wavfile.write(path, sample_rate, np.asarray(samples).astype(np.int16))
