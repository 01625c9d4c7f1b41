"""Native C++ wav loader: build, parity with scipy, threading."""

import os
import time

import numpy as np
import pytest

from speech_recognition_tpu.data.synthetic import SyntheticDigits
from speech_recognition_tpu.data.wav import write_wav
from speech_recognition_tpu.runtime.loader import load_wav_batch, native_available


@pytest.fixture(scope="module")
def wav_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("wavs")
    gen = SyntheticDigits(seed=1)
    utts = gen.isolated_corpus(2, tag="rt") + gen.continuous_corpus(4, tag="rt")
    paths = []
    for u in utts:
        p = os.path.join(d, u.name)
        write_wav(p, u.samples)
        paths.append(p)
    return paths


def test_native_builds():
    assert native_available(), "g++ build of the native loader failed"


def test_batch_matches_scipy(wav_dir):
    from scipy.io import wavfile

    cap = 60000
    out, lengths, rates = load_wav_batch(wav_dir, cap)
    assert out.shape == (len(wav_dir), cap)
    for i, p in enumerate(wav_dir):
        rate, sig = wavfile.read(p)
        assert rates[i] == rate
        assert lengths[i] == min(len(sig), cap)
        np.testing.assert_array_equal(out[i, : lengths[i]], sig[: lengths[i]].astype(np.float32))
        assert np.all(out[i, lengths[i] :] == 0)


def test_truncation(wav_dir):
    out, lengths, _ = load_wav_batch(wav_dir[:1], 1000)
    assert lengths[0] == 1000
    assert out.shape == (1, 1000)


def test_bad_file_raises(tmp_path):
    bad = os.path.join(tmp_path, "bad.wav")
    with open(bad, "wb") as f:
        f.write(b"not a wav file at all")
    if native_available():
        with pytest.raises(IOError):
            load_wav_batch([bad], 1000)


def test_multithreaded_same_result(wav_dir):
    a = load_wav_batch(wav_dir, 30000, n_threads=1)
    b = load_wav_batch(wav_dir, 30000, n_threads=8)
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])
