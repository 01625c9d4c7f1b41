"""Python bindings for the native batched wav loader.

Builds ``wav_loader.cc`` with g++ on first use (cached next to the
source), binds it via ctypes (no pybind11 in this image), and falls
back to scipy per-file reads when a toolchain is unavailable — the
fallback is the reference's own IO path
(``/root/reference/sr/core.py:40``), so behavior is identical either
way (asserted in tests).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "wav_loader.cc")
_LIB = os.path.join(os.path.dirname(__file__), "_wav_loader.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    try:
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
                 _SRC, "-o", _LIB],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(_LIB)
        lib.load_wav_batch.restype = ctypes.c_int
        lib.load_wav_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int,
        ]
        return lib
    except (subprocess.CalledProcessError, OSError):
        _build_failed = True
        return None


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is None and not _build_failed:
        with _lock:
            if _lib is None and not _build_failed:
                _lib = _build()
    return _lib


def native_available() -> bool:
    return _get_lib() is not None


def load_wav_batch(
    paths: List[str], cap_samples: int, n_threads: int = 0
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Read PCM16 wavs into a padded float32 batch.

    Returns ``(samples [B, cap], lengths [B], rates [B])``; samples past
    each file's length are exact zeros, files longer than ``cap`` are
    truncated.
    """
    b = len(paths)
    out = np.zeros((b, cap_samples), dtype=np.float32)
    lengths = np.zeros((b,), dtype=np.int32)
    rates = np.zeros((b,), dtype=np.int32)
    if b == 0:
        return out, lengths, rates

    lib = _get_lib()
    if lib is not None:
        arr = (ctypes.c_char_p * b)(*[p.encode() for p in paths])
        if n_threads <= 0:
            n_threads = min(8, os.cpu_count() or 1)
        err = lib.load_wav_batch(
            arr,
            b,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            cap_samples,
            lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            rates.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            n_threads,
        )
        if err:
            raise IOError(f"failed to parse wav file: {paths[err - 1]}")
        return out, lengths, rates

    # scipy fallback (reference IO path)
    from scipy.io import wavfile

    for i, p in enumerate(paths):
        rate, sig = wavfile.read(p)
        if sig.ndim > 1:
            sig = sig[:, 0]
        n = min(len(sig), cap_samples)
        out[i, :n] = sig[:n].astype(np.float32)
        lengths[i] = n
        rates[i] = rate
    return out, lengths, rates


class PrefetchWavBatches:
    """Iterate padded wav batches with one-batch lookahead.

    A worker thread runs the native batched loader for batch k+1 while
    the caller featurizes/decodes batch k on-device — the input
    pipeline overlap the reference's serial per-file scipy loop cannot
    express (``/root/reference/sr/core.py:122-139``).  Yields
    ``(paths_chunk, samples [b, cap], lengths [b], rates [b])`` in
    order; IO errors surface in the consuming thread.
    """

    def __init__(self, paths: List[str], batch_size: int, cap_samples: int,
                 n_threads: int = 0, depth: int = 2):
        self.paths = list(paths)
        self.batch_size = int(batch_size)
        self.cap_samples = int(cap_samples)
        self.n_threads = n_threads
        self.depth = max(1, int(depth))

    def __iter__(self):
        import queue

        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        chunks = [self.paths[i : i + self.batch_size]
                  for i in range(0, len(self.paths), self.batch_size)]

        def worker():
            try:
                for chunk in chunks:
                    q.put(("ok", chunk,
                           load_wav_batch(chunk, self.cap_samples,
                                          self.n_threads)))
            except BaseException as e:  # surface in the consumer
                q.put(("err", e, None))
            q.put(("done", None, None))

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            kind, a, b = q.get()
            if kind == "done":
                break
            if kind == "err":
                raise a
            samples, lengths, rates = b
            yield a, samples, lengths, rates
