"""Run the actual reference implementation in-process.

The reference at /root/reference targets numpy < 1.24 (`np.int`,
`np.bool`, `np.alltrue` — SURVEY.md §2.5-7) and imports pyaudio and
python_speech_features, neither installed here.  This shim makes the
*unmodified* reference importable so parity tests compare against the
real thing rather than only the re-derived oracles:

* removed numpy aliases are restored on the numpy module object,
* ``pyaudio`` is stubbed (only constants/classes touched at import),
* ``python_speech_features.mfcc`` delegates to the float64 oracle in
  ``tests/oracles/frontend_ref`` (itself verified against our frontend).

Nothing is copied from the reference; its modules are imported
read-only from /root/reference.
"""

import sys
import types

import numpy as np

_REF_PATH = "/root/reference"


def load_reference():
    """Import and return the reference's ``sr`` package (+ config)."""
    # numpy < 1.24 aliases (hasattr on removed names raises a
    # FutureWarning on some numpy versions — silence the probe)
    import warnings

    for name, repl in [("int", int), ("float", float), ("bool", bool),
                       ("object", object), ("alltrue", np.all)]:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            present = hasattr(np, name)
        if not present or name == "alltrue":
            try:
                setattr(np, name, repl)
            except Exception:
                pass

    if "pyaudio" not in sys.modules:
        stub = types.ModuleType("pyaudio")
        stub.paInt16 = 8
        stub.paContinue = 0
        stub.paComplete = 1

        class PyAudio:  # pragma: no cover - never used by tests
            def open(self, *a, **k):
                raise RuntimeError("no audio hardware")

            def get_sample_size(self, fmt):
                return 2

            def terminate(self):
                pass

        stub.PyAudio = PyAudio
        sys.modules["pyaudio"] = stub

    if "python_speech_features" not in sys.modules:
        from tests.oracles.frontend_ref import mfcc_psf_oracle

        psf = types.ModuleType("python_speech_features")

        def mfcc(signal, samplerate=16000, **kw):
            return mfcc_psf_oracle(
                signal,
                samplerate=samplerate,
                nfilt=kw.get("nfilt", 26),
                preemph=kw.get("preemph", 0.97),
                winfunc=kw.get("winfunc", lambda x: np.ones((x,))),
            )

        psf.mfcc = mfcc
        sys.modules["python_speech_features"] = psf

    if _REF_PATH not in sys.path:
        sys.path.insert(0, _REF_PATH)
    import sr  # noqa: F401  (the reference package)
    import sr.recognition.decode  # noqa: F401
    import sr.recognition.hmm  # noqa: F401
    import sr.recognition.hmm_state  # noqa: F401
    import sr.recognition.kmeans  # noqa: F401
    import sr.recognition.continuous_speech  # noqa: F401

    # the reference package star-imports submodule contents, shadowing
    # submodule names (sr.recognition.kmeans becomes the function) — take
    # the modules from sys.modules
    return types.SimpleNamespace(
        decode=sys.modules["sr.recognition.decode"],
        hmm=sys.modules["sr.recognition.hmm"],
        hmm_state=sys.modules["sr.recognition.hmm_state"],
        kmeans=sys.modules["sr.recognition.kmeans"],
        continuous=sys.modules["sr.recognition.continuous_speech"],
    )
