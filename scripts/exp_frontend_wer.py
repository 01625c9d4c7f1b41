"""Task-level error budget for the frontend's DFT precision (round-3).

The strict 1.3e-3 vs-float64 budget forces the DFT to 6 bf16 passes
(HIGHEST); 'high' (3 passes) is 1e-2 absolute on standardized features
because loud spectral components leak absolute error into quiet bins
through the bf16 operand rounding, and log amplifies it.  What matters
for the PRODUCT is decode invariance: this experiment trains a bank on
CPU-exact features, then decodes the same connected corpus on-chip with
features at {dft=highest} vs {dft=high, mel/dct=highest} and compares
the decoded word sequences and WER.

Run from /root/repo on TPU: ``python scripts/exp_frontend_wer.py``.
"""
import dataclasses
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass

    from bench import log
    from speech_recognition_tpu.config import FrontendConfig
    from speech_recognition_tpu.data.synthetic import SyntheticDigits
    from speech_recognition_tpu.decode.connected import decode_connected
    from speech_recognition_tpu.models.graph import build_loop_graph
    from speech_recognition_tpu.models.hmm import HMMBank
    from speech_recognition_tpu.ops.frontend import mfcc39_batch, padded_length
    from speech_recognition_tpu.train.isolated import fit_hmm
    from speech_recognition_tpu.utils.metrics import wer

    gen = SyntheticDigits(seed=23)
    train = gen.isolated_corpus(5)
    test = gen.continuous_corpus(48)
    base = FrontendConfig()
    fast = dataclasses.replace(base, dft_precision="high",
                               mel_precision="highest",
                               dct_precision="highest")

    def featurize(utts, cfg):
        cap = max(len(u.samples) for u in utts)
        L = padded_length(cfg, cap)
        buf = np.zeros((len(utts), L), np.float32)
        lens = np.zeros((len(utts),), np.int32)
        for i, u in enumerate(utts):
            buf[i, : len(u.samples)] = u.samples
            lens[i] = len(u.samples)
        fb, nfb = mfcc39_batch(jnp.asarray(buf), jnp.asarray(lens), cfg)
        return np.asarray(fb), np.asarray(nfb)

    # train once on HIGHEST features (the training path is offline; the
    # question is SERVING-time feature precision)
    ftr, ntr = featurize(train, base)
    by_digit = {}
    for u, f, n in zip(train, ftr, ntr):
        by_digit.setdefault(u.labels[0], []).append(f[:n])
    key = jax.random.PRNGKey(0)
    models = [fit_hmm(key, by_digit[d]) for d in sorted(by_digit)]
    bank = HMMBank.stack(models)
    graph = build_loop_graph([np.asarray(m.trans_cost) for m in models])

    refs = [list(u.labels) for u in test]
    outs = {}
    for name, cfg in (("highest", base), ("dft_high", fast)):
        fte, nte = featurize(test, cfg)
        seqs, costs = decode_connected(bank, graph, jnp.asarray(fte),
                                       jnp.asarray(nte))
        outs[name] = seqs
        log(f"{name}: WER {wer(seqs, refs):.4f}")
    same = sum(a == b for a, b in zip(outs["highest"], outs["dft_high"]))
    log(f"identical decodes: {same}/{len(test)}")


if __name__ == "__main__":
    main()
