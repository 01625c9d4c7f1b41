"""Frontend accuracy evidence across corpora (round-4 VERDICT item 8,
round-5 form): decode invariance of the FUSED Pallas frontend (now the
TPU production default via ``mfcc39_auto``) vs the strict XLA
dft=highest path and the old XLA dft=high production default, on THREE
corpora: clean, two noise levels, and long-ish utterances.

The fused kernel measures 4.3e-4 vs the float64 oracle (vs 4.0e-3 for
the old default), so the expectation is identical decodes everywhere —
this records it per corpus, replacing the single-corpus round-3
evidence.

Run (TPU): python -u scripts/exp_r5_frontend_wer3.py
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
    from speech_recognition_tpu.ops.frontend import (
        mfcc39_batch,
        padded_length,
    )
    from speech_recognition_tpu.ops.frontend_pallas import mfcc39_pallas_batch
    from speech_recognition_tpu.train.isolated import fit_hmm
    from speech_recognition_tpu.utils.metrics import wer

    base = FrontendConfig()
    old_prod = dataclasses.replace(base, dft_precision="high",
                                   mel_precision="highest",
                                   dct_precision="highest")

    def featurize(utts, which):
        cap = max(len(u.samples) for u in utts)
        L = ((padded_length(base, cap) + 159) // 160 + 8) * 160
        buf = np.zeros((len(utts), L), np.float32)
        lens = np.zeros((len(utts),), np.int32)
        for i, u in enumerate(utts):
            buf[i, : len(u.samples)] = u.samples
            lens[i] = len(u.samples)
        if which == "fused":
            fb, nfb = mfcc39_pallas_batch(jnp.asarray(buf),
                                          jnp.asarray(lens), base)
        elif which == "xla_highest":
            fb, nfb = mfcc39_batch(jnp.asarray(buf), jnp.asarray(lens), base)
        else:
            fb, nfb = mfcc39_batch(jnp.asarray(buf), jnp.asarray(lens),
                                   old_prod)
        return np.asarray(fb), np.asarray(nfb)

    corpora = {
        "clean": SyntheticDigits(seed=23),
        "noise1.5": SyntheticDigits(seed=31, noise=1.5),
        "noise2.5": SyntheticDigits(seed=37, noise=2.5),
    }
    for cname, gen in corpora.items():
        train = gen.isolated_corpus(5)
        test = gen.continuous_corpus(48)
        ftr, ntr = featurize(train, "xla_highest")
        by_digit = {}
        for u, f, n in zip(train, ftr, ntr):
            by_digit.setdefault(u.labels[0], []).append(f[:n])
        key = jax.random.PRNGKey(0)
        models = [fit_hmm(key, by_digit[d]) for d in sorted(by_digit)]
        bank = HMMBank.stack(models)
        graph = build_loop_graph([np.asarray(m.trans_cost) for m in models])
        refs = [list(u.labels) for u in test]
        outs = {}
        for which in ("fused", "xla_highest", "xla_dft_high"):
            fte, nte = featurize(test, which)
            seqs, _ = decode_connected(bank, graph, jnp.asarray(fte),
                                       jnp.asarray(nte))
            outs[which] = seqs
            log(f"[{cname}] {which}: WER {wer(seqs, refs):.4f}")
        same_hi = sum(a == b for a, b in
                      zip(outs["fused"], outs["xla_highest"]))
        same_old = sum(a == b for a, b in
                       zip(outs["fused"], outs["xla_dft_high"]))
        log(f"[{cname}] fused==xla_highest: {same_hi}/{len(test)}; "
            f"fused==old_prod(dft_high): {same_old}/{len(test)}")


if __name__ == "__main__":
    main()
