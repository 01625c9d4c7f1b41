"""Bigram-over-lattice WER benefit on a DEEP-TREE 1,000-word task —
the round-2 VERDICT item-2 done-bar: replicate the flat-vocab LM
experiment's WER gain (RESULTS.md noise table) on a >= 1k-word trie at
production speed.

Task: 1,000 words over 8 3-state units in a 10-dim acoustic space;
transcripts follow a sticky permutation chain (w -> (7w+3) mod V with
p=0.85) so a bigram is genuinely informative; in-word acoustic noise
makes pass 1 err.  Measures WER of the pass-1 (no-LM) decode vs the
lattice-rescored decode at LM scales 1/2/4.

Run from /root/repo (TPU: Pallas lattice pass; CPU: XLA fallback).
"""

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
    from speech_recognition_tpu.data.synthetic import random_gmm_hmm
    from speech_recognition_tpu.langmodel.bigram import fit_bigram, scale
    from speech_recognition_tpu.models.hmm import GMMHMM, HMMBank
    from speech_recognition_tpu.models.lexgraph import build_lex_graph
    from speech_recognition_tpu.ops.lattice import decode_lextree_bigram
    from speech_recognition_tpu.decode.lextree import decode_lextree
    from speech_recognition_tpu.utils.metrics import wer
    from speech_recognition_tpu.utils.numerics import to_cost_matrix

    rng = np.random.default_rng(11)
    units = list("abcdefgh")
    unit_ids = {ch: i for i, ch in enumerate(units)}
    su, dim, n_words = 3, 10, 1000
    models, unit_trans, unit_means = [], [], []
    for _ in units:
        p = random_gmm_hmm(rng, n_states=su, n_mix=1, dim=dim, sep=1.6)
        models.append(GMMHMM(
            means=jnp.asarray(p["means"], jnp.float32),
            log_vars=jnp.log(jnp.asarray(p["variances"], jnp.float32)),
            log_weights=jnp.log(jnp.asarray(p["weights"], jnp.float32)),
            trans_cost=jnp.asarray(to_cost_matrix(p["trans"])),
        ))
        unit_trans.append(p["trans"])
        unit_means.append(p["means"][:, 0, :])
    bank = HMMBank.stack(models)

    vocab = set()
    while len(vocab) < n_words:
        n = int(rng.integers(3, 8))
        vocab.add("".join(rng.choice(units, n)))
    words = sorted(vocab)
    lexg = build_lex_graph(words, unit_trans, unit_ids,
                           word_insertion_cost=0.5)
    log(f"trie: {lexg.n_words} words, {lexg.n_arcs} arcs, "
        f"{lexg.n_states} states")

    def markov_seq(n, p=0.85):
        seq = [int(rng.integers(0, n_words))]
        for _ in range(n - 1):
            if rng.random() < p:
                seq.append((7 * seq[-1] + 3) % n_words)
            else:
                seq.append(int(rng.integers(0, n_words)))
        return seq

    lm = fit_bigram([markov_seq(12) for _ in range(400)], n_words)

    # test utterances: word means + heavy noise, 3 frames per state
    def synth(seq, noise):
        fs = []
        for w in seq:
            for ch in words[w]:
                for j in range(su):
                    m = unit_means[unit_ids[ch]][j]
                    for _ in range(3):
                        fs.append(m + rng.normal(0, noise, dim))
        return np.asarray(fs, np.float32)

    n_test, n_utt_words = 96, 5
    for noise in (1.4, 1.8, 2.2):
        refs = [markov_seq(n_utt_words) for _ in range(n_test)]
        feats_list = [synth(s, noise) for s in refs]
        tmax = max(f.shape[0] for f in feats_list)
        x = np.zeros((n_test, tmax, dim), np.float32)
        nfs = np.zeros(n_test, np.int32)
        for i, f in enumerate(feats_list):
            x[i, : f.shape[0]] = f
            nfs[i] = f.shape[0]

        hyp1, _ = decode_lextree(bank, lexg, x, nfs)
        line = [f"noise {noise}: pass1 WER {wer(hyp1, refs):.3f}"]
        for sc in (1.0, 2.0, 4.0):
            hyp2, _ = decode_lextree_bigram(bank, lexg, scale(lm, sc), x, nfs)
            line.append(f"bigram x{sc:g} {wer(hyp2, refs):.3f}")
        log("  ".join(line))


if __name__ == "__main__":
    main()
