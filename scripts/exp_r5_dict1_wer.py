"""The accuracy case for bigram x dict1 (round-4 VERDICT item 2): WER
of pass-1 (no-LM) vs lattice-rescored bigram decoding over the
reference's OWN 6,250-word dictionary
(``/root/reference/tests/test_data/dict1.txt``), at multiple noise
levels — the full-scale version of the 1,000-word deep-tree result
(RESULTS.md round 3: 0.196 -> 0.133 at noise 2.2).

Task: dict1 words over 26 3-state letter units in a 10-dim acoustic
space; transcripts follow a sticky permutation chain (w -> (7w+3) mod V
with p=0.85) so a bigram is genuinely informative; in-word acoustic
noise makes pass 1 err.  Decodes run through the production
``decode_lextree_bigram`` path (wide Pallas lattice kernel on TPU, with
its fits-guard batch chunking) vs ``decode_lextree`` pass 1.

Run from /root/repo (TPU): python -u scripts/exp_r5_dict1_wer.py
"""

import pathlib
import sys
import time

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
    from speech_recognition_tpu.decode.lextree import decode_lextree
    from speech_recognition_tpu.langmodel.bigram import fit_bigram, scale
    from speech_recognition_tpu.models.hmm import GMMHMM, HMMBank
    from speech_recognition_tpu.models.lexgraph import build_lex_graph
    from speech_recognition_tpu.ops.lattice import decode_lextree_bigram
    from speech_recognition_tpu.utils.metrics import wer
    from speech_recognition_tpu.utils.numerics import to_cost_matrix

    rng = np.random.default_rng(17)
    raw = [ln.strip() for ln in
           open("/root/reference/tests/test_data/dict1.txt")][1:]
    seen, words = set(), []
    for w in raw:
        if w and w not in seen:
            seen.add(w)
            words.append(w)
    units = sorted(set("".join(words)))
    unit_ids = {ch: i for i, ch in enumerate(units)}
    su, dim = 3, 10
    n_words = len(words)
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
    lexg = build_lex_graph(words, unit_trans, unit_ids,
                           word_insertion_cost=0.5)
    log(f"dict1 trie: {lexg.n_words} words, {lexg.n_arcs} arcs, "
        f"{lexg.n_states} states")

    def markov_seq(n, p=0.85):
        seq = [int(rng.integers(0, n_words))]
        for _ in range(n - 1):
            if rng.random() < p:
                seq.append((7 * seq[-1] + 3) % n_words)
            else:
                seq.append(int(rng.integers(0, n_words)))
        return seq

    lm = fit_bigram([markov_seq(12) for _ in range(600)], n_words)

    def synth(seq, noise):
        fs = []
        for w in seq:
            for ch in words[w]:
                for j in range(su):
                    m = unit_means[unit_ids[ch]][j]
                    for _ in range(3):
                        fs.append(m + rng.normal(0, noise, dim))
        return np.asarray(fs, np.float32)

    # noise levels chosen so pass 1 genuinely errs at the 26-unit
    # dict1 charset (the first run at 1.4/1.8 gave pass-1 WER 0.005/
    # 0.021 — too easy to show an LM gain)
    n_test, n_utt_words = 48, 4
    for noise in (2.2, 2.6):
        refs = [markov_seq(n_utt_words) for _ in range(n_test)]
        feats_list = [synth(s, noise) for s in refs]
        tmax = max(f.shape[0] for f in feats_list)
        x = np.zeros((n_test, tmax, dim), np.float32)
        nfs = np.zeros(n_test, np.int32)
        for i, f in enumerate(feats_list):
            x[i, : f.shape[0]] = f
            nfs[i] = f.shape[0]

        # chunk to the dict1 serving batch (the wide kernel's VMEM
        # envelope); decode_lextree_bigram also self-chunks, but the
        # pass-1 API takes the same chunks for a fair split
        bs = 16
        hyp1, hyp2 = [], {1.0: [], 2.0: [], 4.0: []}
        t0 = time.perf_counter()
        for i in range(0, n_test, bs):
            h, _ = decode_lextree(bank, lexg, x[i:i + bs], nfs[i:i + bs])
            hyp1.extend(h)
        t1 = time.perf_counter()
        for sc in (1.0, 2.0, 4.0):
            for i in range(0, n_test, bs):
                h, _ = decode_lextree_bigram(bank, lexg, scale(lm, sc),
                                             x[i:i + bs], nfs[i:i + bs])
                hyp2[sc].extend(h)
        t2 = time.perf_counter()
        line = [f"noise {noise}: pass1 WER {wer(hyp1, refs):.3f}"]
        for sc in (1.0, 2.0, 4.0):
            line.append(f"bigram x{sc:g} {wer(hyp2[sc], refs):.3f}")
        line.append(f"(pass1 {t1-t0:.1f}s, bigram {(t2-t1)/3:.1f}s/scale "
                    f"wall incl. compile)")
        log("  ".join(line))


if __name__ == "__main__":
    main()
