"""Parity against the ACTUAL reference implementation (not the oracles):
the unmodified code at /root/reference runs in-process via tests/ref_shim
and its outputs are compared with this framework's kernels."""

import numpy as np
import pytest

from tests.ref_shim import load_reference

ref = load_reference()


def _ref_gmm(means, variances, weights):
    """Build a reference GMM state object with given parameters."""
    g = ref.hmm_state.GMM(means[0], variances[0], means.shape[0])
    g.update_models(np.asarray(means), np.asarray(variances), np.asarray(weights))
    return g


def test_reference_gmm_evaluate_matches_our_emission(rng):
    """Reference linear-space GMM.evaluate == our logsumexp emission."""
    import jax.numpy as jnp

    from speech_recognition_tpu.ops.gmm import gmm_emission_weights, gmm_neg_log_lik

    m, d = 3, 6
    means = rng.normal(0, 1, (m, d))
    variances = rng.uniform(0.5, 2.0, (m, d))
    weights = rng.uniform(0.2, 1.0, m)
    weights /= weights.sum()
    g = _ref_gmm(means, variances, weights)

    x = rng.normal(0, 1, (10, d))
    ref_nll = np.array([g.evaluate(x[i]) for i in range(10)])

    w, lw = gmm_emission_weights(
        jnp.asarray(means[None]), jnp.log(jnp.asarray(variances[None])),
        jnp.log(jnp.asarray(weights[None])),
    )
    ours = np.asarray(gmm_neg_log_lik(jnp.asarray(x), w, lw))[:, 0]
    np.testing.assert_allclose(ours, ref_nll, rtol=1e-5)


def test_reference_decode_hmm_states_matches_viterbi(rng):
    """Full NES-graph decode: the reference's Python DP vs our
    epsilon-closed scan kernel, on identical GMM states."""
    import jax.numpy as jnp

    from speech_recognition_tpu.models.graph import build_word_graph
    from speech_recognition_tpu.ops.viterbi import viterbi, viterbi_backtrace

    n_words, s, m, d = 2, 3, 2, 4
    word_params = []
    for _ in range(n_words):
        means = rng.normal(0, 2, (s, m, d))
        variances = rng.uniform(0.5, 2.0, (s, m, d))
        weights = rng.uniform(0.2, 1.0, (s, m))
        weights /= weights.sum(axis=1, keepdims=True)
        trans = np.full((s, s), np.inf)
        for i in range(s):
            trans[i, i] = rng.uniform(0.2, 1.0)
            if i + 1 < s:
                trans[i + 1, i] = rng.uniform(0.2, 1.0)
        word_params.append((means, variances, weights, trans))

    # reference HMM objects
    ref_models = []
    for means, variances, weights, trans in word_params:
        h = ref.hmm.HMM(s)
        h.use_gmm = True
        h.gmm_states = [
            _ref_gmm(means[i], variances[i], weights[i]) for i in range(s)
        ]
        h.transitions = trans
        ref_models.append(h)

    # reference composed graph + decode (2 layers x both words)
    label_matrix = [[0, 1], [0, 1]]
    seq, trans_ref, end_pts = ref.continuous.build_state_sequences(
        ref_models, label_matrix
    )
    t_len = 12
    x = rng.normal(0, 2, (t_len, d))
    costs_ref, path_ref = ref.decode.decode_hmm_states(
        x, seq, trans_ref, end_points=[[e, -1] for e in end_pts]
    )
    best_ref = min(costs_ref[e, -1] for e in end_pts)

    # our side: same parameters through the epsilon-closed graph
    from speech_recognition_tpu.models.hmm import GMMHMM, HMMBank, bank_nll
    from speech_recognition_tpu.utils.numerics import to_cost_matrix

    bank = HMMBank.stack([
        GMMHMM(
            means=jnp.asarray(p[0], jnp.float32),
            log_vars=jnp.log(jnp.asarray(p[1], jnp.float32)),
            log_weights=jnp.log(jnp.asarray(p[2], jnp.float32)),
            trans_cost=jnp.asarray(to_cost_matrix(p[3])),
        )
        for p in word_params
    ])
    g = build_word_graph([p[3] for p in word_params], label_matrix)
    nll = bank_nll(bank, jnp.asarray(x, jnp.float32))[:, g.bank_state]
    res = viterbi(nll, jnp.asarray(g.trans), jnp.asarray(g.init_cost),
                  jnp.int32(t_len), eps_trans=jnp.asarray(g.eps_trans),
                  eps_depth=g.eps_depth)
    best_ours = float(np.min(np.asarray(res.final_cost)[g.end_states]))
    np.testing.assert_allclose(best_ours, best_ref, rtol=1e-4)

    # word sequences agree (reference path state ids -> our slots)
    end_state = int(g.end_states[np.argmin(np.asarray(res.final_cost)[g.end_states])])
    states, flags = viterbi_backtrace(
        res.bp, res.eps_bp, np.int32(end_state), np.int32(t_len), eps_depth=g.eps_depth
    )
    from speech_recognition_tpu.decode.connected import states_to_words

    ours_words = states_to_words(g, np.asarray(states), t_len, np.asarray(flags))

    # map reference seq positions to our graph enumeration order (the
    # reference reuses the same GMM objects across layers, so map by
    # position, not identity)
    pos_to_emit = {}
    k = 0
    for i, st in enumerate(seq):
        if type(st) is not ref.hmm_state.NES:
            pos_to_emit[i] = k
            k += 1
    ref_path_states = [p[0] for p in reversed(path_ref.tolist())]
    best_end = min(end_pts, key=lambda e: costs_ref[e, -1])
    ref_path_states.append(best_end)
    ref_slots = []
    for r in ref_path_states:
        if int(r) in pos_to_emit:
            ref_slots.append(int(g.slot[pos_to_emit[int(r)]]))
    ref_words = []
    prev = -1
    for sl in ref_slots:
        if sl != prev:
            ref_words.append(int(g.slot_label[sl]))
            prev = sl
    assert ours_words == ref_words


def test_reference_training_agreement(rng):
    """Train the reference HMM.fit and our fit_hmm on the same templates;
    both classifiers must make the same decisions on held-out data."""
    import jax

    from speech_recognition_tpu.data.synthetic import random_gmm_hmm, sample_hmm_features
    from speech_recognition_tpu.config import HMMConfig, TrainConfig
    from speech_recognition_tpu.decode.isolated import classify_batch
    from speech_recognition_tpu.models.hmm import HMMBank
    from speech_recognition_tpu.train.isolated import fit_hmm

    import jax.numpy as jnp

    n_classes, s, d = 3, 5, 6
    gen_params = [random_gmm_hmm(rng, n_states=s, n_mix=1, dim=d, sep=5.0)
                  for _ in range(n_classes)]

    def sample(c, n):
        out = []
        for _ in range(n):
            f, _ = sample_hmm_features(gen_params[c], rng, min_frames_per_state=2)
            out.append(f)
        return out

    train = {c: sample(c, 4) for c in range(n_classes)}
    test = [(c, f) for c in range(n_classes) for f in sample(c, 3)]

    # reference training (seeded numpy RNG for its unseeded kmeans).
    # n_gaussians=4 because the reference's own int(np.log(n)) split-count
    # quirk makes n_gaussians=2 assert (0 splits) — "4" trains 2 mixtures.
    np.random.seed(0)
    ref_models = []
    for c in range(n_classes):
        h = ref.hmm.HMM(s)
        ref_models.append(h.fit(train[c], n_gaussians=4, use_gmm=True, use_em=False))

    def ref_classify(x):
        costs = [m.evaluate(x) for m in ref_models]
        return int(np.argmin(costs))

    ref_preds = [ref_classify(f) for _, f in test]

    # our training
    ours = [
        fit_hmm(jax.random.PRNGKey(c), train[c], use_em=False,
                hmm_cfg=HMMConfig(n_states=s, n_mix=2, var_floor=1e-4),
                train_cfg=TrainConfig())
        for c in range(n_classes)
    ]
    bank = HMMBank.stack(ours)
    tmax = max(f.shape[0] for _, f in test)
    fb = np.zeros((len(test), tmax, d), np.float32)
    nb = np.zeros((len(test),), np.int32)
    for i, (_, f) in enumerate(test):
        fb[i, : f.shape[0]] = f
        nb[i] = f.shape[0]
    our_preds, _ = classify_batch(bank, jnp.asarray(fb), jnp.asarray(nb))
    our_preds = [int(p) for p in np.asarray(our_preds)]

    labels = [c for c, _ in test]
    ref_acc = np.mean([p == l for p, l in zip(ref_preds, labels)])
    our_acc = np.mean([p == l for p, l in zip(our_preds, labels)])
    # both should solve this easy task; ours must not be worse
    assert ref_acc >= 0.8
    assert our_acc >= ref_acc
    agreement = np.mean([a == b for a, b in zip(ref_preds, our_preds)])
    assert agreement >= 0.85, (ref_preds, our_preds)


def test_reference_skmeans_agreement(rng):
    """Segmental K-means vs the real reference skmeans on identical
    templates.  With update_seg_lens=False (the reference freezes its
    transition costs at the uniform initial cut) both are deterministic
    and should converge to near-identical segment statistics."""
    d, s = 5, 4
    centers = rng.normal(0, 4, (s, d))
    temps = []
    for _ in range(5):
        frames = []
        for si in range(s):
            n = int(rng.integers(6, 12))
            frames.append(centers[si] + 0.3 * rng.standard_normal((n, d)))
        temps.append(np.concatenate(frames))

    ref_means, ref_vars, ref_trans = ref.kmeans.skmeans(temps, s)

    from speech_recognition_tpu.train.skmeans import skmeans

    means, variances, trans, states, _ = skmeans(
        [t.copy() for t in temps], s, update_seg_lens=False
    )
    np.testing.assert_allclose(means, ref_means, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(variances, ref_vars, rtol=1e-3, atol=1e-3)
    finite = np.isfinite(ref_trans)
    np.testing.assert_allclose(trans[finite], ref_trans[finite], rtol=1e-5)
    assert np.array_equal(np.isfinite(trans), finite)


def test_reference_text_viterbi_agreement():
    """Text Viterbi cost vs the real reference spellchecker on a word
    list where the reference's words.remove iteration bug cannot trigger
    (no two words share an end position within a recursion group)."""
    import sr.langmodel.lextree as ref_lextree
    import sr.langmodel.spellchecker as ref_spell

    from speech_recognition_tpu.langmodel.lextree import lextree_from_words
    from speech_recognition_tpu.langmodel.spellcheck import text_viterbi

    words = ["cat", "care", "do", "door", "apple"]
    for text in ["cat", "cta", "doorr", "aple", "zzz", "caredo"]:
        ref_tree = ref_lextree.lextree_from_words(list(words))
        ref_cost, ref_match = ref_spell.text_viterbi(text, ref_tree)
        tree = lextree_from_words(list(words))
        cost, match = text_viterbi(text, tree)
        assert cost == pytest.approx(float(ref_cost)), (text, match, ref_match)
