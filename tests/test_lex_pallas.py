"""Pallas lexical-tree kernel: bit-parity with the XLA banded kernel
(modulo the static SoA renumbering), interpret mode on CPU."""

import jax.numpy as jnp
import numpy as np
import pytest

from speech_recognition_tpu.models.lexgraph import (
    build_lex_graph,
    lex_words_from_path,
)
from speech_recognition_tpu.ops.viterbi_banded import (
    banded_backtrace_tb,
    viterbi_banded_tb,
)
from speech_recognition_tpu.ops.viterbi_lex_pallas import (
    lex_backtrace_soa,
    lex_backtrace_soa_pallas,
    lex_pallas_plan,
    viterbi_lex_pallas,
)
from speech_recognition_tpu.utils.numerics import POS_INF


def ltr(S, rng, skip=True):
    t = np.full((S, S), np.inf)
    for i in range(S):
        t[i, i] = rng.uniform(0.1, 1)
        if i + 1 < S:
            t[i + 1, i] = rng.uniform(0.1, 1)
        if skip and i + 2 < S:
            t[i + 2, i] = rng.uniform(0.5, 2)
    return t


def make_lexg(rng, words=None, unigram=False, su=3):
    words = words or ["aa", "ab", "abb", "ba", "b", "cab", "ca"]
    units = sorted(set("".join(words)))
    unit_ids = {ch: i for i, ch in enumerate(units)}
    unit_trans = [ltr(su, rng, skip=(i % 2 == 0)) for i in range(len(units))]
    uni = rng.uniform(0.5, 3.0, len(words)).astype(np.float32) \
        if unigram else None
    lexg = build_lex_graph(words, unit_trans, unit_ids, unigram_cost=uni,
                           word_insertion_cost=0.4)
    return lexg, unit_trans, unit_ids, units


def run_both(lexg, e_tub, nf):
    """XLA reference vs Pallas (interpret): final costs, states, flags."""
    t_len, u, b = e_tub.shape
    bank_state = np.asarray(lexg.banded.bank_state)
    nll_tsb = jnp.asarray(e_tub)[:, bank_state, :]  # [T, S, B]
    fin_x, bp_x, eu_x = viterbi_banded_tb(nll_tsb, lexg.banded,
                                          jnp.asarray(nf))

    plan = lex_pallas_plan(lexg)
    fin_p, bp_p, eu_p = viterbi_lex_pallas(
        jnp.asarray(e_tub), plan, jnp.asarray(nf), plan.topo, interpret=True)

    # remap Pallas SoA finals to original numbering
    live = plan.state_of_soa >= 0
    fin_p_orig = np.full((lexg.n_states, b), np.nan, np.float32)
    fin_p_orig[plan.state_of_soa[live]] = np.asarray(fin_p)[live]
    np.testing.assert_array_equal(fin_p_orig, np.asarray(fin_x))

    # best ends and backtraces
    ends = np.asarray(lexg.banded.end_states)
    bonus = np.asarray(lexg.banded.end_bonus)
    costs = np.asarray(fin_x)[ends] + bonus[:, None]  # [L, B]
    best = np.argmin(costs, axis=0)
    end_x = jnp.asarray(ends[best])
    s_x, f_x = banded_backtrace_tb(bp_x, eu_x, lexg.banded, end_x,
                                   jnp.asarray(nf))

    soa_of_state = np.full(lexg.n_states, -1, np.int64)
    soa_of_state[plan.state_of_soa[live]] = np.nonzero(live)[0]
    end_p = jnp.asarray(np.asarray(plan.ends_soa)[best])
    s_p, f_p = lex_backtrace_soa(bp_p, eu_p, plan, end_p, jnp.asarray(nf),
                                 plan.topo)
    # the Pallas backtrace must match the XLA SoA backtrace bit-for-bit
    s_pp, f_pp = lex_backtrace_soa_pallas(bp_p, eu_p, plan, end_p,
                                          jnp.asarray(nf), plan.topo,
                                          interpret=True)
    for i in range(b):
        n = int(nf[i])
        np.testing.assert_array_equal(np.asarray(s_pp)[:n, i],
                                      np.asarray(s_p)[:n, i])
        np.testing.assert_array_equal(np.asarray(f_pp)[:n, i],
                                      np.asarray(f_p)[:n, i])
    s_p_orig = plan.state_of_soa[np.asarray(s_p)]
    for i in range(b):
        n = int(nf[i])
        np.testing.assert_array_equal(s_p_orig[:n, i],
                                      np.asarray(s_x)[:n, i])
        np.testing.assert_array_equal(np.asarray(f_p)[:n, i],
                                      np.asarray(f_x)[:n, i])
        w_x = lex_words_from_path(lexg, np.asarray(s_x)[:, i], n,
                                  np.asarray(f_x)[:, i])
        w_p = lex_words_from_path(lexg, s_p_orig[:, i], n,
                                  np.asarray(f_p)[:, i])
        assert w_x == w_p
    return costs[best, np.arange(b)]


@pytest.mark.parametrize("unigram", [False, True])
def test_lex_pallas_parity_deep_tree(rng, unigram):
    lexg, unit_trans, unit_ids, units = make_lexg(rng, unigram=unigram)
    su = 3
    T, B = 33, 8
    e = rng.uniform(0, 5, (T, len(units) * su, B)).astype(np.float32)
    nf = np.array([T, 19, 7, T, 12, 25, 1, T], np.int32)
    run_both(lexg, e, nf)


def test_lex_pallas_parity_bigger_vocab(rng):
    """~200-word trie: multiple levels, chains, branch points."""
    units = list("abcde")
    unit_ids = {ch: i for i, ch in enumerate(units)}
    unit_trans = [ltr(3, rng, skip=False) for _ in units]
    nprng = np.random.default_rng(3)
    vocab = set()
    while len(vocab) < 200:
        n = int(nprng.integers(2, 7))
        vocab.add("".join(nprng.choice(units, n)))
    words = sorted(vocab)
    lexg = build_lex_graph(words, unit_trans, unit_ids,
                           word_insertion_cost=0.5)
    T, B = 24, 8
    e = rng.uniform(0, 5, (T, len(units) * 3, B)).astype(np.float32)
    nf = np.array([T, 11, T, 5, 17, T, 2, 9], np.int32)
    run_both(lexg, e, nf)


def test_lex_pallas_parity_flat_vocab(rng):
    """Flat vocabulary (the 11-digit shape: every word one arc, no
    cross edges, per-row bigram eps block) — the path the CLI's
    --graph lextree takes on TPU."""
    from speech_recognition_tpu.langmodel.bigram import fit_bigram

    words = list("123456789OZ")
    unit_ids = {ch: i for i, ch in enumerate(words)}
    unit_trans = [ltr(5, rng) for _ in words]
    lm = fit_bigram([[0, 1, 2, 3, 4], [10, 9, 8], [5, 6, 7, 0]], len(words))
    lexg = build_lex_graph(words, unit_trans, unit_ids, lm=lm,
                           word_insertion_cost=0.2)
    plan = lex_pallas_plan(lexg)
    assert not plan.topo.eps_rowconst  # bigram rows vary
    assert len(plan.sels) == 0  # no cross edges
    T, B = 27, 8
    e = rng.uniform(0, 5, (T, len(words) * 5, B)).astype(np.float32)
    nf = np.array([T, 13, 1, T, 8, 21, T, 5], np.int32)
    run_both(lexg, e, nf)


def test_lex_pallas_int8_selector_mode(rng):
    """The large-vocabulary selector format (int8 singles, three MXU
    passes per level) must be bit-identical to the bf16x3 fast path."""
    import jax.numpy as jnp

    lexg, unit_trans, unit_ids, units = make_lexg(rng, unigram=True)
    plan = lex_pallas_plan(lexg)
    assert plan.topo.sel_tripled  # small vocab picks the fast format
    n_levels = len(plan.sels)
    sels_int8 = tuple(
        jnp.asarray(np.asarray(s, np.float32)[:, : s.shape[1] // 3], jnp.int8)
        for s in plan.sels)
    plan8 = plan._replace(sels=sels_int8,
                          topo=plan.topo._replace(sel_tripled=False))

    T, B = 21, 8
    e = rng.uniform(0, 5, (T, len(units) * 3, B)).astype(np.float32)
    nf = np.array([T, 9, T, 4, 15, T, 1, 12], np.int32)
    fin_a, bp_a, eu_a = viterbi_lex_pallas(jnp.asarray(e), plan,
                                           jnp.asarray(nf), plan.topo,
                                           interpret=True)
    fin_b, bp_b, eu_b = viterbi_lex_pallas(jnp.asarray(e), plan8,
                                           jnp.asarray(nf), plan8.topo,
                                           interpret=True)
    np.testing.assert_array_equal(np.asarray(fin_a), np.asarray(fin_b))
    np.testing.assert_array_equal(np.asarray(bp_a), np.asarray(bp_b))
    np.testing.assert_array_equal(np.asarray(eu_a), np.asarray(eu_b))
    assert n_levels == len(plan8.sels)


def test_lex_pallas_decode_api(rng):
    """decode_lextree with backend='pallas-interpret' equals the XLA
    path (words and costs) on GMM-bank features."""
    from speech_recognition_tpu.data.synthetic import random_gmm_hmm
    from speech_recognition_tpu.decode.lextree import decode_lextree
    from speech_recognition_tpu.models.hmm import GMMHMM, HMMBank
    from speech_recognition_tpu.utils.numerics import to_cost_matrix

    units = list("abcd")
    unit_ids = {ch: i for i, ch in enumerate(units)}
    D = 6
    nprng = np.random.default_rng(5)
    models, unit_trans, means = [], [], []
    for _ in units:
        p = random_gmm_hmm(nprng, n_states=3, n_mix=1, dim=D, sep=6.0)
        models.append(GMMHMM(
            means=jnp.asarray(p["means"], jnp.float32),
            log_vars=jnp.log(jnp.asarray(p["variances"], jnp.float32)),
            log_weights=jnp.log(jnp.asarray(p["weights"], jnp.float32)),
            trans_cost=jnp.asarray(to_cost_matrix(p["trans"])),
        ))
        unit_trans.append(p["trans"])
        means.append(p["means"][:, 0, :])
    bank = HMMBank.stack(models)
    words = ["ab", "abc", "ba", "d", "ca"]
    lexg = build_lex_graph(words, unit_trans, unit_ids,
                           word_insertion_cost=0.5)

    paths = [["ab", "d"], ["ca", "ba"], ["abc"]]
    feats, nfs, refs = [], [], []
    for seq in paths:
        fs = []
        for w in seq:
            for ch in w:
                m = means[unit_ids[ch]]
                for j in range(m.shape[0]):
                    fs.extend([m[j]] * 3)
        feats.append(np.asarray(fs, np.float32))
        nfs.append(len(fs))
        refs.append([words.index(w) for w in seq])
    tmax = max(nfs)
    x = np.zeros((len(paths), tmax, D), np.float32)
    for i, f in enumerate(feats):
        x[i, : len(f)] = f
    nfs = np.asarray(nfs, np.int32)

    seqs_x, costs_x = decode_lextree(bank, lexg, x, nfs, backend="xla")
    seqs_p, costs_p = decode_lextree(bank, lexg, x, nfs,
                                     backend="pallas-interpret")
    assert seqs_p == seqs_x == refs
    np.testing.assert_array_equal(costs_p, costs_x)


def test_lex_pallas_unused_trailing_bank_units(rng):
    """Bank emissions with MORE rows than the lexicon references
    (vocab over units 0..1 of a 4-unit bank): u_in > ceil8(max bank
    row), which used to crash viterbi_lex_pallas with a negative pad
    width (advisor finding, round 2).  The extra rows are unreferenced
    and must simply be sliced away, with full parity kept."""
    su = 3
    units4 = list("abcd")
    unit_ids = {ch: i for i, ch in enumerate(units4)}
    unit_trans = [ltr(su, rng, skip=False) for _ in units4]
    words = ["ab", "ba", "a", "bb"]  # only units a, b referenced
    lexg = build_lex_graph(words, unit_trans, unit_ids,
                           word_insertion_cost=0.3)
    assert int(np.asarray(lexg.banded.bank_state).max()) + 1 < len(units4) * su
    T, B = 19, 8
    e = rng.uniform(0, 5, (T, len(units4) * su, B)).astype(np.float32)
    nf = np.array([T, 9, T, 4, 15, T, 1, 12], np.int32)
    run_both(lexg, e, nf)


def _mk_vocab(rng, n_words=220, units="abcde"):
    units = list(units)
    unit_ids = {ch: i for i, ch in enumerate(units)}
    unit_trans = [ltr(3, rng, skip=False) for _ in units]
    nprng = np.random.default_rng(7)
    vocab = set()
    while len(vocab) < n_words:
        n = int(nprng.integers(2, 8))
        vocab.add("".join(nprng.choice(units, n)))
    lexg = build_lex_graph(sorted(vocab), unit_trans, unit_ids,
                           word_insertion_cost=0.4)
    return lexg, units


def test_lex_pallas_banded_and_factored_modes(rng):
    """Reference-dictionary-scale kernel formats — block-banded
    staircase selectors and the factored int8 unit expansion — are
    bit-identical to the default dense formats (and hence to the XLA
    kernel, via run_both's asserts on the default plan)."""
    import jax.numpy as jnp

    from speech_recognition_tpu.ops.viterbi_lex_pallas import (
        lex_pallas_batch_chunk,
        lex_pallas_fits,
    )

    lexg, units = _mk_vocab(rng)
    T, B = 23, 8
    e = rng.uniform(0, 5, (T, len(units) * 3, B)).astype(np.float32)
    nf = np.array([T, 9, T, 4, 15, T, 1, 12], np.int32)
    run_both(lexg, e, nf)  # default plan vs XLA (sanity)

    ref_plan = lex_pallas_plan(lexg)
    fin_r, bp_r, eu_r = viterbi_lex_pallas(
        jnp.asarray(e), ref_plan, jnp.asarray(nf), ref_plan.topo,
        interpret=True)
    for kwargs in ({"sel_mode": "banded"},
                   {"expand_mode": "factored"},
                   {"sel_mode": "banded", "expand_mode": "factored"},
                   {"sel_mode": "int8", "expand_mode": "factored"}):
        plan = lex_pallas_plan(lexg, **kwargs)
        if "banded" in kwargs.values():
            assert plan.topo.sel_banded and len(plan.sels) == 1
        fin, bp, eu = viterbi_lex_pallas(
            jnp.asarray(e), plan, jnp.asarray(nf), plan.topo,
            interpret=True)
        np.testing.assert_array_equal(np.asarray(fin_r), np.asarray(fin),
                                      err_msg=str(kwargs))
        np.testing.assert_array_equal(np.asarray(bp_r), np.asarray(bp),
                                      err_msg=str(kwargs))
        np.testing.assert_array_equal(np.asarray(eu_r), np.asarray(eu),
                                      err_msg=str(kwargs))
        assert lex_pallas_fits(plan, B)
        assert lex_pallas_batch_chunk(plan, 512) >= 8


def test_lex_pallas_eps_prev_value_backtrace(rng):
    """emit_eps_prev + the single-lookup value backtrace are
    bit-identical to the two-lookup walk, on both rowconst (wic) and
    per-root (flat bigram) eps formats."""
    import jax.numpy as jnp

    cases = []
    lexg, units = _mk_vocab(rng, n_words=60)
    cases.append((lexg, len(units) * 3))
    from speech_recognition_tpu.langmodel.bigram import fit_bigram

    words = list("12345")
    unit_ids = {ch: i for i, ch in enumerate(words)}
    unit_trans = [ltr(4, rng, skip=False) for _ in words]
    lm = fit_bigram([[0, 1, 2], [4, 3], [2, 2, 0]], len(words))
    lexf = build_lex_graph(words, unit_trans, unit_ids, lm=lm,
                           word_insertion_cost=0.2)
    cases.append((lexf, len(words) * 4))

    for lexg_, nbank in cases:
        plan = lex_pallas_plan(lexg_)
        T, B = 21, 8
        e = rng.uniform(0, 5, (T, nbank, B)).astype(np.float32)
        nf = np.array([T, 9, T, 4, 15, T, 1, 12], np.int32)
        fin, bp, eu = viterbi_lex_pallas(
            jnp.asarray(e), plan, jnp.asarray(nf), plan.topo, interpret=True)
        fin2, bp2, eu2, ep2 = viterbi_lex_pallas(
            jnp.asarray(e), plan, jnp.asarray(nf), plan.topo, interpret=True,
            emit_eps_prev=True)
        np.testing.assert_array_equal(np.asarray(fin), np.asarray(fin2))
        np.testing.assert_array_equal(np.asarray(bp), np.asarray(bp2))
        np.testing.assert_array_equal(np.asarray(eu), np.asarray(eu2))
        ends = np.asarray(plan.ends_soa)
        costs = np.asarray(fin)[ends, :]
        best = np.argmin(costs, axis=0)
        endv = jnp.asarray(ends[best])
        s_a, f_a = lex_backtrace_soa_pallas(bp, eu, plan, endv,
                                            jnp.asarray(nf), plan.topo,
                                            interpret=True)
        s_b, f_b = lex_backtrace_soa_pallas(bp2, eu2, plan, endv,
                                            jnp.asarray(nf), plan.topo,
                                            interpret=True, eps_prev=ep2)
        for i in range(B):
            n = int(nf[i])
            np.testing.assert_array_equal(np.asarray(s_a)[:n, i],
                                          np.asarray(s_b)[:n, i])
            np.testing.assert_array_equal(np.asarray(f_a)[:n, i],
                                          np.asarray(f_b)[:n, i])


def test_lex_pallas_wide_layout_parity(rng):
    """Lane-major ([B, S]) kernel for dictionary-scale graphs: finals,
    backtrace states and eps flags bit-match the XLA kernel."""
    import jax.numpy as jnp

    from speech_recognition_tpu.ops.viterbi_lex_pallas import (
        lex_backtrace_wide,
        viterbi_lex_pallas_wide,
    )

    lexg, units = _mk_vocab(rng, n_words=220)
    plan = lex_pallas_plan(lexg, layout="wide")
    assert plan.topo.lane_major and plan.topo.expand_factored
    assert all(s % 128 == 0 for s in plan.topo.level_sizes)

    T, B = 21, 8
    e = rng.uniform(0, 5, (T, len(units) * 3, B)).astype(np.float32)
    nf = np.array([T, 9, T, 4, 15, T, 1, 12], np.int32)
    bank_state = np.asarray(lexg.banded.bank_state)
    nll_tsb = jnp.asarray(e)[:, bank_state, :]
    fin_x, bp_x, eu_x = viterbi_banded_tb(nll_tsb, lexg.banded,
                                          jnp.asarray(nf))
    fin_w, bp_w, eu_w, ep_w = viterbi_lex_pallas_wide(
        jnp.asarray(e), plan, jnp.asarray(nf), plan.topo, interpret=True)
    live = plan.state_of_soa >= 0
    fin_w_orig = np.full((lexg.n_states, B), np.nan, np.float32)
    fin_w_orig[plan.state_of_soa[live]] = np.asarray(fin_w).T[live]
    np.testing.assert_array_equal(fin_w_orig, np.asarray(fin_x))

    ends = np.asarray(lexg.banded.end_states)
    bonus = np.asarray(lexg.banded.end_bonus)
    costs = np.asarray(fin_x)[ends] + bonus[:, None]
    best = np.argmin(costs, axis=0)
    s_x, f_x = banded_backtrace_tb(bp_x, eu_x, lexg.banded,
                                   jnp.asarray(ends[best]), jnp.asarray(nf))
    end_soa = jnp.asarray(np.asarray(plan.ends_soa)[best])
    s_w, f_w = lex_backtrace_wide(bp_w, eu_w, ep_w, plan, end_soa,
                                  jnp.asarray(nf), plan.topo, interpret=True)
    s_w_orig = plan.state_of_soa[np.asarray(s_w)]
    for i in range(B):
        n = int(nf[i])
        np.testing.assert_array_equal(s_w_orig[:n, i],
                                      np.asarray(s_x)[:n, i])
        np.testing.assert_array_equal(np.asarray(f_w)[:n, i],
                                      np.asarray(f_x)[:n, i])


def test_decode_api_wide_backend(rng):
    """decode_lextree with backend='pallas-wide-interpret' equals the
    XLA path on GMM-bank features (the dictionary-scale glue)."""
    from speech_recognition_tpu.data.synthetic import random_gmm_hmm
    from speech_recognition_tpu.decode.lextree import decode_lextree
    from speech_recognition_tpu.models.hmm import GMMHMM, HMMBank
    from speech_recognition_tpu.utils.numerics import to_cost_matrix
    import jax.numpy as jnp

    units = list("abcd")
    unit_ids = {ch: i for i, ch in enumerate(units)}
    D = 6
    nprng = np.random.default_rng(5)
    models, unit_trans = [], []
    for _ in units:
        p = random_gmm_hmm(nprng, n_states=3, n_mix=1, dim=D, sep=6.0)
        models.append(GMMHMM(
            means=jnp.asarray(p["means"], jnp.float32),
            log_vars=jnp.log(jnp.asarray(p["variances"], jnp.float32)),
            log_weights=jnp.log(jnp.asarray(p["weights"], jnp.float32)),
            trans_cost=jnp.asarray(to_cost_matrix(p["trans"])),
        ))
        unit_trans.append(p["trans"])
    bank = HMMBank.stack(models)
    words = ["ab", "abc", "ba", "d", "ca"]
    lexg = build_lex_graph(words, unit_trans, unit_ids,
                           word_insertion_cost=0.5)
    feats = nprng.standard_normal((4, 22, D)).astype(np.float32)
    nfs = np.array([22, 13, 7, 18], np.int32)
    seqs_x, costs_x = decode_lextree(bank, lexg, feats, nfs, backend="xla")
    seqs_w, costs_w = decode_lextree(bank, lexg, feats, nfs,
                                     backend="pallas-wide-interpret")
    assert seqs_w == seqs_x
    np.testing.assert_array_equal(costs_w, costs_x)
