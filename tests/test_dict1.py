"""The reference's own 6,250-word dictionary
(``/root/reference/tests/test_data/dict1.txt``) on the production lex
path: full-dict plan structure (block-banded staircase selectors +
factored expansion fit the VMEM envelope), and interpret-mode kernel
bit-parity vs the XLA scan on a deterministic subset large enough to
exercise the banded format (multiple 128-row blocks per level).

The on-chip twin (full dict, real TPU) is scripts/exp_dict1_chip.py;
its parity assert and throughput rows are recorded in RESULTS.md.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from speech_recognition_tpu.models.lexgraph import build_lex_graph
from speech_recognition_tpu.ops.viterbi_banded import (
    banded_backtrace_tb,
    viterbi_banded_tb,
)
from speech_recognition_tpu.ops.viterbi_lex_pallas import (
    lex_backtrace_soa_pallas,
    lex_pallas_batch_chunk,
    lex_pallas_plan,
    viterbi_lex_pallas,
)

DICT1 = "/root/reference/tests/test_data/dict1.txt"


def load_dict1():
    words = [line.strip() for line in open(DICT1)][1:]
    seen, out = set(), []
    for w in words:
        if w and w not in seen:  # dict1 carries 2 duplicate entries
            seen.add(w)
            out.append(w)
    return out


def ltr(S, rng):
    t = np.full((S, S), np.inf)
    for i in range(S):
        t[i, i] = rng.uniform(0.1, 1)
        if i + 1 < S:
            t[i + 1, i] = rng.uniform(0.1, 1)
    return t


@pytest.mark.skipif(not os.path.exists(DICT1), reason="reference dict absent")
def test_dict1_full_plan_fits(rng):
    """The FULL 6,247-word dictionary builds a Pallas plan inside the
    single-chip VMEM envelope (the round-2 ceiling was ~2k words)."""
    words = load_dict1()
    assert len(words) >= 6200
    units = sorted(set("".join(words)))
    unit_ids = {ch: i for i, ch in enumerate(units)}
    lexg = build_lex_graph(words, [ltr(3, rng) for _ in units], unit_ids,
                           word_insertion_cost=0.5)
    plan = lex_pallas_plan(lexg)
    assert plan.topo.sel_banded and plan.topo.expand_factored
    assert plan.topo.eps_rowconst
    # selectors are block-banded: bytes ~ A_nr * W, not sum n_d*n_{d+1}
    sel_bytes = sum(int(np.prod(s.shape)) * s.dtype.itemsize
                    for s in plan.sels)
    assert sel_bytes < 16 * 2**20
    # the STATE-MAJOR layout does NOT fit at dict1 scale: batch rides
    # the lane axis, Mosaic pads lanes to 128, so every live plane is
    # 42 MB at any batch (round-4 fix: the round-3 byte model missed
    # the lane padding and an on-chip run OOMed; the wide layout is
    # the dict1 path)
    assert lex_pallas_batch_chunk(plan, 64) == 0
    from speech_recognition_tpu.ops.viterbi_lex_pallas import (
        lex_pallas_lattice_batch_chunk,
        lex_pallas_wide_batch_chunk,
    )

    wplan = lex_pallas_plan(lexg, layout="wide")
    assert lex_pallas_wide_batch_chunk(wplan, 64) >= 16
    assert lex_pallas_lattice_batch_chunk(wplan, 16) >= 8
    assert lex_pallas_lattice_batch_chunk(plan, 16) == 0


@pytest.mark.skipif(not os.path.exists(DICT1), reason="reference dict absent")
def test_dict1_subset_interpret_parity(rng):
    """Interpret-mode kernel parity vs the XLA scan on a 1,500-word
    deterministic subset of dict1 (real charset/trie shape, multiple
    banded selector blocks), variable lengths, eps_prev value walk."""
    words = load_dict1()[::4][:1500]
    units = sorted(set("".join(words)))
    unit_ids = {ch: i for i, ch in enumerate(units)}
    su = 3
    lexg = build_lex_graph(words, [ltr(su, rng) for _ in units], unit_ids,
                           word_insertion_cost=0.5)
    plan = lex_pallas_plan(lexg, sel_mode="banded", expand_mode="factored")
    assert len(plan.topo.sel_blocks) > 8  # multiple staircase blocks

    T, B = 8, 8
    e = rng.uniform(0, 5, (T, len(units) * su, B)).astype(np.float32)
    nf = np.array([T, 5, T, 2, 6, T, 1, 7], np.int32)
    bank_state = np.asarray(lexg.banded.bank_state)
    nll_tsb = jnp.asarray(e)[:, bank_state, :]
    fin_x, bp_x, eu_x = viterbi_banded_tb(nll_tsb, lexg.banded,
                                          jnp.asarray(nf))
    fin_p, bp_p, eu_p, ep_p = viterbi_lex_pallas(
        jnp.asarray(e), plan, jnp.asarray(nf), plan.topo, interpret=True,
        emit_eps_prev=True)
    live = plan.state_of_soa >= 0
    fin_p_orig = np.full((lexg.n_states, B), np.nan, np.float32)
    fin_p_orig[plan.state_of_soa[live]] = np.asarray(fin_p)[live]
    np.testing.assert_array_equal(fin_p_orig, np.asarray(fin_x))

    ends = np.asarray(lexg.banded.end_states)
    costs = np.asarray(fin_x)[ends] + np.asarray(
        lexg.banded.end_bonus)[:, None]
    best = np.argmin(costs, axis=0)
    s_x, f_x = banded_backtrace_tb(bp_x, eu_x, lexg.banded,
                                   jnp.asarray(ends[best]), jnp.asarray(nf))
    s_p, f_p = lex_backtrace_soa_pallas(
        bp_p, eu_p, plan, jnp.asarray(np.asarray(plan.ends_soa)[best]),
        jnp.asarray(nf), plan.topo, interpret=True, eps_prev=ep_p)
    s_p_orig = plan.state_of_soa[np.asarray(s_p)]
    for i in range(B):
        n = int(nf[i])
        np.testing.assert_array_equal(s_p_orig[:n, i],
                                      np.asarray(s_x)[:n, i])
        np.testing.assert_array_equal(np.asarray(f_p)[:n, i],
                                      np.asarray(f_x)[:n, i])


@pytest.mark.skipif(not os.path.exists(DICT1), reason="reference dict absent")
def test_dict1_uniform_lm_reproduces_pass1(rng):
    """Property test at full dict1 scale (CPU interpret): rescoring the
    wide-kernel lattice with a FLAT (all-zero) bigram reproduces the
    plain pass-1 decode — words and costs — so the tau/Q/H algebra is
    sound on the reference's own dictionary
    (``/root/reference/tests/test_data/dict1.txt``)."""
    from speech_recognition_tpu.langmodel.bigram import uniform_bigram
    from speech_recognition_tpu.models.lexgraph import lex_words_from_path
    from speech_recognition_tpu.ops.lattice import (
        lattice_rescore,
        lattice_words,
    )
    from speech_recognition_tpu.ops.viterbi_lex_pallas import (
        viterbi_lex_pallas_wide_lattice,
    )

    words = load_dict1()
    units = sorted(set("".join(words)))
    unit_ids = {ch: i for i, ch in enumerate(units)}
    su = 3
    wic = 0.4
    lexg = build_lex_graph(words, [ltr(su, rng) for _ in units], unit_ids,
                           word_insertion_cost=wic)
    plan = lex_pallas_plan(lexg, layout="wide")
    assert plan.topo.lane_major and plan.topo.sel_banded

    T, B = 6, 4
    e = rng.uniform(0, 5, (T, len(units) * su, B)).astype(np.float32)
    nf = np.array([T, 3, T, 5], np.int32)
    ends_p, taus_p = viterbi_lex_pallas_wide_lattice(
        jnp.asarray(e), plan, jnp.asarray(nf), plan.topo, interpret=True)

    lm0 = uniform_bigram(len(words), flat=True)
    res = lattice_rescore(
        ends_p, taus_p, jnp.asarray(lexg.leaf_word),
        jnp.asarray(lm0.cost), jnp.asarray(lm0.start_cost),
        jnp.asarray(lm0.end_cost), jnp.asarray(nf))
    w_resc = lattice_words(res, lexg.leaf_word, nf)

    # pass-1 ground truth on the XLA banded scan
    g = lexg.banded
    bank_state = np.asarray(g.bank_state)
    nll_tb = jnp.asarray(e)[:, bank_state, :]
    fin_x, bp_x, eu_x = viterbi_banded_tb(nll_tb, g, jnp.asarray(nf))
    ends = np.asarray(g.end_states)
    costs = np.asarray(fin_x)[ends] + np.asarray(g.end_bonus)[:, None]
    best = np.argmin(costs, axis=0)
    pass1 = costs[best, np.arange(B)]
    np.testing.assert_allclose(np.asarray(res.cost), pass1, rtol=1e-6)
    s_x, f_x = banded_backtrace_tb(bp_x, eu_x, g, jnp.asarray(ends[best]),
                                   jnp.asarray(nf))
    for i in range(B):
        w_ref = lex_words_from_path(lexg, np.asarray(s_x)[:, i], int(nf[i]),
                                    np.asarray(f_x)[:, i])
        assert w_resc[i] == w_ref, i


@pytest.mark.skipif(not os.path.exists(DICT1), reason="reference dict absent")
def test_dict1_subset_chunk_seam_parity(rng):
    """The batch-chunk seam of ``decode_lextree_bigram``
    (``ops/lattice.py`` pad/concat path: b_pad > b, nf_p=1 filler
    streams) at real dict1 trie shapes: a 600-word subset with banded
    staircase selectors, batch 5 forced through bc=2 wide-lattice
    chunks (2+2+2 with one filler), asserted bit-equal per stream to
    the unchunked XLA path (round-4 VERDICT weak item 7)."""
    from speech_recognition_tpu.data.synthetic import random_gmm_hmm
    from speech_recognition_tpu.langmodel.bigram import fit_bigram
    from speech_recognition_tpu.models.hmm import GMMHMM, HMMBank
    from speech_recognition_tpu.ops.lattice import decode_lextree_bigram
    from speech_recognition_tpu.utils.numerics import to_cost_matrix

    words = load_dict1()[::10][:600]
    units = sorted(set("".join(words)))
    unit_ids = {ch: i for i, ch in enumerate(units)}
    nprng = np.random.default_rng(9)
    models, u_trans = [], []
    for _ in units:
        p = random_gmm_hmm(nprng, n_states=3, n_mix=1, dim=6, sep=6.0)
        models.append(GMMHMM(
            means=jnp.asarray(p["means"], jnp.float32),
            log_vars=jnp.log(jnp.asarray(p["variances"], jnp.float32)),
            log_weights=jnp.log(jnp.asarray(p["weights"], jnp.float32)),
            trans_cost=jnp.asarray(to_cost_matrix(p["trans"])),
        ))
        u_trans.append(p["trans"])
    bank = HMMBank.stack(models)
    lexg = build_lex_graph(words, u_trans, unit_ids,
                           word_insertion_cost=0.3)
    from speech_recognition_tpu.decode.lextree import _lex_plan_cached

    wplan = _lex_plan_cached(lexg, layout="wide")
    assert wplan is not None and wplan.topo.sel_banded  # dict1-shaped plan

    lm = fit_bigram([[int(x) for x in nprng.integers(0, len(words), 7)]
                     for _ in range(40)], len(words))
    b, t = 5, 18
    feats = nprng.standard_normal((b, t, 6)).astype(np.float32)
    nfs = np.array([t, 9, t, 4, 13], np.int32)
    sx, cx = decode_lextree_bigram(bank, lexg, lm, feats, nfs,
                                   backend="xla")
    sc, cc = decode_lextree_bigram(bank, lexg, lm, feats, nfs,
                                   backend="pallas-wide-interpret",
                                   batch_chunk=2)
    assert sx == sc
    np.testing.assert_allclose(cx, cc, rtol=1e-6)
