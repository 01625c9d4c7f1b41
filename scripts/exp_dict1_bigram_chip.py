"""Bigram LM x the reference's 6,250-word dictionary on the production
Pallas path (round-3 VERDICT item 1): on-chip exactness of the wide
lattice kernel + rescorer vs the XLA lattice scan on a short batch,
then per-stage timing at serving shapes (lattice kernel, leaf-slot
gather, rescore, full decode wall).

Run from /root/repo on TPU: python scripts/exp_dict1_bigram_chip.py
"""
import pathlib, sys, time
import numpy as np
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

DICT1 = "/root/reference/tests/test_data/dict1.txt"


def load_dict1():
    words = [l.strip() for l in open(DICT1)][1:]
    seen, out = set(), []
    for w in words:
        if w and w not in seen:
            seen.add(w); out.append(w)
    return out


def main():
    import jax, jax.numpy as jnp
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass
    from bench import _timeit_device, log
    from speech_recognition_tpu.langmodel.bigram import fit_bigram
    from speech_recognition_tpu.models.lexgraph import build_lex_graph
    from speech_recognition_tpu.ops.lattice import (
        lattice_rescore, lattice_words, rescore_backoff, viterbi_lattice_tb)
    from speech_recognition_tpu.ops.viterbi_lex_pallas import (
        lex_pallas_lattice_batch_chunk, lex_pallas_plan,
        viterbi_lex_pallas_wide_lattice)

    words = load_dict1()
    units = sorted(set("".join(words)))
    unit_ids = {ch: i for i, ch in enumerate(units)}
    rng = np.random.default_rng(0)
    su = 3

    def ltr(S):
        t = np.full((S, S), np.inf)
        for i in range(S):
            t[i, i] = rng.uniform(0.1, 1)
            if i + 1 < S:
                t[i + 1, i] = rng.uniform(0.1, 1)
        return t

    lexg = build_lex_graph(words, [ltr(su) for _ in units], unit_ids,
                           word_insertion_cost=0.5)
    plan = lex_pallas_plan(lexg, layout="wide")
    v = len(words)
    log(f"dict1: {v} words, {lexg.n_arcs} arcs, {lexg.n_states} states, "
        f"a_pad={plan.topo.a_pad}; lattice batch chunk at 16: "
        f"{lex_pallas_lattice_batch_chunk(plan, 16)}")
    lm = fit_bigram([[int(x) for x in rng.integers(0, v, 20)]
                     for _ in range(400)], v)
    bo = rescore_backoff(lm, lexg.leaf_word)
    log(f"backoff-sparse recombination: {'K=' + str(bo[1].shape[1]) if bo else 'DENSE'}")
    lm_dev = (jnp.asarray(lexg.leaf_word),
              jnp.asarray(np.asarray(lm.cost, np.float32)),
              jnp.asarray(np.asarray(lm.start_cost, np.float32)),
              jnp.asarray(np.asarray(lm.end_cost, np.float32)))
    bank_state = np.asarray(lexg.banded.bank_state)

    # ---- on-chip exactness vs the XLA lattice scan (short shapes) ----
    T0, B0 = 24, 4
    e0 = rng.uniform(0, 5, (T0, len(units) * su, B0)).astype(np.float32)
    nf0 = np.array([T0, 9, T0, 13], np.int32)
    t0 = time.time()
    _, ec_x, et_x = viterbi_lattice_tb(
        jnp.asarray(e0)[:, bank_state, :], lexg.banded, jnp.asarray(nf0))
    ec_x = jax.block_until_ready(ec_x)
    log(f"XLA lattice parity run: {time.time()-t0:.1f}s wall (compile incl.)")
    t0 = time.time()
    ec_p, et_p = viterbi_lex_pallas_wide_lattice(
        jnp.asarray(e0), plan, jnp.asarray(nf0), plan.topo)
    ec_p = jax.block_until_ready(ec_p)
    log(f"Pallas wide lattice parity run: {time.time()-t0:.1f}s wall")
    live = np.asarray(ec_x) < 1e29
    np.testing.assert_array_equal(np.asarray(ec_x), np.asarray(ec_p))
    np.testing.assert_array_equal(np.asarray(et_x)[live],
                                  np.asarray(et_p)[live])
    res_x = lattice_rescore(ec_x, et_x, *lm_dev[:1], *lm_dev[1:],
                            jnp.asarray(nf0), backoff=bo)
    res_p = lattice_rescore(ec_p, et_p, *lm_dev[:1], *lm_dev[1:],
                            jnp.asarray(nf0), backoff=bo)
    np.testing.assert_allclose(np.asarray(res_x.cost), np.asarray(res_p.cost),
                               rtol=1e-6)
    w_x = lattice_words(res_x, lexg.leaf_word, nf0)
    w_p = lattice_words(res_p, lexg.leaf_word, nf0)
    assert w_x == w_p, (w_x, w_p)
    log("ON-CHIP EXACTNESS OK (lattice planes bit-equal, rescored costs "
        "and word sequences identical)")

    # ---- stage timing at serving shapes ----
    frames = 500
    for B in (8, 16):
        eb = jnp.asarray(rng.uniform(0, 5, (frames, len(units) * su, B)),
                         jnp.float32)
        nfb = jnp.full((B,), frames, jnp.int32)
        audio_s = B * frames * 0.01

        def body_kern(dep, eb, nfb):
            nf2 = jnp.where(jnp.isnan(dep), nfb + 1, nfb)
            ec, et = viterbi_lex_pallas_wide_lattice(eb, plan, nf2, plan.topo)
            return jnp.sum(ec[-1]) + jnp.sum(et[-1].astype(jnp.float32))

        try:
            dt_k = _timeit_device(body_kern, args=(eb, nfb))
            log(f"wide lattice kernel+leaf-gather B={B}: {dt_k*1e3:.2f} ms "
                f"-> {audio_s/dt_k:.0f} audio-s/s (model chunk: "
                f"{lex_pallas_lattice_batch_chunk(plan, B)})")
        except Exception as ex:
            log(f"wide lattice kernel B={B}: FAILED {type(ex).__name__}: "
                f"{str(ex)[:200]}")
            continue

        ec_b, et_b = viterbi_lex_pallas_wide_lattice(eb, plan, nfb, plan.topo)
        ec_b = jax.block_until_ready(ec_b)

        def body_resc(dep, ec, et, nfb):
            nf2 = jnp.where(jnp.isnan(dep), nfb + 1, nfb)
            r = lattice_rescore(ec, et, *lm_dev[:1], *lm_dev[1:], nf2,
                                backoff=bo)
            return jnp.sum(r.cost) + jnp.sum(r.pred_w[-1].astype(jnp.float32))

        dt_r = _timeit_device(body_resc, args=(ec_b, et_b, nfb))
        log(f"lattice rescore (backoff) B={B}: {dt_r*1e3:.2f} ms "
            f"-> {audio_s/dt_r:.0f} audio-s/s")
        log(f"kernel+rescore combined B={B}: {(dt_k+dt_r)*1e3:.2f} ms "
            f"-> {audio_s/(dt_k+dt_r):.0f} audio-s/s")
    B = 16

    # full product-path wall clock (incl. truncation guard + word walk)
    from speech_recognition_tpu.models.hmm import GMMHMM, HMMBank
    from speech_recognition_tpu.ops.lattice import decode_lextree_bigram
    from speech_recognition_tpu.utils.numerics import to_cost_matrix
    from speech_recognition_tpu.data.synthetic import random_gmm_hmm

    nprng = np.random.default_rng(5)
    models = []
    for ui in range(len(units)):
        p = random_gmm_hmm(nprng, n_states=su, n_mix=1, dim=13, sep=6.0)
        models.append(GMMHMM(
            means=jnp.asarray(p["means"], jnp.float32),
            log_vars=jnp.log(jnp.asarray(p["variances"], jnp.float32)),
            log_weights=jnp.log(jnp.asarray(p["weights"], jnp.float32)),
            trans_cost=jnp.asarray(to_cost_matrix(p["trans"]))))
    bank = HMMBank.stack(models)
    feats = nprng.standard_normal((B, frames, 13)).astype(np.float32)
    nfs = np.full((B,), frames, np.int32)
    seqs, costs = decode_lextree_bigram(bank, lexg, lm, feats, nfs)  # compile
    t0 = time.time()
    seqs, costs = decode_lextree_bigram(bank, lexg, lm, feats, nfs)
    dt_w = time.time() - t0
    log(f"decode_lextree_bigram wall (warm) B={B}: {dt_w*1e3:.0f} ms "
        f"-> {audio_s/dt_w:.0f} audio-s/s wall; "
        f"mean words/utt {np.mean([len(s) for s in seqs]):.1f}")


if __name__ == "__main__":
    main()
