"""The reference's own 6,250-word dictionary on the production Pallas
lex path (VERDICT round-2 item 1): builds the dict1 trie over 31
3-state units, asserts on-chip bit-parity vs the XLA scan kernel on a
short batch, then times the Pallas kernel at serving shapes and the
XLA scan for the speedup row.

Run from /root/repo on TPU: python scripts/exp_dict1_chip.py
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
    from speech_recognition_tpu.models.lexgraph import build_lex_graph
    from speech_recognition_tpu.ops.viterbi_banded import (
        banded_backtrace_tb, viterbi_banded_tb)
    from speech_recognition_tpu.ops.viterbi_lex_pallas import (
        lex_backtrace_wide, lex_pallas_plan, lex_pallas_wide_batch_chunk,
        viterbi_lex_pallas_wide)

    words = load_dict1()
    units = sorted(set("".join(words)))
    unit_ids = {ch: i for i, ch in enumerate(units)}
    rng = np.random.default_rng(0)
    su = 3
    def ltr(S):
        t = np.full((S, S), np.inf)
        for i in range(S):
            t[i, i] = rng.uniform(0.1, 1)
            if i + 1 < S: t[i + 1, i] = rng.uniform(0.1, 1)
        return t
    lexg = build_lex_graph(words, [ltr(su) for _ in units], unit_ids,
                           word_insertion_cost=0.5)
    plan = lex_pallas_plan(lexg, layout="wide")
    log(f"dict1: {lexg.n_words} words, {lexg.n_arcs} arcs, "
        f"{lexg.n_states} states; wide lane-major layout, "
        f"W={plan.topo.sel_w} blocks={len(plan.topo.sel_blocks)}")
    log(f"wide batch chunk at 64: {lex_pallas_wide_batch_chunk(plan, 64)}")

    # ---- on-chip bit-parity vs the XLA scan (short shapes) ----
    T0, B0 = 16, 8
    e = rng.uniform(0, 5, (T0, len(units) * su, B0)).astype(np.float32)
    nf = np.array([T0, 7, T0, 3, 12, T0, 1, 9], np.int32)
    bank_state = np.asarray(lexg.banded.bank_state)
    nll_tsb = jnp.asarray(e)[:, bank_state, :]
    t0 = time.time()
    fin_x, bp_x, eu_x = viterbi_banded_tb(nll_tsb, lexg.banded,
                                          jnp.asarray(nf))
    fin_x = jax.block_until_ready(fin_x)
    log(f"XLA scan parity run: {time.time()-t0:.1f}s wall (compile incl.)")
    t0 = time.time()
    fin_p, bp_p, eu_p, ep_p = viterbi_lex_pallas_wide(
        jnp.asarray(e), plan, jnp.asarray(nf), plan.topo)
    fin_p = jax.block_until_ready(fin_p)
    log(f"Pallas wide parity run: {time.time()-t0:.1f}s wall (compile incl.)")
    live = plan.state_of_soa >= 0
    fin_p_orig = np.full((lexg.n_states, B0), np.nan, np.float32)
    fin_p_orig[plan.state_of_soa[live]] = np.asarray(fin_p).T[live]
    np.testing.assert_array_equal(fin_p_orig, np.asarray(fin_x))
    ends = np.asarray(lexg.banded.end_states)
    costs = np.asarray(fin_x)[ends] + np.asarray(lexg.banded.end_bonus)[:, None]
    best = np.argmin(costs, axis=0)
    s_x, f_x = banded_backtrace_tb(bp_x, eu_x, lexg.banded,
                                   jnp.asarray(ends[best]), jnp.asarray(nf))
    s_p, f_p = lex_backtrace_wide(
        bp_p, eu_p, ep_p, plan, jnp.asarray(np.asarray(plan.ends_soa)[best]),
        jnp.asarray(nf), plan.topo)
    s_p_orig = plan.state_of_soa[np.asarray(s_p)]
    for i in range(B0):
        n = int(nf[i])
        np.testing.assert_array_equal(s_p_orig[:n, i], np.asarray(s_x)[:n, i])
        np.testing.assert_array_equal(np.asarray(f_p)[:n, i],
                                      np.asarray(f_x)[:n, i])
    log("ON-CHIP BIT-PARITY OK (costs, states, eps flags)")

    # ---- throughput: Pallas at serving shapes ----
    frames = 500
    for B in (16, 24, 32):
        if lex_pallas_wide_batch_chunk(plan, B) < B:
            log(f"B={B}: outside the wide VMEM model; trying anyway")
        eb = jnp.asarray(rng.uniform(0, 5, (frames, len(units) * su, B)),
                         jnp.float32)
        nfb = jnp.full((B,), frames, jnp.int32)
        def body(dep, eb=eb, nfb=nfb):
            nf2 = jnp.where(jnp.isnan(dep), nfb + 1, nfb)
            fin, bp8, eu, ep = viterbi_lex_pallas_wide(
                eb, plan, nf2, plan.topo)
            end_costs = fin[:, plan.ends_soa]  # [B, L]
            bestb = jnp.argmin(end_costs, axis=1)
            states, _ = lex_backtrace_wide(
                bp8, eu, ep, plan, plan.ends_soa[bestb], nf2, plan.topo)
            return (jnp.sum(jnp.take_along_axis(end_costs, bestb[:, None], 1))
                    + jnp.sum(states[0].astype(jnp.float32)))
        try:
            dt = _timeit_device(body)
            log(f"Pallas wide dict1 B={B}: {dt*1e3:.2f} ms "
                f"-> {B*frames*0.01/dt:.0f} audio-s/s")
        except Exception as ex:
            log(f"Pallas wide dict1 B={B}: FAILED {type(ex).__name__}: "
                f"{str(ex)[:300]}")

    # ---- XLA scan at one shape for the speedup row ----
    B = 32
    eb = jnp.asarray(rng.uniform(0, 5, (frames, len(units) * su, B)),
                     jnp.float32)
    nll_big = eb[:, bank_state, :]
    nfb = jnp.full((B,), frames, jnp.int32)
    def body_x(dep):
        nf2 = jnp.where(jnp.isnan(dep), nfb + 1, nfb)
        fin, bp8, eu = viterbi_banded_tb(nll_big, lexg.banded, nf2)
        return jnp.sum(fin)
    dt = _timeit_device(body_x)
    log(f"XLA scan dict1 B={B}: {dt*1e3:.2f} ms "
        f"-> {B*frames*0.01/dt:.0f} audio-s/s")

if __name__ == "__main__":
    main()
