"""Round-5 dict1 batch sweep + written bounds (VERDICT r4 item 3).

Measures the wide no-LM and lattice kernels at B = 16 / 24 / 32 / 48 /
64 (each batch whole if it fits the VMEM envelope, else as the
fits-guard's chunk aggregate) and prints the NEW roofline rows
(``utils.roofline.lex_wide_kernel`` / ``lattice_rescore_stage``) next
to each measurement.

Physics note recorded with the model: the kernel is VPU-bound and every
term scales linearly in B, so chunked aggregates are flat by
construction — the meaningful number is measured/bound per frame, not
an audio-s/s multiple from batch growth.

Run (TPU): python -u scripts/exp_r5_dict1_batch.py
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
    from bench import _timeit_device, log
    from speech_recognition_tpu.models.lexgraph import build_lex_graph
    from speech_recognition_tpu.ops.viterbi_lex_pallas import (
        lex_pallas_lattice_batch_chunk,
        lex_pallas_plan,
        lex_pallas_wide_batch_chunk,
        viterbi_lex_pallas_wide,
        viterbi_lex_pallas_wide_lattice,
    )
    from speech_recognition_tpu.utils import roofline as rl

    rng = np.random.default_rng(7)
    raw = [line.strip() for line in
           open("/root/reference/tests/test_data/dict1.txt")][1:]
    seen, words = set(), []
    for w in raw:
        if w and w not in seen:
            seen.add(w)
            words.append(w)
    units = sorted(set("".join(words)))
    unit_ids = {ch: i for i, ch in enumerate(units)}
    su = 3
    trans = []
    for _ in units:
        t = np.full((su, su), np.inf)
        for i in range(su):
            t[i, i] = rng.uniform(0.1, 1)
            if i + 1 < su:
                t[i + 1, i] = rng.uniform(0.1, 1)
        trans.append(t)
    lexg = build_lex_graph(words, trans, unit_ids, word_insertion_cost=0.5)
    plan = lex_pallas_plan(lexg, layout="wide")
    topo = plan.topo
    T = 500

    def bound(batch, lattice):
        return rl.lex_wide_kernel(
            batch, T, topo.a_pad, topo.su, topo.n_units_pad,
            topo.sel_blocks, topo.sel_w, topo.level_sizes[0],
            lattice=lattice)

    for batch in (16, 24, 32, 48, 64):
        for name, kern, chunk_fn, lat in (
                ("noLM", viterbi_lex_pallas_wide,
                 lex_pallas_wide_batch_chunk, False),
                ("lattice", viterbi_lex_pallas_wide_lattice,
                 lex_pallas_lattice_batch_chunk, True)):
            bc = chunk_fn(plan, batch)
            if bc == 0:
                log(f"B={batch} {name}: no tile fits")
                continue
            bc = min(bc, batch)
            n_chunks = -(-batch // bc)
            eb = jnp.asarray(rng.uniform(0, 5, (T, len(units) * su, bc)),
                             jnp.float32)
            nfb = jnp.full((bc,), T, jnp.int32)

            def body(dep, eb_, nfb_):
                nf2 = jnp.where(jnp.isnan(dep), nfb_ + 1, nfb_)
                outs = kern(eb_, plan, nf2, plan.topo)
                return sum(jnp.sum(o[-1].astype(jnp.float32))
                           for o in outs[:2])

            try:
                dt_c = _timeit_device(body, args=(eb, nfb))
            except Exception as e:
                log(f"B={batch} {name} (tile {bc}): FAILED "
                    f"({str(e)[:140]})")
                continue
            dt = dt_c * n_chunks
            bd = bound(batch, lat)["bound_s"]
            log(f"B={batch} {name}: tile {bc} x{n_chunks} -> "
                f"{dt*1e3:.2f} ms aggregate, {batch*T*0.01/dt:.0f} "
                f"audio-s/s; bound {bd*1e3:.2f} ms "
                f"({100*bd/dt:.0f}% of SoL)")

    # rescore bound row (the sliced-backoff production form): nnz from a
    # real bigram over the dict1 vocabulary
    from speech_recognition_tpu.langmodel.bigram import fit_bigram
    from speech_recognition_tpu.ops.lattice import rescore_backoff_sliced

    def markov_seq(n, p=0.85):
        seq = [int(rng.integers(0, len(words)))]
        for _ in range(n - 1):
            seq.append((7 * seq[-1] + 3) % len(words)
                       if rng.random() < p else int(
                           rng.integers(0, len(words))))
        return seq

    lm = fit_bigram([markov_seq(12) for _ in range(600)], len(words))
    sliced = rescore_backoff_sliced(lm, lexg.leaf_word)
    nnz = sum(sliced[1]) if sliced else 0
    lp = (lexg.n_words + 127) // 128 * 128
    bd = rl.lattice_rescore_stage(16, T, lp, nnz)
    log(f"rescore bound @ B=16, L={lp}, nnz={nnz}: "
        f"{bd['bound_s']*1e3:.2f} ms ({bd['limiter']}) — round-4 "
        f"measured ~65 ms in the full path at this shape")


if __name__ == "__main__":
    main()
