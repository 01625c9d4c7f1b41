"""Rescorer standalone profile at dict1 shape (round-5): the new
roofline row says 4.4 ms (HBM ring stream) at [T=500, L=6272, B=16]
while the full-path share is ~48 ms — this measures lattice_rescore
ALONE on synthetic lattice planes, sweeping the knobs that plausibly
carry the gap:

  * max_dur (ring depth): 128 (production) vs 64 vs 32 — the [D, B, L]
    ring is the dominant traffic and scales linearly in D;
  * block_frames: 8 (production) vs 16 — ring sweeps per block;

Synthetic planes: live arcs at plausible density (every leaf live every
frame with tau in [t - dur, t)), which upper-bounds the real workload.

Run (TPU): python -u scripts/exp_r5_rescore9.py
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
    from speech_recognition_tpu.langmodel.bigram import fit_bigram
    from speech_recognition_tpu.models.lexgraph import build_lex_graph
    from speech_recognition_tpu.ops.lattice import (
        lattice_rescore,
        rescore_backoff_sliced,
    )
    from speech_recognition_tpu.utils import roofline as rl

    rng = np.random.default_rng(5)
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
    tr = []
    for _ in units:
        t = np.full((su, su), np.inf)
        for i in range(su):
            t[i, i] = 0.5
            if i + 1 < su:
                t[i + 1, i] = 0.5
        tr.append(t)
    lexg = build_lex_graph(words, tr, unit_ids, word_insertion_cost=0.5)

    def markov_seq(n, p=0.85):
        seq = [int(rng.integers(0, len(words)))]
        for _ in range(n - 1):
            seq.append((7 * seq[-1] + 3) % len(words)
                       if rng.random() < p
                       else int(rng.integers(0, len(words))))
        return seq

    lm = fit_bigram([markov_seq(12) for _ in range(600)], len(words))
    sliced = rescore_backoff_sliced(lm, lexg.leaf_word)
    bo_arrays, bo_counts = sliced
    nnz = sum(bo_counts)

    t_len, b = 500, 16
    l = lexg.n_words
    leaf_word = jnp.asarray(lexg.leaf_word)
    lm_c = jnp.asarray(np.asarray(lm.cost, np.float32))
    lm_s = jnp.asarray(np.asarray(lm.start_cost, np.float32))
    lm_e = jnp.asarray(np.asarray(lm.end_cost, np.float32))

    # synthetic planes: every leaf "live" with cost ~ U(0, 50) and tau
    # = t - dur, dur ~ U(6, 100)
    ec = rng.uniform(0, 50, (t_len, l, b)).astype(np.float32)
    dur = rng.integers(6, 100, (t_len, l, b))
    ts = np.arange(t_len)[:, None, None]
    et = np.maximum(ts - dur, 0).astype(np.int32)
    ec_j = jnp.asarray(ec)
    et_j = jnp.asarray(et)
    nfs = jnp.full((b,), t_len, jnp.int32)

    for max_dur in (128, 64, 32):
        for bf in (8, 16):
            def body(dep, ecb, etb):
                nf2 = jnp.where(jnp.isnan(dep), nfs + 1, nfs)
                res = lattice_rescore(ecb, etb, leaf_word, lm_c, lm_s,
                                      lm_e, nf2, max_dur=max_dur,
                                      block_frames=bf, backoff=bo_arrays,
                                      backoff_counts=bo_counts)
                return jnp.sum(res.cost)

            try:
                dt = _timeit_device(body, args=(ec_j, et_j))
            except Exception as e:
                log(f"max_dur={max_dur} bf={bf}: FAILED ({str(e)[:120]})")
                continue
            lp = (l + 127) // 128 * 128
            bd = rl.lattice_rescore_stage(b, t_len, lp, nnz,
                                          dmax=max_dur, f_blk=bf)
            log(f"max_dur={max_dur} bf={bf}: {dt*1e3:.2f} ms "
                f"(bound {bd['bound_s']*1e3:.2f} ms {bd['limiter']}, "
                f"{100*bd['bound_s']/dt:.0f}%)")


if __name__ == "__main__":
    main()
