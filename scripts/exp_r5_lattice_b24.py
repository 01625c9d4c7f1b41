"""Probe: does the wide LATTICE kernel compile at B=24/32 after the
round-4/5 trims?  (The fits-guard model says no at the 100 MB budget;
the actual Mosaic scoped limit is 127 MB, and the guard's plane count
is a calibration, not a measurement.)  Bypasses the guard and calls the
kernel directly.

Run (TPU): python -u scripts/exp_r5_lattice_b24.py
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
        lex_pallas_plan,
        viterbi_lex_pallas_wide_lattice,
    )

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
    T = 500
    for batch in (24, 32):
        eb = jnp.asarray(rng.uniform(0, 5, (T, len(units) * su, batch)),
                         jnp.float32)
        nfb = jnp.full((batch,), T, jnp.int32)

        def body(dep, eb_, nfb_):
            nf2 = jnp.where(jnp.isnan(dep), nfb_ + 1, nfb_)
            ec, et = viterbi_lex_pallas_wide_lattice(eb_, plan, nf2,
                                                     plan.topo)
            return jnp.sum(ec[-1]) + jnp.sum(et[-1].astype(jnp.float32))

        try:
            dt = _timeit_device(body, args=(eb, nfb))
            log(f"lattice B={batch} DIRECT: {dt*1e3:.2f} ms -> "
                f"{batch*T*0.01/dt:.0f} audio-s/s")
        except Exception as e:
            log(f"lattice B={batch} DIRECT: FAILED ({str(e)[:140]})")


if __name__ == "__main__":
    main()
