"""On-chip shakeout for the Pallas lextree kernel: compile, assert
bit-parity vs the XLA kernel on the real TPU, then time a small shape.

Run from /root/repo (axon backend registers at interpreter start)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from speech_recognition_tpu.models.lexgraph import build_lex_graph
from speech_recognition_tpu.ops.viterbi_banded import (
    banded_backtrace_tb,
    viterbi_banded_tb,
)
from speech_recognition_tpu.ops.viterbi_lex_pallas import (
    lex_backtrace_soa,
    lex_pallas_plan,
    viterbi_lex_pallas,
)

print("backend:", jax.default_backend())


def ltr(S, rng, skip=True):
    t = np.full((S, S), np.inf)
    for i in range(S):
        t[i, i] = rng.uniform(0.1, 1)
        if i + 1 < S:
            t[i + 1, i] = rng.uniform(0.1, 1)
        if skip and i + 2 < S:
            t[i + 2, i] = rng.uniform(0.5, 2)
    return t


n_words = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
rng = np.random.default_rng(0)
units = list("abcdefgh")
unit_ids = {ch: i for i, ch in enumerate(units)}
unit_trans = [ltr(3, rng, skip=False) for _ in units]
nprng = np.random.default_rng(7)
vocab = set()
while len(vocab) < n_words:
    n = int(nprng.integers(3, 9))
    vocab.add("".join(nprng.choice(units, n)))
words = sorted(vocab)
lexg = build_lex_graph(words, unit_trans, unit_ids, word_insertion_cost=0.5)
plan = lex_pallas_plan(lexg)
print("arcs", lexg.n_arcs, "states", lexg.n_states,
      "a_pad", plan.topo.a_pad, "levels", plan.topo.level_sizes,
      "sel_tripled", plan.topo.sel_tripled)

T, B = 50, 64 if n_words <= 1000 else 32
e = rng.uniform(0, 5, (T, len(units) * 3, B)).astype(np.float32)
nf = np.full((B,), T, np.int32)
nf[1] = 17
nf[2] = 1

t0 = time.time()
fin_p, bp_p, eu_p = viterbi_lex_pallas(jnp.asarray(e), plan,
                                       jnp.asarray(nf), plan.topo)
s = float(jnp.sum(jnp.where(fin_p < 1e29, fin_p, 0)))
print(f"pallas compiled+ran in {time.time()-t0:.1f}s, checksum {s:.3f}")

bank_state = np.asarray(lexg.banded.bank_state)
nll_tsb = jnp.asarray(e)[:, bank_state, :]
fin_x, bp_x, eu_x = viterbi_banded_tb(nll_tsb, lexg.banded, jnp.asarray(nf))

live = plan.state_of_soa >= 0
fin_p_np = np.asarray(fin_p)
fin_p_orig = np.empty((lexg.n_states, B), np.float32)
fin_p_orig[plan.state_of_soa[live]] = fin_p_np[live]
np.testing.assert_array_equal(fin_p_orig, np.asarray(fin_x))
print("ON-CHIP FINAL COSTS BIT-IDENTICAL")

ends = np.asarray(lexg.banded.end_states)
costs = np.asarray(fin_x)[ends]
best = np.argmin(costs, axis=0)
s_x, f_x = banded_backtrace_tb(bp_x, eu_x, lexg.banded,
                               jnp.asarray(ends[best]), jnp.asarray(nf))
s_p, f_p = lex_backtrace_soa(bp_p, eu_p, plan,
                             jnp.asarray(np.asarray(plan.ends_soa)[best]),
                             jnp.asarray(nf), plan.topo)
s_p_orig = plan.state_of_soa[np.asarray(s_p)]
for i in range(B):
    n = int(nf[i])
    np.testing.assert_array_equal(s_p_orig[:n, i], np.asarray(s_x)[:n, i])
    np.testing.assert_array_equal(np.asarray(f_p)[:n, i],
                                  np.asarray(f_x)[:n, i])
print("ON-CHIP BACKTRACE BIT-IDENTICAL")
