"""Stress: 100-word vocabulary (500 states) — banded and state-sharded
kernels stay bit-identical to the dense reference kernel."""

import jax.numpy as jnp
import numpy as np

from speech_recognition_tpu.models.graph import build_loop_graph
from speech_recognition_tpu.ops.viterbi import viterbi
from speech_recognition_tpu.ops.viterbi_banded import banded_arrays, viterbi_banded
from speech_recognition_tpu.parallel.mesh import make_mesh
from speech_recognition_tpu.parallel.sharded_decode import (
    make_sharded_banded_viterbi,
    pad_banded_for_sharding,
)


def test_100_word_loop_graph(rng):
    n_words, s = 100, 5
    trans = []
    for _ in range(n_words):
        t = np.full((s, s), np.inf)
        for i in range(s):
            t[i, i] = rng.uniform(0.1, 1)
            if i + 1 < s:
                t[i + 1, i] = rng.uniform(0.1, 1)
        trans.append(t)
    g = build_loop_graph(trans)
    assert g.n_states == 500
    bg = banded_arrays(g)

    T = 60
    nll = rng.uniform(0, 5, (T, g.n_states)).astype(np.float32)

    ref = viterbi(jnp.asarray(nll), jnp.asarray(g.trans), jnp.asarray(g.init_cost),
                  jnp.int32(T), eps_trans=jnp.asarray(g.eps_trans), eps_depth=1)
    fin_b, _ = viterbi_banded(jnp.asarray(nll), bg, jnp.int32(T))
    np.testing.assert_allclose(np.asarray(fin_b), np.asarray(ref.final_cost), rtol=1e-6)

    mesh = make_mesh(shape=(1, 8))
    bgp, s_orig = pad_banded_for_sharding(bg, 8)
    nll_pad = np.zeros((T, bgp.band.shape[1]), np.float32)
    nll_pad[:, :s_orig] = nll
    run = make_sharded_banded_viterbi(mesh, bgp, eps_depth=1)
    fin_s, _ = run(jnp.asarray(nll_pad), T)
    np.testing.assert_allclose(np.asarray(fin_s)[:s_orig], np.asarray(ref.final_cost), rtol=1e-6)
