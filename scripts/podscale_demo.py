"""Pod-scale path demo (BASELINE.json config 5): 10k-utterance batched
embedded-EM training steps, data-sharded over a device mesh.

Real multi-host TPU hardware is not available in this environment, so
this runs on the virtual 8-device CPU mesh
(``--xla_force_host_platform_device_count=8``) — the same sharded
program that would run on a pod slice (shardings identical, collectives
inserted by GSPMD), demonstrating that the 10k-utterance step compiles,
executes, and improves its objective.  On real hardware only the mesh
construction changes.

Run:  python scripts/podscale_demo.py [n_utts]
"""

import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

if jax.default_backend() not in ("tpu",):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from speech_recognition_tpu.data.synthetic import random_gmm_hmm, sample_hmm_features
from speech_recognition_tpu.models.graph import (
    build_word_graph,
    pad_graphs,
    pad_graphs_banded,
)
from speech_recognition_tpu.models.hmm import GMMHMM, HMMBank
from speech_recognition_tpu.parallel.mesh import make_mesh
from speech_recognition_tpu.parallel.trainer import (
    make_sharded_embedded_step,
    shard_embedded_inputs,
)
from speech_recognition_tpu.utils.numerics import to_cost_matrix


def main(n_utts: int = 10_000, soft: bool = False):
    rng = np.random.default_rng(0)
    n_words, s, m, d, t = 11, 4, 2, 16, 100
    words_per_utt = 3

    print(f"devices: {len(jax.devices())} ({jax.default_backend()})")
    true = [random_gmm_hmm(rng, s, m, d, sep=4.0) for _ in range(n_words)]

    print(f"sampling {n_utts} utterances ...")
    # draw a pool of word instances per model and compose utterances from
    # it — per-frame Python sampling for 10k utterances would dominate
    pool = {w: [sample_hmm_features(true[w], rng, min_frames_per_state=2)[0]
                for _ in range(50)] for w in range(n_words)}
    feats = np.zeros((n_utts, t, d), np.float32)
    n_frames = np.zeros((n_utts,), np.int32)
    labels = []
    for b in range(n_utts):
        seq = list(rng.integers(0, n_words, words_per_utt))
        labels.append([int(x) for x in seq])
        fs = [pool[int(w)][int(rng.integers(0, 50))] for w in seq]
        x = np.concatenate(fs)[:t]
        feats[b, : len(x)] = x
        n_frames[b] = len(x)

    init = [
        {
            "means": p["means"] + 0.5 * rng.standard_normal(p["means"].shape),
            "variances": p["variances"] * 1.5,
            "weights": p["weights"],
            "trans": p["trans"],
        }
        for p in true
    ]
    bank = HMMBank.stack(
        [
            GMMHMM(
                means=jnp.asarray(p["means"], jnp.float32),
                log_vars=jnp.log(jnp.asarray(p["variances"], jnp.float32)),
                log_weights=jnp.log(jnp.asarray(p["weights"], jnp.float32)),
                trans_cost=jnp.asarray(to_cost_matrix(p["trans"])),
            )
            for p in init
        ]
    )

    trans_np = [np.asarray(bank.trans_cost[i]) for i in range(n_words)]
    print("composing per-utterance graphs (cached by transcript) ...")
    cache = {}
    graphs = []
    for ls in labels:
        key = tuple(ls)
        if key not in cache:
            cache[key] = build_word_graph(trans_np, [[l] for l in ls])
        graphs.append(cache[key])
    print(f"  {len(cache)} distinct transcripts")
    if soft:  # Baum-Welch step over the banded graphs (O(3S)/frame FB)
        graph_batch, eps_depth = pad_graphs_banded(graphs)
    else:
        graph_batch, eps_depth = pad_graphs(graphs)

    n_dev = len(jax.devices())
    mesh = make_mesh(shape=(n_dev, 1))
    step = make_sharded_embedded_step(mesh, eps_depth=eps_depth,
                                      var_floor=1e-3, soft=soft)
    b_s, f_s, n_s, g_s = shard_embedded_inputs(mesh, bank, feats, n_frames, graph_batch)

    for it in range(3):
        t0 = time.perf_counter()
        b_s, stats = step(b_s, f_s, n_s, g_s)
        cost = float(stats.total_cost)  # host fetch = sync fence
        dt = time.perf_counter() - t0
        tag = "(incl. compile)" if it == 0 else ""
        kind = "soft (Baum-Welch, banded FB)" if soft else "hard (Viterbi)"
        print(
            f"iteration {it} [{kind}]: total cost {cost:.0f}, "
            f"{dt:.1f} s -> {n_utts/dt:.0f} utts/s {tag}"
        )


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--soft"]
    main(int(args[0]) if args else 10_000, soft="--soft" in sys.argv)
