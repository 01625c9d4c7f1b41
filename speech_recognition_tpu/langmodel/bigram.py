"""Bigram word language model.

The reference planned but never built an n-gram LM — its
``sr/langmodel/langmodel.py`` is an empty file
(``/root/reference/sr/langmodel/langmodel.py:1``) and its decoder runs
with zero-cost word transitions (``continuous_speech.py:47-49``).  This
module supplies the missing piece as cost arrays that compose directly
into the decoding graph's epsilon transitions (``models/graph.py``):
``cost[u, v] = -log P(v | u)`` plus sentence start/end costs, estimated
from label sequences with add-k smoothing.
"""

from __future__ import annotations

from typing import List, NamedTuple, Sequence

import numpy as np


class BigramLM(NamedTuple):
    """Cost-space bigram: everything is ``-log P``."""

    cost: np.ndarray  # [V, V] cost[u, v] = -log P(v | u)
    start_cost: np.ndarray  # [V] -log P(v | <s>)
    end_cost: np.ndarray  # [V] -log P(</s> | u)

    @property
    def vocab_size(self) -> int:
        return self.cost.shape[0]


def uniform_bigram(vocab_size: int, flat: bool = True) -> BigramLM:
    """No-information LM.  ``flat=True`` gives all-zero costs (the
    reference's zero-cost word transitions); ``flat=False`` gives the
    proper uniform distribution ``-log(1/V)``."""
    c = 0.0 if flat else float(np.log(vocab_size))
    return BigramLM(
        cost=np.full((vocab_size, vocab_size), c, dtype=np.float32),
        start_cost=np.full((vocab_size,), c, dtype=np.float32),
        end_cost=np.zeros((vocab_size,), dtype=np.float32),
    )


def fit_bigram(
    sequences: Sequence[List[int]], vocab_size: int, add_k: float = 1.0
) -> BigramLM:
    """Maximum-likelihood bigram with add-k smoothing over word-id
    sequences (e.g. Aurora transcripts)."""
    counts = np.full((vocab_size, vocab_size), add_k, dtype=np.float64)
    start = np.full((vocab_size,), add_k, dtype=np.float64)
    end = np.full((vocab_size,), add_k, dtype=np.float64)
    totals = np.zeros((vocab_size,), dtype=np.float64)
    n_starts = 0
    for seq in sequences:
        if not seq:
            continue
        start[seq[0]] += 1
        n_starts += 1
        for u, v in zip(seq[:-1], seq[1:]):
            counts[u, v] += 1
        end[seq[-1]] += 1
    # each occurrence of u is followed by exactly one event (word or </s>)
    row_tot = counts.sum(axis=1) + end
    cost = -np.log(counts / row_tot[:, None])
    end_cost = -np.log(end / row_tot)
    start_cost = -np.log(start / start.sum())
    return BigramLM(
        cost=cost.astype(np.float32),
        start_cost=start_cost.astype(np.float32),
        end_cost=end_cost.astype(np.float32),
    )


def scale(lm: BigramLM, weight: float) -> BigramLM:
    """Apply an LM scale (the usual acoustic/LM balance knob)."""
    return BigramLM(
        cost=lm.cost * weight,
        start_cost=lm.start_cost * weight,
        end_cost=lm.end_cost * weight,
    )


def sequence_cost(lm: BigramLM, seq: List[int]) -> float:
    """Total -log P of a word sequence under the LM (for tests/rescoring)."""
    if not seq:
        return 0.0
    c = float(lm.start_cost[seq[0]])
    for u, v in zip(seq[:-1], seq[1:]):
        c += float(lm.cost[u, v])
    return c + float(lm.end_cost[seq[-1]])


class BigramBackoff(NamedTuple):
    """Backoff decomposition of a bigram cost matrix (host arrays).

    Add-k (and any backoff-style) smoothing makes every UNSEEN pair's
    cost row-constant: ``cost[u, v] = base[u]`` for all v with zero
    count, and ``cost[u, v] <= base[u]`` for seen pairs.  Exact
    consequence for the rescoring recursion
    ``H[w] = min_u (D[u] + cost[u, w])``:

        H[w] = min( min_u (D[u] + base[u]),
                    min_{u: (u,w) seen} (D[u] + cost[u, w]) )

    — one global backoff min shared by every w, plus a per-word sparse
    min over at most K seen predecessors: O(V + nnz) per frame instead
    of O(V^2).  ``pred_idx``/``pred_cost`` are [V, K] padded with
    index 0 / POS_INF."""

    base: np.ndarray  # [V] row-constant unseen cost
    pred_idx: np.ndarray  # [V, K] seen predecessor ids (dest-major)
    pred_cost: np.ndarray  # [V, K] full pair costs (1e30 pad)
    k: int


def bigram_backoff(cost: np.ndarray, tol: float = 1e-5, k_cap: int = None):
    """Extract the backoff structure of ``cost`` (``[V, V]``, any
    order).  Taking each row's max as its backoff level makes the
    decomposition EXACT for any matrix (sub-level pairs are the sparse
    corrections); it is only *useful* when those corrections are
    sparse, so None is returned when any word has more than ``k_cap``
    (default V/8, min 16) below-level predecessors — the dense
    recombination is the better kernel there."""
    cost = np.asarray(cost)
    v = cost.shape[0]
    if k_cap is None:
        k_cap = max(16, v // 8)
    # with add-k / backoff smoothing the row max IS the unseen level
    # (seen pairs are strictly cheaper)
    base = cost.max(axis=1)
    corr = cost - base[:, None]
    seen = corr < -tol
    nnz_per_w = seen.sum(axis=0)
    k = int(nnz_per_w.max()) if v else 0
    if k > k_cap:
        return None
    if k == 0:
        return BigramBackoff(base=base.astype(np.float32),
                             pred_idx=np.zeros((v, 1), np.int32),
                             pred_cost=np.full((v, 1), 1e30, np.float32),
                             k=1)
    pred_idx = np.zeros((v, k), np.int32)
    pred_cost = np.full((v, k), 1e30, np.float32)
    for w in range(v):
        us = np.flatnonzero(seen[:, w])
        pred_idx[w, : len(us)] = us
        pred_cost[w, : len(us)] = cost[us, w]
    return BigramBackoff(base=base.astype(np.float32), pred_idx=pred_idx,
                         pred_cost=pred_cost, k=k)
