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
