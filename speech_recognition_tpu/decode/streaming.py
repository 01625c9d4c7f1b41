"""Streaming / long-audio connected decoding with a carried frontier.

The reference processes utterances whole, frame-by-frame in Python
(``/root/reference/sr/recognition/decode.py:97-124``) — nothing scales
to long audio.  Here the cost frontier ``[S]`` is the *only* state
carried between fixed-size chunks (SURVEY.md §5 long-context note: the
classical-ASR analog of ring attention is passing the DP frontier):

* each chunk is one jitted banded-Viterbi pass seeded with the carried
  frontier (its first column applies the frame-edge band relaxation
  against the previous chunk's last column — exactly what the
  monolithic scan would do);
* per-chunk int8 backpointers stream to the host (1 byte per
  (frame, state)), so device memory stays O(chunk) regardless of audio
  length;
* the final backtrace runs over the concatenated host backpointers.

Chunked output is bit-identical to the monolithic decode (asserted in
tests).  Across devices the same frontier hand-off becomes a
``ppermute`` of ``[S]`` floats at chunk boundaries — the collective is
a few kilobytes regardless of audio length.
"""

from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from speech_recognition_tpu.models.graph import WordGraph
from speech_recognition_tpu.models.hmm import HMMBank, bank_nll
from speech_recognition_tpu.ops.viterbi_banded import (
    _EPS_BASE,
    BandedGraph,
    _band_relax,
    _eps_relax,
    banded_arrays,
)
from speech_recognition_tpu.utils.numerics import POS_INF

__all__ = ["StreamingDecoder"]


@functools.partial(jax.jit, static_argnames=("eps_depth", "first_chunk"))
def _chunk_step(
    bank: HMMBank,
    g: BandedGraph,
    frontier,
    feats_chunk,
    n_valid,
    eps_depth: int = 1,
    first_chunk: bool = False,
):
    """Advance the frontier over one chunk.

    Returns ``(new frontier [S], bp8 [C, S] int8)``.  For the first
    chunk the frontier is the graph's init cost (no band relaxation
    before the first emission); later chunks relax from the carried
    frontier first.
    """
    c, d = feats_chunk.shape
    frame_mask = jnp.arange(c) < n_valid
    nll = bank_nll(bank, feats_chunk, frame_mask)[:, g.bank_state]
    nll = jnp.minimum(nll, POS_INF)
    s = nll.shape[1]

    def column(base, d_sel, emis):
        cost = jnp.minimum(base + emis, POS_INF)
        bp8 = d_sel
        for _ in range(eps_depth):
            cost, bp_upd = _eps_relax(cost, emis, g)
            bp8 = jnp.where(bp_upd >= 0, bp_upd, bp8)
        return cost, bp8

    def step(carry, inputs):
        prev = carry
        t, emis = inputs
        if first_chunk:
            # column 0 of the whole utterance: init cost enters directly,
            # no band relaxation before the first emission
            is_first = t == 0
            base1, d1 = _band_relax(prev, g.band)
            base = jnp.where(is_first, frontier, base1)
            d_sel = jnp.where(is_first, jnp.int8(0), d1)
        else:
            base, d_sel = _band_relax(prev, g.band)
        cost, bp8 = column(base, d_sel, emis)
        active = t < n_valid
        cost = jnp.where(active, cost, prev)
        return cost, bp8

    ts = jnp.arange(c)
    new_frontier, bps = jax.lax.scan(step, frontier, (ts, nll))
    return new_frontier, bps


class StreamingDecoder:
    """Push-based long-audio decoder over a word graph."""

    def __init__(self, bank: HMMBank, graph: WordGraph, chunk_frames: int = 256):
        self.bank = bank
        self.graph = graph
        self.bg = banded_arrays(graph)
        self.chunk_frames = chunk_frames
        self.reset()

    def reset(self):
        self._frontier = jnp.asarray(self.bg.init_cost)
        self._bp_chunks: List[np.ndarray] = []
        self._n_frames = 0
        self._first = True

    def push(self, feats_chunk: np.ndarray, n_valid: Optional[int] = None):
        """Feed ``[C, D]`` feature frames (C may vary; last chunk may be
        partial via ``n_valid``)."""
        c = feats_chunk.shape[0]
        n_valid = c if n_valid is None else n_valid
        self._frontier, bp8 = _chunk_step(
            self.bank,
            self.bg,
            self._frontier,
            jnp.asarray(feats_chunk, jnp.float32),
            jnp.int32(n_valid),
            eps_depth=self.graph.eps_depth,
            first_chunk=self._first,
        )
        self._first = False
        self._bp_chunks.append(np.asarray(bp8)[:n_valid])
        self._n_frames += n_valid

    def best_cost(self) -> float:
        f = np.asarray(self._frontier)
        ends = np.asarray(self.bg.end_states)
        return float(np.min(f[ends] + np.asarray(self.bg.end_bonus)))

    def finish(self):
        """Backtrace over all pushed audio.

        Returns ``(word_ids, states [T], cost)``."""
        from speech_recognition_tpu.decode.connected import states_to_words

        f = np.asarray(self._frontier)
        ends = np.asarray(self.bg.end_states)
        bonus = np.asarray(self.bg.end_bonus)
        best = int(np.argmin(f[ends] + bonus))
        cost = float((f[ends] + bonus)[best])

        bp8 = np.concatenate(self._bp_chunks, axis=0)  # [T, S]
        word_ends = np.asarray(self.bg.word_ends)
        t_total = self._n_frames
        states = np.zeros(t_total, dtype=np.int32)
        eps_flags = np.zeros(t_total, dtype=bool)
        st = int(ends[best])
        for t in range(t_total - 1, -1, -1):
            states[t] = st
            code = int(bp8[t, st])
            for _ in range(self.graph.eps_depth):
                if code >= _EPS_BASE:
                    eps_flags[t] = True
                    st = int(word_ends[code - _EPS_BASE])
                    code = int(bp8[t, st])
            if t > 0:
                st = st - code
        words = states_to_words(self.graph, states, t_total, eps_flags)
        return words, states, cost
