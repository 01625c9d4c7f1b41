"""Evaluation metrics.

The reference computes three metrics: isolated accuracy
(``/root/reference/sr/core.py:63-94``), connected-digit *sequence
accuracy* and a positional *digit accuracy* (``main.py:69-84`` —
elementwise ``matched - label`` mismatch counting, which breaks on
length mismatches, quirk SURVEY.md §2.5-5).  This module provides
proper string WER (Levenshtein) as the production metric plus the
reference-parity positional metric.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

__all__ = [
    "edit_distance",
    "wer",
    "sequence_accuracy",
    "positional_digit_accuracy",
]


def edit_distance(hyp: Sequence, ref: Sequence) -> int:
    """Levenshtein distance between two sequences."""
    m, n = len(hyp), len(ref)
    dp = np.zeros((m + 1, n + 1), dtype=np.int64)
    dp[:, 0] = np.arange(m + 1)
    dp[0, :] = np.arange(n + 1)
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            dp[i, j] = min(
                dp[i - 1, j] + 1,
                dp[i, j - 1] + 1,
                dp[i - 1, j - 1] + (hyp[i - 1] != ref[j - 1]),
            )
    return int(dp[m, n])


def wer(hyps: List[Sequence], refs: List[Sequence]) -> float:
    """Word error rate: total edit distance / total reference length."""
    errs = sum(edit_distance(h, r) for h, r in zip(hyps, refs))
    total = sum(len(r) for r in refs)
    return errs / max(total, 1)


def sequence_accuracy(hyps: List[Sequence], refs: List[Sequence]) -> float:
    """Fraction of utterances decoded exactly (``main.py:83``)."""
    correct = sum(1 for h, r in zip(hyps, refs) if list(h) == list(r))
    return correct / max(len(refs), 1)


def positional_digit_accuracy(hyps: List[Sequence], refs: List[Sequence]) -> float:
    """Reference-parity metric (``main.py:76-84``): positional mismatch
    count, only defined when lengths match; length-mismatched pairs are
    scored as fully wrong (the reference would crash — quirk §2.5-5)."""
    n_digits = 0
    n_diff = 0
    for h, r in zip(hyps, refs):
        n_digits += len(r)
        if len(h) != len(r):
            n_diff += len(r)
        else:
            n_diff += int(np.count_nonzero(np.asarray(h) != np.asarray(r)))
    return (n_digits - n_diff) / max(n_digits, 1)
