"""Numpy oracle for the reference text Viterbi
(``/root/reference/sr/langmodel/spellchecker.py:15-135``), operating on
flat trie arrays (val/parent/prop + appended synthetic space node) so
it exercises the same node enumeration as the production kernel."""

import numpy as np


def text_viterbi_oracle(x, val, parent, prop):
    """Returns the full cost matrix [n_nodes+1, len(x)+1] and best cost.

    val/parent/prop: LexTree arrays (without the space node).
    """
    x = "*" + x
    n = len(val) + 1
    space_idx = n - 1
    vals = [chr(c) for c in val] + [" "]
    parents = list(parent) + [-1]

    deletion_cost, insertion_cost, match_cost = 1.0, 1.0, 0.0
    space_cost, loop_cost = 0.0, 1.0

    n_cols = len(x)
    costs = np.full((n, n_cols), np.inf)
    costs[0, :] = 0

    word_ends = [space_idx] + [i for i in range(n - 1) if prop[i] == 2]

    def dist(a, b):
        return float(a != b)

    for c in range(n_cols):
        for r in range(n):
            if r == 0 and c == 0:
                continue
            subcosts = [np.inf] * 4
            node_dist = dist(x[c], vals[r])
            parent_index = parents[r] if parents[r] >= 0 else None

            if r == space_idx:
                cands = [
                    node_dist + space_cost + costs[we, c - 1] for we in word_ends[1:]
                ]
                if c > 0 and cands:
                    subcosts = cands
                else:
                    subcosts = [np.inf]
            elif parent_index == 0:
                if c > 0:
                    subcosts[0] = node_dist + deletion_cost + costs[r, c - 1]
                if parent_index is not None:
                    subcosts[2] = node_dist + insertion_cost + costs[parent_index, c]
            elif r == 0:
                if c > 0:
                    loop_costs = [
                        node_dist + loop_cost + costs[we, c - 1] for we in word_ends
                    ]
                    subcosts[3] = min(loop_costs)
            else:
                if c > 0:
                    subcosts[0] = node_dist + deletion_cost + costs[r, c - 1]
                if parent_index is not None and c > 0:
                    subcosts[1] = node_dist + match_cost + costs[parent_index, c - 1]
                if parent_index is not None:
                    subcosts[2] = node_dist + insertion_cost + costs[parent_index, c]

            costs[r, c] = min(subcosts)

    best = min(costs[we, n_cols - 1] for we in word_ends)
    return costs, best
