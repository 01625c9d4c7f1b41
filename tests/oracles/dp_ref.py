"""Numpy oracle for the reference DP decoders, with modern numpy.

Faithful re-implementations of ``dtw`` and ``decode_hmm_states``
(``/root/reference/sr/recognition/decode.py:7-146``) operating on
precomputed emission-cost matrices (``emis[t, s]``) instead of state
objects; ``is_nes[s]`` marks non-emitting states (whose emission is 0).
Used as the ground truth for the lax.scan Viterbi kernel, including the
same-column NES semantics and argmin tie-breaking.
"""

import numpy as np


def dtw_oracle(emis, transitions):
    """Reference ``dtw`` (decode.py:7-77), no beam.

    emis: [T, S] distance of input frame t to template state s.
    transitions: [S, S], T[to, from], np.inf where absent.
    Returns (costs [S, T], path list-of-[state, frame] reversed).
    """
    T, S = emis.shape
    costs = np.full((S, T), np.inf)
    path_matrix = np.zeros((S, T, 2), dtype=np.int64)

    for j in range(T):
        for i in range(S):
            if i == 0 and j == 0:
                costs[0, 0] = emis[0, 0]
                continue
            prev_costs = []
            from_pts = []
            for origin in range(S):
                prev_costs.append(transitions[i, origin] + costs[origin, j - 1])
                from_pts.append([origin, j - 1])
            min_i = int(np.argmin(prev_costs))
            path_matrix[i, j] = from_pts[min_i]
            costs[i, j] = prev_costs[min_i] + emis[j, i]

    i, j = S - 1, T - 1
    path = []
    while i != 0 or j != 0:
        i, j = path_matrix[i, j]
        path.append([i, j])
    return costs, np.array(path)


def decode_hmm_states_oracle(emis, transitions, is_nes, end_points=None):
    """Reference ``decode_hmm_states`` (decode.py:80-146).

    emis: [T, S] emission costs (ignored/zero for NES states).
    transitions: [S, S], T[to, from], np.inf where absent.
    is_nes: [S] bool.
    end_points: list of [state, frame] (frame may be -1 = last).
    Returns (costs [S, T], path array reversed end->start, best_cost).
    """
    T, S = emis.shape
    costs = np.full((S, T), np.inf)
    path_matrix = np.zeros((S, T, 2), dtype=np.int64)

    def emit(r, c):
        return 0.0 if is_nes[r] else emis[c, r]

    for c in range(T):
        for r in range(S):
            if r == 0 and c == 0:
                costs[0, 0] = emit(0, 0)
                continue
            prev_costs = []
            from_pts = []
            for origin in range(S):
                if np.isinf(transitions[r, origin]):
                    continue
                if is_nes[origin] or is_nes[r]:
                    prev_costs.append(transitions[r, origin] + costs[origin, c])
                    from_pts.append([origin, c])
                else:
                    prev_costs.append(transitions[r, origin] + costs[origin, c - 1])
                    from_pts.append([origin, c - 1])
            if len(prev_costs) == 0:
                continue
            min_i = int(np.argmin(prev_costs))
            origin_point = from_pts[min_i]
            assert origin_point != [r, c], "self-origin"
            path_matrix[r, c] = origin_point
            costs[r, c] = prev_costs[min_i] + emit(r, c)

    if end_points is None:
        end_points = [[S - 1, T - 1]]
    best_cost, best_end = np.inf, None
    for end in end_points:
        if best_cost >= costs[end[0], end[1]]:
            best_cost = costs[end[0], end[1]]
            best_end = end

    i, j = best_end[0], best_end[1] % T
    path = []
    while j != 0:
        i, j = path_matrix[i, j]
        path.append([i, j])
    return costs, np.array(path), best_cost


def gmm_nll_oracle(x, means, variances, weights):
    """Linear-space GMM negative log likelihood, one frame
    (/root/reference/sr/recognition/hmm_state.py:36-45,114-120), float64."""
    x = np.asarray(x, np.float64)
    res = 0.0
    for m in range(means.shape[0]):
        var = np.asarray(variances[m], np.float64)
        det = np.prod(var)
        norm_const = 1.0 / (np.power(2 * np.pi, x.shape[0] / 2.0) * np.sqrt(det))
        x_mu = x - means[m]
        res += weights[m] * norm_const * np.exp(-0.5 * np.sum(x_mu * x_mu / var))
    return -np.log(res)


def mahalanobis_oracle(v1, v2, variance):
    """/root/reference/sr/recognition/hmm_state.py:48-58."""
    D = len(variance)
    m = v1 - v2
    return 0.5 * np.log((2 * np.pi) ** D * np.prod(variance)) + 0.5 * np.sum(
        m / variance * m
    )
