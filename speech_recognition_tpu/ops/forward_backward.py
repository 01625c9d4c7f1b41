"""Log-space forward-backward over epsilon-closed decoding graphs.

The reference only ever trains with hard Viterbi alignments
(``continuous_speech.py:89`` — SURVEY.md §3.3 explicitly notes it is
"Viterbi training (hard EM), not forward-backward/Baum-Welch; the north
star upgrades it to log-space forward-backward EM").  This module is
that upgrade: sum-product alpha/beta passes as ``lax.scan``s over the
same graph arrays the min-cost decoder uses — score space is negated
cost (``log p = -cost``), the frame recursion is a logsumexp-plus
matmul, and same-column epsilon moves are depth-bounded logaddexp
passes mirroring the Viterbi epsilon relaxation (including the
reference's boundary double-emission semantics).

Outputs: per-frame state posteriors ``gamma``, expected transition
counts ``xi_sum``, and the evidence ``log Z`` — everything soft-EM
needs; the statistics are plain sums over frames, so they psum across
a data-sharded mesh exactly like the hard-EM path.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from speech_recognition_tpu.utils.numerics import NEG_INF, POS_INF

__all__ = ["forward_backward", "FBResult", "costs_to_scores"]


class FBResult(NamedTuple):
    gamma: jnp.ndarray  # [T, S] posterior state occupancy (prob space)
    # expected frame-edge transition counts: [S, S] (xi_mode="dense") or
    # [MAX_BAND+1, S] with xi_sum[d, u] = count of edge u -> u+d
    # (xi_mode="band" — the production form; the M-step only consumes
    # the self/step band)
    xi_sum: jnp.ndarray
    log_z: jnp.ndarray  # [] total log evidence


def costs_to_scores(cost_mat):
    """Cost (POS_INF-padded) -> log-prob score (NEG_INF-padded)."""
    return jnp.where(cost_mat >= POS_INF / 2, NEG_INF, -cost_mat)


def _lse_mv(log_a, x):
    """logsumexp over 'from': [S(to), S(from)] + [S(from)] -> [S(to)]."""
    z = log_a + x[None, :]
    m = jnp.max(z, axis=1)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    out = jnp.log(jnp.sum(jnp.exp(z - m_safe[:, None]), axis=1)) + m_safe
    return jnp.where(jnp.isfinite(m), out, NEG_INF)


@functools.partial(jax.jit, static_argnames=("eps_depth", "xi_mode"))
def forward_backward(
    nll,
    trans_cost,
    init_cost,
    n_frames,
    eps_trans=None,
    eps_depth: int = 1,
    end_scores=None,
    xi_mode: str = "dense",
):
    """Sum-product pass over one utterance.

    Args:
      nll: ``[T, S]`` emission costs.
      trans_cost / eps_trans / init_cost: graph arrays as for
        :func:`ops.viterbi.viterbi` (cost space).
      end_scores: ``[S]`` terminal log-probs (NEG_INF for non-final
        states); default: uniform over all states at the last frame.
      xi_mode: "dense" accumulates the full ``[S, S]`` expected
        transition counts (oracle/testing); "band" accumulates only the
        ``[MAX_BAND+1, S]`` banded counts the M-step consumes — O(S)
        per frame instead of O(S^2) (off-band frame edges, which
        composed word graphs never have, are ignored in this mode).

    Returns :class:`FBResult`.
    """
    t_len, s = nll.shape
    log_e = -jnp.minimum(nll, POS_INF)  # emission log-prob (un-normalized)
    log_t = costs_to_scores(trans_cost)
    log_init = costs_to_scores(init_cost)
    log_eps = costs_to_scores(eps_trans) if eps_trans is not None else None
    if end_scores is None:
        end_scores = jnp.zeros((s,))

    def eps_fwd(alpha, emis):
        if log_eps is None:
            return alpha
        for _ in range(eps_depth):
            alpha = jnp.logaddexp(alpha, _lse_mv(log_eps, alpha) + emis)
        return alpha

    alpha0 = eps_fwd(log_init + log_e[0], log_e[0])

    def fwd(carry, inputs):
        alpha_prev = carry
        t, emis = inputs
        alpha = _lse_mv(log_t, alpha_prev) + emis
        alpha = eps_fwd(alpha, emis)
        alpha = jnp.where(t < n_frames, alpha, alpha_prev)
        return alpha, alpha

    ts = jnp.arange(1, t_len)
    _, alphas = jax.lax.scan(fwd, alpha0, (ts, log_e[1:]))
    alphas = jnp.concatenate([alpha0[None], alphas], axis=0)  # [T, S]

    # terminal: the forward scan freezes alpha past n_frames, so the
    # last row IS the last valid frame's alpha (no dynamic gather)
    log_z = jax.scipy.special.logsumexp(alphas[-1] + end_scores)

    # backward pass.  beta[t, s] = log P(emissions t+1.. | state s at t).
    def eps_bwd(beta, emis):
        # reverse of eps_fwd: a state can also leave by an eps hop whose
        # destination re-emits the same frame
        if log_eps is None:
            return beta
        for _ in range(eps_depth):
            beta = jnp.logaddexp(beta, _lse_mv(log_eps.T, beta + emis))
        return beta

    beta_last = end_scores

    def bwd(carry, inputs):
        beta_next = carry
        t, emis_next = inputs
        # beta at frame t from frame t+1: through frame edges
        b_eps = eps_bwd(beta_next, emis_next)
        beta = _lse_mv(log_t.T, b_eps + emis_next)
        is_last = t == n_frames - 1
        beta = jnp.where(is_last, end_scores, beta)
        beta = jnp.where(t < n_frames, beta, beta_next)
        return beta, beta

    ts_rev = jnp.arange(t_len - 2, -1, -1)
    _, betas_rev = jax.lax.scan(bwd, beta_last, (ts_rev, log_e[::-1][: t_len - 1]))
    betas = jnp.concatenate([betas_rev[::-1], beta_last[None]], axis=0)
    # fix the final valid frame's beta (scan handles interior frames)
    frame_idx = jnp.arange(t_len)
    betas = jnp.where((frame_idx == n_frames - 1)[:, None], end_scores[None], betas)

    log_gamma = alphas + betas - log_z
    valid = (frame_idx < n_frames)[:, None]
    gamma = jnp.where(valid, jnp.exp(jnp.minimum(log_gamma, 50.0)), 0.0)

    # expected frame-edge transition counts:
    # xi[t][v,u] = alpha[t-1,u] + logT[v,u] + emis[t,v] + beta[t,v] - logZ
    # The per-frame alpha/beta rows ride the scan as xs (streamed
    # slices), never as dynamic gathers by a traced t — the round-1
    # form indexed alphas[t-1]/betas[t] in-scan, the known 10-50x
    # slow-gather pattern on this TPU.
    xs = (ts, log_e[1:], alphas[:-1], betas[1:])
    if xi_mode == "dense":
        def xi_step(acc, inputs):
            t, emis, a_prev, beta_t = inputs
            m = a_prev[None, :] + log_t + (emis + beta_t)[:, None] - log_z
            acc = acc + jnp.where(t < n_frames,
                                  jnp.exp(jnp.minimum(m, 50.0)), 0.0)
            return acc, None

        xi_sum, _ = jax.lax.scan(xi_step, jnp.zeros((s, s)), xs)
    elif xi_mode == "band":
        from speech_recognition_tpu.ops.viterbi_banded import MAX_BAND

        # static band diagonals of logT: band_logt[d][u] = logT[u+d, u]
        band_logt = jnp.stack([
            jnp.concatenate([
                jnp.diagonal(log_t, offset=-d),
                jnp.full((d,), NEG_INF)]) if d else jnp.diagonal(log_t)
            for d in range(MAX_BAND + 1)
        ])

        def xi_step(acc, inputs):
            t, emis, a_prev, beta_t = inputs
            eb = emis + beta_t
            rows = []
            for d in range(MAX_BAND + 1):
                eb_d = eb if d == 0 else jnp.concatenate(
                    [eb[d:], jnp.full((d,), NEG_INF)])  # eb[u+d]
                rows.append(a_prev + band_logt[d] + eb_d - log_z)
            m = jnp.stack(rows)
            acc = acc + jnp.where(t < n_frames,
                                  jnp.exp(jnp.minimum(m, 50.0)), 0.0)
            return acc, None

        xi_sum, _ = jax.lax.scan(xi_step, jnp.zeros((MAX_BAND + 1, s)), xs)
    else:
        raise ValueError(f"unknown xi_mode {xi_mode!r}")

    return FBResult(gamma=gamma, xi_sum=xi_sum, log_z=log_z)
