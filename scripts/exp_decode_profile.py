"""Bisect why standalone viterbi timing differs from the production path.

Run from /root/repo: python scripts/exp_decode_profile.py
"""

import argparse
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--frames", type=int, default=500)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass

    sys.path.insert(0, ".")
    from bench import _bank, _timeit

    from speech_recognition_tpu.decode.connected import (
        _decode_banded_batch,
        connected_graph_arrays,
    )
    from speech_recognition_tpu.models.hmm import bank_nll
    from speech_recognition_tpu.ops.viterbi_banded import (
        banded_arrays,
        banded_backtrace,
        viterbi_banded,
    )

    print(f"backend: {jax.default_backend()}", flush=True)
    bank = _bank()
    graph = connected_graph_arrays(bank, 7)
    bg = banded_arrays(graph)
    rng = np.random.default_rng(1)
    b, t = args.batch, args.frames
    feats = jnp.asarray(rng.standard_normal((b, t, 39)), jnp.float32)
    n_frames = jnp.full((b,), t, jnp.int32)
    audio_s = b * t * 0.01

    def full():
        return _decode_banded_batch(bank, feats, n_frames, bg,
                                    eps_depth=graph.eps_depth)[2]

    # exact clone of production `one`, but local jit
    @jax.jit
    def clone(feats, n_frames):
        def one(x, nf):
            frame_mask = jnp.arange(t) < nf
            nll = bank_nll(bank, x, frame_mask)[:, bg.bank_state]
            final, bp8 = viterbi_banded(nll, bg, nf, eps_depth=graph.eps_depth)
            end_costs = final[bg.end_states] + bg.end_bonus
            best = jnp.argmin(end_costs)
            states, eps_flags = banded_backtrace(
                bp8, bg, bg.end_states[best], nf, eps_depth=graph.eps_depth)
            return states, eps_flags, end_costs[best]
        return jax.vmap(one)(feats, n_frames)

    # clone minus backtrace
    @jax.jit
    def no_bt(feats, n_frames):
        def one(x, nf):
            frame_mask = jnp.arange(t) < nf
            nll = bank_nll(bank, x, frame_mask)[:, bg.bank_state]
            final, bp8 = viterbi_banded(nll, bg, nf, eps_depth=graph.eps_depth)
            end_costs = final[bg.end_states] + bg.end_bonus
            return jnp.sum(bp8[-1]), jnp.min(end_costs)
        return jax.vmap(one)(feats, n_frames)

    # clone minus backtrace, scalar-reduced output
    @jax.jit
    def no_bt_scalar(feats, n_frames):
        def one(x, nf):
            frame_mask = jnp.arange(t) < nf
            nll = bank_nll(bank, x, frame_mask)[:, bg.bank_state]
            final, bp8 = viterbi_banded(nll, bg, nf, eps_depth=graph.eps_depth)
            return jnp.min(final) + jnp.sum(bp8[-1:]).astype(jnp.float32)
        return jnp.sum(jax.vmap(one)(feats, n_frames))

    rows = [
        ("full production decode", full),
        ("local clone (identical)", lambda: clone(feats, n_frames)[2]),
        ("clone minus backtrace", lambda: no_bt(feats, n_frames)[1]),
        ("minus backtrace, scalar out", lambda: no_bt_scalar(feats, n_frames)),
    ]
    for name, fn in rows:
        dt = _timeit(fn)
        print(f"{name:34s} {dt*1e3:7.1f} ms  {audio_s/dt:8.0f} audio-s/s",
              flush=True)


if __name__ == "__main__":
    main()
