"""Round-4 rescorer profile 8: the committed lattice_rescore with the
SLICED backoff, ring_kernel pallas vs xla, at dict1 scale (the isolated
ring-lookup micro showed XLA's fused masked sum-reduce streams the ring
from HBM at near-roofline, 6x the Pallas VMEM sweep — check it holds
inside the full scan).

Run: python -u scripts/exp_rescore_profile8.py
"""
import pathlib, sys
import numpy as np
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    import jax, jax.numpy as jnp
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass
    from bench import _timeit_device, log
    from speech_recognition_tpu.langmodel.bigram import fit_bigram
    from speech_recognition_tpu.ops.lattice import (
        lattice_rescore, rescore_backoff, rescore_backoff_sliced)

    rng = np.random.default_rng(0)
    T, L, B = 500, 6247, 16
    lm = fit_bigram([[int(x) for x in rng.integers(0, L, 20)]
                     for _ in range(400)], L)
    leaf_word = np.arange(L)
    ec = jnp.asarray(rng.uniform(0, 50, (T, L, B)), jnp.float32)
    durs = rng.integers(1, 40, (T, L, B))
    et = jnp.asarray(np.maximum(np.arange(T)[:, None, None] - durs, 0),
                     jnp.int32)
    lw = jnp.asarray(leaf_word)
    cost_d = jnp.asarray(np.asarray(lm.cost, np.float32))
    start_d = jnp.asarray(np.asarray(lm.start_cost, np.float32))
    end_d = jnp.asarray(np.asarray(lm.end_cost, np.float32))
    nf = jnp.full((B,), T, jnp.int32)
    arrays, counts = rescore_backoff_sliced(lm, leaf_word)
    bo_k = rescore_backoff(lm, leaf_word)
    log(f"sliced counts: {counts}")

    def run(name, **kw):
        def body(dep, ec_, et_):
            r = lattice_rescore(ec_ + dep * jnp.float32(1e-30), et_, lw,
                                cost_d, start_d, end_d, nf, **kw)
            return jnp.sum(r.cost) + jnp.sum(r.pred_w[:, 0, 0].astype(
                jnp.float32))
        dt = _timeit_device(body, args=(ec, et))
        log(f"{name}: {dt*1e3:.1f} ms ({B*T*0.01/dt:.0f} audio-s/s)")

    run("A sliced + pallas ring", backoff=arrays, backoff_counts=counts)
    run("B sliced + xla ring", backoff=arrays, backoff_counts=counts,
        ring_kernel="xla")
    run("C sliced + xla ring d64", backoff=arrays, backoff_counts=counts,
        ring_kernel="xla", max_dur=64)
    run("D dense-K + xla ring", backoff=bo_k, ring_kernel="xla")


if __name__ == "__main__":
    main()
