"""Micro-bench: ring lookup strategies at the dict1 rescorer block
shape (ring [128, 16, 6272] f32, lookup [8, 16, 6272] int32 slots).

  A pallas sweep   — committed _hq_sweep_pallas (dmax compare+selects)
  B take_along     — ONE leading-axis gather (reads 3.2 MB of the ring)
  C xla sum-reduce — the round-4 pre-kernel form (baseline)

Run: python -u scripts/exp_ring_lookup_micro.py
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
    from speech_recognition_tpu.ops.lattice import _hq_sweep_pallas
    from speech_recognition_tpu.utils.numerics import POS_INF

    rng = np.random.default_rng(0)
    D, F, B, L = 128, 8, 16, 6272
    NB = 62  # ~one utterance worth of blocks
    ring = jnp.asarray(rng.uniform(0, 50, (D, B, L)), jnp.float32)
    slotm = jnp.asarray(rng.integers(0, D + 1, (F, B, L)), jnp.int32)

    def scan_over(fn):
        @jax.jit
        def go(dep, ring, slotm):
            def step(c, _):
                out = fn(c, slotm)
                return c + out[:1] * jnp.float32(1e-30), None
            out, _ = jax.lax.scan(step, ring + dep * 1e-30, None, length=NB)
            return jnp.sum(out)
        return go

    def run(name, fn):
        go = scan_over(fn)
        dt = _timeit_device(lambda dep, r, s: go(dep, r, s),
                            args=(ring, slotm))
        log(f"{name}: {dt*1e3:.1f} ms / {NB} blocks "
            f"({dt/NB/F*1e6:.1f} us/frame)")

    def pallas_sweep(r, s):
        return _hq_sweep_pallas(r, s, D)

    def take_along(r, s):
        sc = jnp.minimum(s, D - 1)
        out = jnp.take_along_axis(r, sc, axis=0)
        return jnp.where(s >= D, POS_INF, out)

    def xla_reduce(r, s):
        iota_d = jnp.arange(D, dtype=jnp.int32)[:, None, None, None]
        sel = (iota_d == s[None]).astype(r.dtype)
        out = jnp.sum(r[:, None, :, :] * sel, axis=0)
        return jnp.where(s < D, out, POS_INF)

    # parity
    a = jax.jit(pallas_sweep)(ring, slotm)
    b = jax.jit(take_along)(ring, slotm)
    log(f"parity take_along vs sweep: "
        f"{'OK' if bool(jnp.all(a == b)) else 'FAIL'}")

    run("A pallas sweep", pallas_sweep)
    run("B take_along", take_along)
    run("C xla sum-reduce", xla_reduce)


if __name__ == "__main__":
    main()
