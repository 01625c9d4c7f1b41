"""Characterize the per-grid-step overhead: K-blocking x semantics.
Run: python scripts/exp_pallas_overhead.py
"""

import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass

    sys.path.insert(0, ".")
    from bench import _timeit

    t = 512
    rng = np.random.default_rng(1)
    nll_small = jnp.asarray(rng.uniform(0, 10, (t, 8, 128)).astype(np.float32))
    const = lambda *_: (0, 0)

    def make(k, sem):
        def kern(nll_ref, fin_ref, cost_ref):
            acc = cost_ref[...]
            for i in range(k):
                acc = acc * 0.5 + nll_ref[i]
            cost_ref[...] = acc
            fin_ref[...] = acc

        params = {}
        if sem is not None:
            params["dimension_semantics"] = (sem,)
        return pl.pallas_call(
            kern, grid=(t // k,),
            in_specs=[pl.BlockSpec((k, 8, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec((8, 128), const, memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((8, 128), jnp.float32)],
            scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
            compiler_params=pltpu.CompilerParams(**params),
        )

    print(f"backend: {jax.default_backend()}", flush=True)
    for sem in ("arbitrary", None):
        for k in (1, 4, 16):
            call = make(k, sem)
            fn = jax.jit(lambda x: call(x)[0].sum())
            dt = _timeit(lambda: fn(nll_small))
            print(f"RESULT sem={str(sem):9s} K={k:2d}: {dt*1e3:7.2f} ms "
                  f"({dt/t*1e6:5.2f} us/frame, {dt/(t//k)*1e6:6.2f} us/step)",
                  flush=True)


if __name__ == "__main__":
    main()
