"""VPU dependent-chain throughput micro (round-5, VERDICT item 6
accounting): the roofline prices VPU work at 3.85 Top/s (8 sublanes x
128 lanes x 4 ALUs), but the banded kernel's band chain is a DEPENDENT
min/add/select sequence — this measures the real sustained rate for
exactly that op mix on the headline kernel's plane shape.

Kernel: K chained (roll + add + min + compare + select) groups on a
[640, 512] f32 plane (the headline's [S8, B] frontier), timed at two K
values; the slope gives cycles per plane-op, hence the achievable
ops/s, hence the honest floor for the Viterbi stage's 24-op chain.

Run (TPU): python -u scripts/exp_r5_vpu_micro.py
"""
import functools
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass
    from bench import _timeit_device, log

    s8, b = 640, 512
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(0, 5, (s8, b)), jnp.float32)

    def make(k_groups):
        def kern(x_ref, o_ref):
            v = x_ref[...]
            w = v + 1.0
            for _ in range(k_groups):
                # one band-chain group ~ 5 plane ops:
                # roll + add + min + cmp + select
                r = pltpu.roll(v, 1, 0)
                c = r + w
                m = jnp.minimum(c, v)
                t = c < v
                v = jnp.where(t, m, v)
            o_ref[...] = v

        @jax.jit
        def run(x):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((s8, b), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x)

        return run

    times = {}
    for k in (8, 64):
        run = make(k)

        def body(dep, x):
            return jnp.sum(run(x + dep * 1e-30))

        times[k] = _timeit_device(body, args=(x0,))
        log(f"K={k} groups: {times[k]*1e6:.1f} us")
    d_ops = (64 - 8) * 5  # plane ops difference
    per_op = (times[64] - times[8]) / d_ops
    elems = s8 * b
    rate = elems / per_op
    log(f"per plane-op ({s8}x{b} = {elems} elems): {per_op*1e9:.1f} ns "
        f"-> sustained {rate/1e12:.2f} T elem-op/s "
        f"(roofline model uses 3.85 T)")


if __name__ == "__main__":
    main()
