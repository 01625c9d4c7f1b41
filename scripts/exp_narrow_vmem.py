"""Probe: Mosaic VMEM accounting for narrow [S, 1] f32 columns at
dict1 scale (S ~ 83k).  If narrow columns are lane-padded to 128, each
one costs ~42 MB and the lex kernel's per-state constants must be
restructured before the 6,250-word dictionary can fit.  The probe
compiles a trivial kernel (plane + column) at increasing vmem_limit
values and reports the smallest limit that compiles — i.e. Mosaic's
scoped-VMEM charge for one plane + one column.

Run from /root/repo on TPU.
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

    S, B = 82848, 64  # dict1-scale SoA rows, serving batch tile

    def kern(col_ref, x_ref, o_ref):
        o_ref[...] = x_ref[...] + col_ref[...]

    @functools.partial(jax.jit, static_argnames=("limit_mb",))
    def run(col, x, limit_mb):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((S, B), jnp.float32),
            in_specs=[
                pl.BlockSpec((S, 1), lambda: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((S, B), lambda: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((S, B), lambda: (0, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=limit_mb * 2**20),
        )(col, x)

    rng = np.random.default_rng(0)
    col = jnp.asarray(rng.standard_normal((S, 1)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((S, B)), jnp.float32)
    # plane in+out = 2 x 21.2 MB = 42.4 MB; column adds 0.4 MB if packed,
    # 42 MB if lane-padded.  Bisect informally over a few limits.
    for mb in (46, 64, 88, 100, 127):
        try:
            out = run(col, x, mb)
            print(f"limit {mb:4d} MB: OK  (sum={float(jnp.sum(out)):.3f})")
            break
        except Exception as e:
            msg = str(e).splitlines()[0][:160]
            print(f"limit {mb:4d} MB: FAIL {msg}")


if __name__ == "__main__":
    main()
