"""Round-5 Mosaic lowering probes for the fused frontend's data
movement (tpu.concatenate rejects inputs with nonzero offsets on
non-concat dims, and layout inference folds row/lane shifts into
offsets rather than materializing).  Each probe compiles a tiny kernel
and reports PASS/FAIL + a correctness check:

  A. sublane roll (pltpu.roll axis 0) + elementwise subtract (the
     delta-shift pattern without any concatenate)
  B. vector STORE to a non-128-aligned lane slice of a scratch
     (raw_ref[:, 160:320] = part)
  C. VMEM->VMEM DMA assembly of shifted row slices into lane-offset
     column bands (framing without vector relayouts)
  D. lane concat of ref-loaded row-shifted slices (the failing form,
     kept as the control)

Run (TPU): python -u scripts/exp_r5_mosaic_probe.py
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

    nb, fs, f_pad = 64, 160, 56
    rng = np.random.default_rng(0)
    x_np = rng.standard_normal((nb, fs)).astype(np.float32)
    x = jnp.asarray(x_np)

    def run(name, kernel, out_shape, expect, scratch=()):
        try:
            out = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=list(scratch),
            )(x)
            out = np.asarray(jax.block_until_ready(out))
            ok = np.allclose(out, expect, atol=1e-6)
            print(f"{name}: COMPILES, correct={ok}")
        except Exception as e:
            msg = str(e).split("\n")[0][:160]
            print(f"{name}: FAIL ({type(e).__name__}: {msg})")

    # A: sublane roll + subtract
    def kern_a(x_ref, o_ref):
        v = x_ref[...]
        fwd = pltpu.roll(v, nb - 1, 0)  # fwd[i] = v[i+1 mod nb]
        o_ref[...] = fwd - v

    exp_a = np.roll(x_np, -1, 0) - x_np
    run("A sublane-roll+sub", kern_a, (nb, fs), exp_a)

    # B: store to unaligned lane slice
    def kern_b(x_ref, o_ref):
        o_ref[:, 0:fs] = x_ref[...]
        o_ref[:, fs:2 * fs] = x_ref[...] * 2.0
        o_ref[:, 2 * fs:3 * fs] = x_ref[...] * 3.0

    exp_b = np.concatenate([x_np, 2 * x_np, 3 * x_np], axis=1)
    run("B unaligned-lane stores", kern_b, (nb, 3 * fs), exp_b)

    # C: DMA assembly of shifted rows into column bands
    def kern_c(x_ref, o_ref, raw_ref, sem):
        for j in range(3):
            cp = pltpu.make_async_copy(
                x_ref.at[pl.ds(j, f_pad), :],
                raw_ref.at[:, pl.ds(j * fs, fs)], sem)
            cp.start()
            cp.wait()
        o_ref[...] = raw_ref[...] * 2.0

    exp_c = 2.0 * np.concatenate(
        [x_np[j:j + f_pad] for j in range(3)], axis=1)
    run("C dma-assembly", kern_c, (f_pad, 3 * fs), exp_c,
        scratch=(pltpu.VMEM((f_pad, 3 * fs), jnp.float32),
                 pltpu.SemaphoreType.DMA))

    # D: control — lane concat of row-shifted ref loads (known bad)
    def kern_d(x_ref, o_ref):
        parts = [x_ref[pl.ds(j, f_pad), :] for j in range(3)]
        o_ref[...] = jnp.concatenate(parts, axis=1)

    exp_d = np.concatenate([x_np[j:j + f_pad] for j in range(3)], axis=1)
    run("D shifted-load concat", kern_d, (f_pad, 3 * fs), exp_d)

    # E: lane-shift via DMA (pre-emphasis prev-sample pattern)
    def kern_e(x_ref, o_ref, p_ref, sem):
        p_ref[...] = jnp.zeros((nb, fs), jnp.float32)
        cp = pltpu.make_async_copy(x_ref.at[:, pl.ds(0, fs - 1)],
                                   p_ref.at[:, pl.ds(1, fs - 1)], sem)
        cp.start()
        cp.wait()
        cp2 = pltpu.make_async_copy(x_ref.at[pl.ds(0, nb - 1), fs - 1:fs],
                                    p_ref.at[pl.ds(1, nb - 1), 0:1], sem)
        cp2.start()
        cp2.wait()
        o_ref[...] = x_ref[...] - 0.95 * p_ref[...]

    prev = np.zeros_like(x_np)
    prev.reshape(-1)[1:] = x_np.reshape(-1)[:-1]
    exp_e = x_np - 0.95 * prev
    run("E dma-lane-shift preemph", kern_e, (nb, fs), exp_e,
        scratch=(pltpu.VMEM((nb, fs), jnp.float32),
                 pltpu.SemaphoreType.DMA))


if __name__ == "__main__":
    main()
