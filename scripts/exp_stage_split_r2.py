"""Round-2 stage split of the production decode at the pinned shape,
plus feasibility probes for layout tricks that could replace the eps
one-hot MXU selects (the roofline's dominant term):

  A. emission GEMM (+ transpose to [T, S_bank, B])
  B. Pallas banded Viterbi (bank-mode input)
  C. Pallas backtrace
  probes: tile-concat expansion, [V, 8, B] reshape view + mid-axis
  index, strided sublane slice.

Run from /root/repo: python scripts/exp_stage_split_r2.py [--batch 512]
"""

import argparse
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--frames", type=int, default=500)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass

    from bench import _bank, _timeit_device, log

    from speech_recognition_tpu.decode.connected import connected_graph_arrays
    from speech_recognition_tpu.models.hmm import bank_nll
    from speech_recognition_tpu.ops.viterbi_banded import banded_arrays
    from speech_recognition_tpu.ops.viterbi_banded_pallas import (
        banded_backtrace_tb_pallas,
        banded_topology,
        viterbi_banded_tb_pallas,
    )

    bank = _bank()
    graph = connected_graph_arrays(bank, 7)
    bg = banded_arrays(graph)
    topo = banded_topology(bg)
    b, t = args.batch, args.frames
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.standard_normal((b, t, 39)), jnp.float32)
    nf = jnp.full((b,), t, jnp.int32)
    n_bank = bank.n_models * bank.n_states

    @jax.jit
    def emis_only(dep, nf_):
        def one(x, n):
            return bank_nll(bank, x, jnp.arange(t) < n)
        nb = jax.vmap(one)(feats, nf_)
        return jnp.transpose(nb, (1, 2, 0))

    def body_a(dep):
        nf2 = jnp.where(jnp.isnan(dep), nf + 1, nf)
        return jnp.sum(emis_only(dep, nf2)[0])

    dt = _timeit_device(body_a)
    log(f"A emission+transpose: {dt*1e3:.2f} ms")

    nll_tb_bank = jax.block_until_ready(emis_only(jnp.float32(0), nf))

    def body_b(dep):
        nf2 = jnp.where(jnp.isnan(dep), nf + 1, nf)
        final, bp8, eps_u = viterbi_banded_tb_pallas(
            nll_tb_bank, bg, nf2, topo, eps_depth=graph.eps_depth,
            bank_input=True, return_padded_bp=True)
        return jnp.sum(final) + jnp.sum(bp8[0].astype(jnp.float32))

    dt = _timeit_device(body_b)
    log(f"B pallas viterbi: {dt*1e3:.2f} ms")

    final, bp8, eps_u = viterbi_banded_tb_pallas(
        nll_tb_bank, bg, nf, topo, eps_depth=graph.eps_depth,
        bank_input=True, return_padded_bp=True)
    final, bp8, eps_u = jax.block_until_ready((final, bp8, eps_u))
    ends = bg.end_states[jnp.argmin(final[bg.end_states, :], axis=0)]

    def body_c(dep):
        nf2 = jnp.where(jnp.isnan(dep), nf + 1, nf)
        states, flags = banded_backtrace_tb_pallas(
            bp8, eps_u, bg, ends, nf2, topo, eps_depth=graph.eps_depth)
        return jnp.sum(states[0].astype(jnp.float32))

    dt = _timeit_device(body_c)
    log(f"C pallas backtrace: {dt*1e3:.2f} ms")

    # ---- Mosaic op probes (tiny pallas kernels) ----
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def probe(name, kernel, shapes, outs):
        try:
            got = pl.pallas_call(kernel, out_shape=outs)(*shapes)
            jax.block_until_ready(got)
            log(f"probe {name}: OK")
            return True
        except Exception as e:
            log(f"probe {name}: FAIL ({type(e).__name__}: {str(e)[:200]})")
            return False

    x = jnp.asarray(rng.standard_normal((616, 128)), jnp.float32)  # 77*8
    bank_blk = jnp.asarray(rng.standard_normal((56, 128)), jnp.float32)

    def k_tile(xin, o):  # concat-tile expansion (7x)
        o[...] = jnp.concatenate([xin[...]] * 7, axis=0)

    probe("concat-tile", k_tile, (bank_blk,),
          jax.ShapeDtypeStruct((392, 128), jnp.float32))

    def k_view(xin, o):  # [616, B] -> [77, 8, B] view + mid index
        v = xin[...].reshape(77, 8, 128)
        o[...] = v[:, 4, :]

    probe("reshape-view+index", k_view, (x,),
          jax.ShapeDtypeStruct((77, 128), jnp.float32))

    def k_stride(xin, o):  # strided sublane slice from [385-pad, B]
        o[...] = jax.lax.slice(xin[...], (4, 0), (616, 128), (8, 1))

    probe("strided-slice", k_stride, (x,),
          jax.ShapeDtypeStruct((77, 128), jnp.float32))

    def k_upsample(xin, o):  # [77, B] -> rows v*8 of [616, B]
        up = pltpu.repeat(xin[...], 8, 0)  # may interleave (a,a,..) = what we want
        mask = (jax.lax.broadcasted_iota(jnp.int32, (616, 128), 0) % 8) == 0
        o[...] = jnp.where(mask, up, 0.0)

    probe("repeat-upsample", k_upsample,
          (jnp.asarray(rng.standard_normal((77, 128)), jnp.float32),),
          jax.ShapeDtypeStruct((616, 128), jnp.float32))


if __name__ == "__main__":
    main()
