"""Round-5 measurement backlog, part 1 (VERDICT r4 item 4):

(a) soft-EM at 32 x 300 — dense-auto vs banded-forced, on-chip.  The
    round-4 `pad_graphs_auto` crossover shipped without the measurement
    that defines it (bar: dense >= 17k utts/s at transcript scale).
(b) the streaming bench (non-incremental push API + incremental
    flush_every mode) at the round-3 shape 64 x 256 x 20 (bar:
    incremental within ~1.5x of non-incremental).

Run (TPU, serialized): python -u scripts/exp_r5_measure1.py
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass
    import bench

    bench.log(f"backend: {jax.default_backend()}")

    bench.log("== soft-EM 32x300, auto graph format ==")
    v_auto = bench.bench_soft_em(32, 300, banded="auto")
    bench.log("== soft-EM 32x300, banded-forced ==")
    v_band = bench.bench_soft_em(32, 300, banded=True)
    bench.log(f"RESULT soft_em auto={v_auto:.0f} banded={v_band:.0f} utts/s")

    bench.log("== streaming bench (incl. incremental) 64x256x20 ==")
    bench.bench_streaming(64, 256, 20)


if __name__ == "__main__":
    main()
