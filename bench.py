"""Benchmark driver. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: connected-digit decode throughput in audio-seconds per
second per chip — the workload of the reference's ``main.py`` (7-slot x
11-digit sausage over 5-state 4-mix GMM-HMMs, 39-dim features), from
features to word sequences (emission GEMM + graph Viterbi + backtrace).

``vs_baseline``: ratio against the reference implementation's
O(T*S^2) per-cell Python decoder (``decode_hmm_states``,
/root/reference/sr/recognition/decode.py:97-124), re-measured live on
this machine via the faithful oracle in tests/oracles/dp_ref.py on a
short utterance (its cost is linear in T, so the short run is an
unbiased per-frame estimate).

Extra diagnostics go to stderr; stdout carries exactly the JSON line.
Run ``python bench.py --help`` for sub-benchmarks.
"""

import argparse
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _bank(n_models=11, n_states=5, n_mix=4, dim=39, seed=0):
    import jax.numpy as jnp

    from speech_recognition_tpu.data.synthetic import random_gmm_hmm
    from speech_recognition_tpu.models.hmm import GMMHMM, HMMBank
    from speech_recognition_tpu.utils.numerics import to_cost_matrix

    rng = np.random.default_rng(seed)
    ms = []
    for _ in range(n_models):
        p = random_gmm_hmm(rng, n_states=n_states, n_mix=n_mix, dim=dim, sep=3.0)
        ms.append(
            GMMHMM(
                means=jnp.asarray(p["means"], jnp.float32),
                log_vars=jnp.log(jnp.asarray(p["variances"], jnp.float32)),
                log_weights=jnp.log(jnp.asarray(p["weights"], jnp.float32)),
                trans_cost=jnp.asarray(to_cost_matrix(p["trans"])),
            )
        )
    return HMMBank.stack(ms)


def _timeit(fn, warmup=2, iters=5):
    """fn must return a (small) array; we fetch it to host each iteration
    because jax.block_until_ready does not actually synchronize on the
    axon TPU tunnel (verified empirically) — a host fetch does.

    NOTE: this includes the tunnel's per-dispatch round trip (~10-50 ms,
    varies) — fine for pipelines that cost >> that, misleading for fast
    kernels.  Use :func:`_timeit_device` for per-kernel device time.
    """
    for _ in range(warmup):
        np.asarray(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(fn())
    return (time.perf_counter() - t0) / iters


#: timing regime of the last _timeit_device call: "slope" (clean
#: steady-state device time) or "upper-bound" (noise-dominated; the
#: number includes dispatch overhead and UNDERSELLS the kernel).  The
#: headline JSON carries this so a degraded artifact is self-labeling
#: (round-1 VERDICT: the fallback silently produced a 22%-low figure).
LAST_REGIME = "unmeasured"


def _timeit_device(body, n_lo=2, n_hi=12, reps=3, args=()):
    """Steady-state device time per iteration of ``body``.

    ``body(dep_scalar, *args) -> scalar`` must thread the dependence
    scalar into its inputs (e.g. ``nf = where(isnan(dep), nf + 1,
    nf)``) so iterations chain and can't be elided.  Runs ``n`` chained
    iterations inside ONE jit (lax.fori_loop) for two values of n; the
    slope removes both the tunnel's per-dispatch round trip (~10-50 ms
    on axon) and the fixed jit entry cost.  This is the honest
    throughput number: in production decodes are pipelined back to
    back, they don't pay a host round trip each.

    Large device arrays MUST ride ``args`` (forwarded to ``body``), not
    the closure: closed-over arrays embed as HLO constants and the
    remote AOT service rejects programs over ~100 MB with HTTP 413.

    Sets :data:`LAST_REGIME` to "slope" or "upper-bound"."""
    global LAST_REGIME
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(n, *xs):  # dynamic trip count: ONE compile serves every n
        def step(_, acc):
            return acc + body(acc, *xs) * jnp.float32(1e-30)
        return jax.lax.fori_loop(0, n, step, jnp.float32(0.0))

    np.asarray(run(jnp.int32(1), *args))  # compile + warm

    def t(n):
        t0 = time.perf_counter()
        for _ in range(reps):
            np.asarray(run(jnp.int32(n), *args))
        return (time.perf_counter() - t0) / reps

    # grow n_hi until the delta clears tunnel noise (~10-50 ms/dispatch)
    while True:
        tlo, thi = t(n_lo), t(n_hi)
        if thi - tlo >= 0.05 or n_hi >= 2048:
            break
        n_hi *= 4
    if thi - tlo <= 0:
        # noise-dominated even at the n_hi cap: report the conservative
        # upper bound (total time / iterations, overhead included)
        # rather than a garbage slope — and SAY SO in the artifact
        log(f"WARNING: device-time slope noise-dominated at n={n_hi}; "
            f"reporting upper bound {thi / n_hi * 1e3:.3f} ms/iter")
        LAST_REGIME = "upper-bound"
        return thi / n_hi
    LAST_REGIME = "slope"
    return (thi - tlo) / (n_hi - n_lo)


def bench_connected_decode(batch=64, frames=500, n_slots=7, frame_step_s=0.01):
    """Headline: audio-seconds/s of sausage-graph connected decode
    (emission GEMM + banded Viterbi + backtrace), steady-state device
    time via chained iterations (see _timeit_device)."""
    import jax
    import jax.numpy as jnp

    from speech_recognition_tpu.decode.connected import _decode_banded_batch
    from speech_recognition_tpu.decode.connected import connected_graph_arrays
    from speech_recognition_tpu.ops.viterbi_banded import banded_arrays

    bank = _bank()
    graph = connected_graph_arrays(bank, n_slots)
    bg = banded_arrays(graph)
    from speech_recognition_tpu.ops.viterbi_banded_pallas import default_pallas_topo

    topo = default_pallas_topo(bg)
    log(f"graph: {graph.n_states} emitting states ({bg.n_words} word arcs), "
        f"eps_depth {graph.eps_depth}, "
        f"{'pallas' if topo is not None else 'banded-scan'} backend")

    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.standard_normal((batch, frames, 39)), jnp.float32)
    n_frames = jnp.full((batch,), frames, jnp.int32)

    from speech_recognition_tpu.decode.connected import states_to_words_device

    slot_arr = jnp.asarray(np.asarray(graph.slot, np.int32))
    uw = 0
    if topo is not None and topo.uniform_w and np.array_equal(
            np.asarray(graph.slot),
            np.arange(graph.n_states) // topo.uniform_w):
        uw = int(topo.uniform_w)
    label_arr = jnp.asarray(
        np.asarray(graph.slot_label, np.int32) if uw
        else np.asarray(graph.slot_label[graph.slot], np.int32))
    counts = np.bincount(np.asarray(graph.slot))
    max_words = min(frames, frames // max(1, int(counts[counts > 0].min())) + 1)

    def body(dep):
        # PRODUCTION path: the full wav-side chain to word ids on device
        # (emission GEMM + Pallas banded Viterbi + backtrace + the
        # states_to_words_device compaction); only [B, W] ids would
        # cross the host boundary
        nf = jnp.where(jnp.isnan(dep), n_frames + 1, n_frames)
        states, eps_flags, costs = _decode_banded_batch(
            bank, feats, nf, bg, eps_depth=graph.eps_depth, pallas_topo=topo
        )
        words, n_words = states_to_words_device(
            slot_arr, label_arr, states, eps_flags, nf, max_words=max_words,
            uniform_w=uw)
        return jnp.sum(costs) + jnp.sum(words[:, 0].astype(jnp.float32))

    dt = _timeit_device(body)
    audio_s = batch * frames * frame_step_s
    thr = audio_s / dt
    log(f"connected decode (production, wav->word-ids on device): "
        f"{batch}x{frames} frames in "
        f"{dt*1e3:.2f} ms device-time ({LAST_REGIME}) -> {thr:.0f} audio-s/s")

    # alternate word-trace path: NO backpointer plane, NO backtrace
    # kernel — kept for its bounded-memory property; measured ~2x the
    # production path (RESULTS round 4/5), so it does NOT take the
    # headline
    if topo is not None and topo.uniform_w:
        def body_wt(dep):
            nf = jnp.where(jnp.isnan(dep), n_frames + 1, n_frames)
            seqs_dev, costs = _decode_banded_words_device(
                bank, graph, bg, feats, nf, topo)
            return jnp.sum(costs) + jnp.sum(seqs_dev[0].astype(jnp.float32))

        from speech_recognition_tpu.ops.gmm import (
            augment_dtb,
            gmm_emission_weights,
        )
        from speech_recognition_tpu.ops.viterbi_banded_pallas import (
            viterbi_banded_wordtrace_pallas,
            wordtrace_words_device,
        )

        w_gm, lw_gm = gmm_emission_weights(*bank.flat_states())
        aug = augment_dtb(feats)

        def _decode_banded_words_device(bank_, graph_, g_, feats_, nf_,
                                        topo_):
            final, eps_u, eps_tau, ftau = viterbi_banded_wordtrace_pallas(
                aug, g_, nf_, topo_, input_ubt=True,
                fuse_emission=True, bank_gemm=(w_gm, lw_gm))
            end_costs = final[g_.end_states, :] + g_.end_bonus[:, None]
            best = jnp.argmin(end_costs, axis=0)
            costs = jnp.take_along_axis(end_costs, best[None, :], axis=0)[0]
            end_state = g_.end_states[best]
            best_slot = end_state // topo_.uniform_w
            entry = jnp.take_along_axis(ftau, end_state[None, :], axis=0)[0]
            words_rev, _ = wordtrace_words_device(
                eps_u, eps_tau, best_slot, entry, nf_,
                max_words=frames // topo_.uniform_w + 1)
            return (words_rev,), costs

        dt_wt = _timeit_device(body_wt)
        thr_wt = audio_s / dt_wt
        log(f"connected decode (word-trace, alternate bounded-memory "
            f"path): {batch}x{frames} in {dt_wt*1e3:.2f} ms device-time "
            f"({LAST_REGIME}) -> {thr_wt:.0f} audio-s/s")

    from speech_recognition_tpu.ops.viterbi_banded import eps_ranges
    from speech_recognition_tpu.utils import roofline as rl

    n_bank = bank.n_models * bank.n_states
    terms = sum((r_hi - r_lo) * (u_hi - u_lo)
                for (r_lo, r_hi, u_lo, u_hi) in eps_ranges(bg))
    uw = topo.uniform_w if topo is not None else 0
    stages = {
        "emission": rl.emission_gemm(batch, frames, n_bank, bank.n_mix, 39),
        "viterbi": rl.banded_viterbi(batch, frames, graph.n_states, n_bank,
                                     int(bg.word_starts.shape[0]),
                                     int(bg.word_ends.shape[0]),
                                     eps_terms=terms, uniform_w=uw),
        "backtrace": rl.banded_backtrace(batch, frames, graph.n_states,
                                         int(bg.word_starts.shape[0]),
                                         int(bg.word_ends.shape[0]),
                                         uniform_w=uw),
        # device words-out compaction: two table takes + cumsum + the
        # [B, T, W] iota-compare masked reduce
        "words": rl.stage_bound(
            vpu_ops=batch * frames * (max_words + 8.0),
            hbm_bytes=batch * frames * 2 * 4.0),
    }
    log(rl.report(stages, dt))
    return thr


def bench_reference_baseline(frames=40, n_slots=7, frame_step_s=0.01):
    """Throughput of the ACTUAL reference implementation (imported
    unmodified from /root/reference via tests/ref_shim): 11 reference
    GMM-HMM objects composed into the 7-slot graph by its own
    build_state_sequences, decoded by its decode_hmm_states with its
    linear-space per-frame GMM evaluation — main.py:35-62 verbatim.
    Cost is linear in T, so a short run is an unbiased per-frame
    estimate.  Falls back to the numpy oracle if the import fails."""
    sys.path.insert(0, ".")
    rng = np.random.default_rng(2)
    n_models, s, d = 11, 5, 39

    try:
        from tests.ref_shim import load_reference

        ref = load_reference()
        models = []
        for _ in range(n_models):
            means = rng.normal(0, 2, (s, 4, d))
            variances = rng.uniform(0.5, 2.0, (s, 4, d))
            weights = np.full((s, 4), 0.25)
            h = ref.hmm.HMM(s)
            h.use_gmm = True
            states = []
            for i in range(s):
                g = ref.hmm_state.GMM(means[i, 0], variances[i, 0], 4)
                g.update_models(means[i], variances[i], weights[i])
                states.append(g)
            h.gmm_states = states
            trans = np.full((s, s), np.inf)
            for i in range(s):
                trans[i, i] = 0.5
                if i + 1 < s:
                    trans[i + 1, i] = 0.9
            h.transitions = trans
            models.append(h)
        seq, trans_ref, end_pts = ref.continuous.build_state_sequences(
            models, [list(range(n_models))] * n_slots
        )
        x = rng.normal(0, 2, (frames, d))
        t0 = time.perf_counter()
        ref.decode.decode_hmm_states(
            x, seq, trans_ref, end_points=[[e, -1] for e in end_pts]
        )
        dt = time.perf_counter() - t0
        thr = frames * frame_step_s / dt
        log(f"reference (actual code): {frames} frames ({len(seq)} states) "
            f"in {dt:.1f} s -> {thr:.4f} audio-s/s")
        return thr
    except Exception as e:  # pragma: no cover
        log(f"reference import failed ({e}); using oracle")
        from tests.oracles.dp_ref import decode_hmm_states_oracle

        n_ref = 1 + n_slots * (n_models * s + 1)
        trans = np.full((n_ref, n_ref), np.inf)
        np.fill_diagonal(trans, 0.5)
        emis = rng.uniform(0, 5, size=(frames, n_ref))
        t0 = time.perf_counter()
        decode_hmm_states_oracle(emis, trans, np.zeros(n_ref, bool), None)
        dt = time.perf_counter() - t0
        return frames * frame_step_s / dt


def bench_frontend(batch=64, samples=80000):
    import jax
    import jax.numpy as jnp

    from speech_recognition_tpu.config import FrontendConfig
    from speech_recognition_tpu.ops.frontend import mfcc39_auto, padded_length

    cfg = FrontendConfig()
    # pad to the fused kernel's copy-free launch size (a multiple of the
    # frame step covering ceil8(F) + 3 blocks); the XLA path ignores the
    # extra tail
    L = ((padded_length(cfg, samples) + 159) // 160 + 8) * 160
    rng = np.random.default_rng(0)
    sig = jnp.asarray(rng.standard_normal((batch, L)), jnp.float32)
    lens = jnp.full((batch,), samples, jnp.int32)

    def body(dep):
        l2 = jnp.where(jnp.isnan(dep), lens - 1, lens)
        return jnp.sum(mfcc39_auto(sig, l2, cfg)[0])

    dt = _timeit_device(body)
    audio_s = batch * samples / cfg.sample_rate
    log(f"frontend ({'fused-pallas' if jax.default_backend() == 'tpu' else 'xla'}): "
        f"{audio_s:.0f} audio-s in {dt*1e3:.2f} ms device-time "
        f"-> {audio_s/dt:.0f} audio-s/s")
    return audio_s / dt


def bench_embedded_train(batch=32, frames=300):
    import jax
    import jax.numpy as jnp

    from speech_recognition_tpu.models.graph import build_word_graph, pad_graphs
    from speech_recognition_tpu.train.embedded_step import embedded_step

    bank = _bank()
    trans_np = [np.asarray(bank.trans_cost[i]) for i in range(bank.n_models)]
    rng = np.random.default_rng(3)
    labels = [[int(rng.integers(0, 11)) for _ in range(5)] for _ in range(batch)]
    graphs = [build_word_graph(trans_np, [[l] for l in ls]) for ls in labels]
    gb, eps_depth = pad_graphs(graphs)
    g = {k: jnp.asarray(gb[k]) for k in ("trans", "eps_trans", "init_cost", "end_states", "bank_state")}
    feats = jnp.asarray(rng.standard_normal((batch, frames, 39)), jnp.float32)
    nf = jnp.full((batch,), frames, jnp.int32)

    def body(dep):
        nf2 = jnp.where(jnp.isnan(dep), nf + 1, nf)
        return embedded_step(bank, feats, nf2, g, eps_depth=eps_depth)[1].total_cost

    dt = _timeit_device(body)
    log(f"embedded step: {batch} utts in {dt*1e3:.2f} ms device-time "
        f"-> {batch/dt:.0f} utts/s")
    return batch / dt


def bench_pipeline(batch=256, samples=80000, n_slots=7):
    """Device-resident wav -> words: one jit for MFCC + emissions +
    banded Viterbi + backtrace, via the production batched decode."""
    import jax
    import jax.numpy as jnp

    from speech_recognition_tpu.config import FrontendConfig
    from speech_recognition_tpu.decode.connected import (
        _decode_banded_batch,
        connected_graph_arrays,
    )
    from speech_recognition_tpu.ops.frontend import mfcc39_auto, padded_length
    from speech_recognition_tpu.ops.viterbi_banded import banded_arrays

    cfg = FrontendConfig()
    bank = _bank()
    graph = connected_graph_arrays(bank, n_slots)
    bg = banded_arrays(graph)
    L = ((padded_length(cfg, samples) + 159) // 160 + 8) * 160
    rng = np.random.default_rng(0)
    sig = jnp.asarray(rng.standard_normal((batch, L)) * 3000, jnp.float32)
    lens = jnp.full((batch,), samples, jnp.int32)

    from speech_recognition_tpu.ops.viterbi_banded_pallas import default_pallas_topo

    topo = default_pallas_topo(bg)

    def body(dep):
        l2 = jnp.where(jnp.isnan(dep), lens - 1, lens)
        feats, nf = mfcc39_auto(sig, l2, cfg)
        states, _, costs = _decode_banded_batch(bank, feats, nf, bg,
                                                eps_depth=graph.eps_depth,
                                                pallas_topo=topo)
        return jnp.sum(costs) + jnp.sum(states[:, 0].astype(jnp.float32))

    dt = _timeit_device(body)
    audio_s = batch * samples / cfg.sample_rate
    log(f"pipeline: {audio_s:.0f} audio-s in {dt*1e3:.2f} ms device-time "
        f"-> {audio_s/dt:.0f} audio-s/s")
    return audio_s / dt


def bench_lex_pipeline(batch=128, samples=80000, n_words=1000):
    """Device-resident wav -> words over the 1,000-word trie: one jit
    for MFCC + unit-bank emissions + Pallas lex Viterbi + Pallas
    backtrace — the big-vocabulary serving pipeline."""
    import jax
    import jax.numpy as jnp

    from speech_recognition_tpu.config import FrontendConfig
    from speech_recognition_tpu.data.synthetic import random_gmm_hmm
    from speech_recognition_tpu.models.hmm import GMMHMM, HMMBank, bank_nll
    from speech_recognition_tpu.models.lexgraph import build_lex_graph
    from speech_recognition_tpu.ops.frontend import mfcc39_auto, padded_length
    from speech_recognition_tpu.ops.viterbi_lex_pallas import (
        lex_backtrace_soa_pallas,
        lex_pallas_plan,
        viterbi_lex_pallas,
    )
    from speech_recognition_tpu.utils.numerics import to_cost_matrix

    cfg = FrontendConfig()
    units = list("abcdefgh")
    unit_ids = {ch: i for i, ch in enumerate(units)}
    rng = np.random.default_rng(7)
    models, unit_trans = [], []
    for _ in units:
        p = random_gmm_hmm(rng, n_states=3, n_mix=4, dim=39, sep=4.0)
        models.append(GMMHMM(
            means=jnp.asarray(p["means"], jnp.float32),
            log_vars=jnp.log(jnp.asarray(p["variances"], jnp.float32)),
            log_weights=jnp.log(jnp.asarray(p["weights"], jnp.float32)),
            trans_cost=jnp.asarray(to_cost_matrix(p["trans"])),
        ))
        unit_trans.append(p["trans"])
    bank = HMMBank.stack(models)
    vocab = set()
    while len(vocab) < n_words:
        n = int(rng.integers(3, 9))
        vocab.add("".join(rng.choice(units, n)))
    lexg = build_lex_graph(sorted(vocab), unit_trans, unit_ids,
                           word_insertion_cost=0.5)
    plan = lex_pallas_plan(lexg)

    L = ((padded_length(cfg, samples) + 159) // 160 + 8) * 160
    sig = jnp.asarray(rng.standard_normal((batch, L)) * 3000, jnp.float32)
    lens = jnp.full((batch,), samples, jnp.int32)

    def body(dep):
        l2 = jnp.where(jnp.isnan(dep), lens - 1, lens)
        feats, nf = mfcc39_auto(sig, l2, cfg)
        t = feats.shape[1]

        def emis(x, n):
            return bank_nll(bank, x, jnp.arange(t) < n)

        nll_tub = jnp.transpose(jax.vmap(emis)(feats, nf), (1, 2, 0))
        final, bp8, eps_u = viterbi_lex_pallas(nll_tub, plan, nf, plan.topo)
        end_costs = final[plan.ends_soa, :] + lexg.banded.end_bonus[:, None]
        best = jnp.argmin(end_costs, axis=0)
        states, _ = lex_backtrace_soa_pallas(
            bp8, eps_u, plan, plan.ends_soa[best], nf, plan.topo)
        return (jnp.sum(jnp.take_along_axis(end_costs, best[None], 0))
                + jnp.sum(states[0].astype(jnp.float32)))

    dt = _timeit_device(body)
    audio_s = batch * samples / cfg.sample_rate
    log(f"lex pipeline ({n_words} words): {audio_s:.0f} audio-s in "
        f"{dt*1e3:.2f} ms device-time ({LAST_REGIME}) "
        f"-> {audio_s/dt:.0f} audio-s/s")

    # words-out tail the serving API actually pays (round-2 VERDICT
    # item 6): fetch the [B, T] paths and run the vectorized host word
    # recovery; reported separately because the path fetch rides the
    # axon tunnel (production hosts pay PCIe instead)
    from speech_recognition_tpu.models.lexgraph import lex_words_from_path_batch

    feats, nf = mfcc39_auto(sig, lens, cfg)
    t = feats.shape[1]
    nll_tub = jnp.transpose(
        jax.vmap(lambda x, n: bank_nll(bank, x, jnp.arange(t) < n))(feats, nf),
        (1, 2, 0))
    final, bp8, eps_u = viterbi_lex_pallas(nll_tub, plan, nf, plan.topo)
    end_costs = final[plan.ends_soa, :] + lexg.banded.end_bonus[:, None]
    best = jnp.argmin(end_costs, axis=0)
    states, flags = lex_backtrace_soa_pallas(
        bp8, eps_u, plan, plan.ends_soa[best], nf, plan.topo)
    jax.block_until_ready(states)
    t0 = time.perf_counter()
    s_np = np.asarray(states).T  # [B, T] fetch
    f_np = np.asarray(flags).T
    words = lex_words_from_path_batch(lexg, s_np, np.asarray(nf), f_np)
    t_words = time.perf_counter() - t0
    n_w = sum(len(w) for w in words)
    log(f"  + words-out: {n_w} words for {batch} streams in "
        f"{t_words*1e3:.0f} ms wall (fetch {s_np.nbytes + f_np.nbytes:,} B "
        f"over the tunnel + vectorized host recovery) -> full serving "
        f"{audio_s/(dt + t_words):.0f} audio-s/s")
    return audio_s / dt


def bench_lextree(batch=64, frames=500, n_words=1000, frame_step_s=0.01,
                  beam_k=0, unroll=4, pallas=False, frames_per_step=2,
                  dict1=False):
    """Big-vocabulary lextree decode: 1,000-word trie over 8 unit
    models (~9.6k states), full exact kernel or the token beam.
    ``dict1=True`` swaps in the reference's own 6,250-word dictionary
    (/root/reference/tests/test_data/dict1.txt, 31 units, ~83k
    states — the block-banded Pallas format)."""
    import jax
    import jax.numpy as jnp

    from speech_recognition_tpu.models.lexgraph import build_lex_graph
    from speech_recognition_tpu.ops.viterbi_banded import (
        banded_backtrace_tb,
        viterbi_banded_tb,
    )

    rng = np.random.default_rng(7)
    if dict1:
        raw = [line.strip() for line in
               open("/root/reference/tests/test_data/dict1.txt")][1:]
        seen, words = set(), []
        for w in raw:
            if w and w not in seen:
                seen.add(w)
                words.append(w)
        units = sorted(set("".join(words)))
    else:
        units = list("abcdefgh")
    unit_ids = {ch: i for i, ch in enumerate(units)}
    su = 3
    trans = []
    for _ in units:
        t = np.full((su, su), np.inf)
        for i in range(su):
            t[i, i] = rng.uniform(0.1, 1)
            if i + 1 < su:
                t[i + 1, i] = rng.uniform(0.1, 1)
        trans.append(t)
    if not dict1:
        vocab = set()
        while len(vocab) < n_words:
            n = int(rng.integers(3, 9))
            vocab.add("".join(rng.choice(units, n)))
        words = sorted(vocab)
    lexg = build_lex_graph(words, trans, unit_ids, word_insertion_cost=0.5)
    bg = lexg.banded
    log(f"lextree: {lexg.n_words} words, {lexg.n_arcs} arcs, "
        f"{lexg.n_states} states "
        f"(loop graph would be {sum(len(w) for w in words) * su})")

    e = jnp.asarray(rng.uniform(0, 5, (batch, frames, len(units) * su)),
                    jnp.float32)
    nf = jnp.full((batch,), frames, jnp.int32)

    if beam_k:
        from speech_recognition_tpu.ops.beam import (
            beam_backtrace,
            beam_search,
            beam_tables,
        )

        tables = beam_tables(bg, leaf_word=lexg.leaf_word)

        def body(dep):
            nf2 = jnp.where(jnp.isnan(dep), nf + 1, nf)

            def one(nll_b, n_b):
                fst, fco, _, _, tok_p, tok_w = beam_search(
                    nll_b, tables, n_b, beam_k)
                cost, words_rev = beam_backtrace(fst, fco, tok_p, tok_w,
                                                 tables, n_b)
                return cost + jnp.sum(words_rev[:2].astype(jnp.float32))

            return jnp.sum(jax.vmap(one)(e, nf2))
    elif pallas and dict1:
        from speech_recognition_tpu.ops.viterbi_lex_pallas import (
            lex_backtrace_wide,
            lex_pallas_plan,
            lex_pallas_wide_batch_chunk,
            viterbi_lex_pallas_wide,
        )

        plan = lex_pallas_plan(lexg, layout="wide")
        bc = lex_pallas_wide_batch_chunk(plan, batch)
        if bc and bc < batch:
            log(f"dict1 wide kernel: clamping batch {batch} -> {bc} "
                f"(VMEM envelope)")
            batch = bc
            e = e[:batch]
            nf = nf[:batch]
        log(f"lextree pallas WIDE plan: a_pad={plan.topo.a_pad} "
            f"W={plan.topo.sel_w} blocks={len(plan.topo.sel_blocks)}")

        def body(dep):
            nf2 = jnp.where(jnp.isnan(dep), nf + 1, nf)
            nll_tub = jnp.transpose(e, (1, 2, 0))
            final, bp8, eps_u, eps_prev = viterbi_lex_pallas_wide(
                nll_tub, plan, nf2, plan.topo,
                frames_per_step=frames_per_step)
            end_costs = final[:, plan.ends_soa] + bg.end_bonus[None, :]
            best = jnp.argmin(end_costs, axis=1)
            states, _ = lex_backtrace_wide(
                bp8, eps_u, eps_prev, plan, plan.ends_soa[best], nf2,
                plan.topo)
            return (jnp.sum(jnp.take_along_axis(end_costs, best[:, None], 1))
                    + jnp.sum(states[0].astype(jnp.float32)))
    elif pallas:
        from speech_recognition_tpu.ops.viterbi_lex_pallas import (
            lex_backtrace_soa_pallas as lex_backtrace_soa,
            lex_pallas_plan,
            viterbi_lex_pallas,
        )

        plan = lex_pallas_plan(lexg)
        log(f"lextree pallas plan: a_pad={plan.topo.a_pad} "
            f"levels={plan.topo.level_sizes}")

        def body(dep):
            nf2 = jnp.where(jnp.isnan(dep), nf + 1, nf)
            nll_tub = jnp.transpose(e, (1, 2, 0))
            final, bp8, eps_u, eps_prev = viterbi_lex_pallas(
                nll_tub, plan, nf2, plan.topo,
                frames_per_step=frames_per_step, emit_eps_prev=True)
            end_costs = final[plan.ends_soa, :] + bg.end_bonus[:, None]
            best = jnp.argmin(end_costs, axis=0)
            states, _ = lex_backtrace_soa(bp8, eps_u, plan,
                                          plan.ends_soa[best], nf2, plan.topo,
                                          eps_prev=eps_prev)
            return (jnp.sum(jnp.take_along_axis(end_costs, best[None], 0))
                    + jnp.sum(states[0].astype(jnp.float32)))
    else:
        bank_state = bg.bank_state

        def body(dep):
            nf2 = jnp.where(jnp.isnan(dep), nf + 1, nf)
            nll_tb = jnp.transpose(e, (1, 2, 0))[:, bank_state, :]
            final, bp8, eps_u = viterbi_banded_tb(nll_tb, bg, nf2,
                                                  unroll=unroll)
            end_costs = final[bg.end_states, :] + bg.end_bonus[:, None]
            best = jnp.argmin(end_costs, axis=0)
            states, _ = banded_backtrace_tb(bp8, eps_u, bg,
                                            bg.end_states[best], nf2)
            return (jnp.sum(jnp.take_along_axis(end_costs, best[None], 0))
                    + jnp.sum(states[0].astype(jnp.float32)))

    dt = _timeit_device(body)
    audio_s = batch * frames * frame_step_s
    tag = ("pallas" if pallas else
           f"beam k={beam_k}" if beam_k else "exact")
    if pallas:
        from speech_recognition_tpu.utils.roofline import lex_viterbi, report

        bound = lex_viterbi(batch, frames, plan.topo.a_pad, plan.topo.su,
                            len(units) * su, plan.topo.level_sizes,
                            plan.topo.n_roots,
                            sel_blocks=plan.topo.sel_blocks,
                            sel_w=plan.topo.sel_w,
                            n_units_pad=plan.topo.n_units_pad)
        log(report({"lex-viterbi": bound}, dt))
    log(f"lextree {tag}: {batch}x{frames} in {dt*1e3:.2f} ms device-time "
        f"({LAST_REGIME}) -> {audio_s/dt:.0f} audio-s/s")
    return audio_s / dt


def bench_lextree_dict1_bigram(batch=16, frames=500, frame_step_s=0.01):
    """Bigram LM x the reference's 6,250-word dictionary on ONE
    production path (the round-3 north star): wide-layout Pallas
    lattice kernel (entry-time carry, end-slice streaming) + the [B, L]
    backoff rescorer, timed as one chained device body.  Exactness vs
    the XLA lattice is asserted on-chip by
    scripts/exp_dict1_bigram_chip.py and in the suite (interpret)."""
    import jax
    import jax.numpy as jnp

    from speech_recognition_tpu.langmodel.bigram import fit_bigram
    from speech_recognition_tpu.models.lexgraph import build_lex_graph
    from speech_recognition_tpu.ops.lattice import (
        lattice_rescore,
        rescore_backoff,
        rescore_backoff_sliced,
    )
    from speech_recognition_tpu.ops.viterbi_lex_pallas import (
        lex_pallas_plan,
        viterbi_lex_pallas_wide_lattice,
    )

    rng = np.random.default_rng(7)
    raw = [line.strip() for line in
           open("/root/reference/tests/test_data/dict1.txt")][1:]
    seen, words = set(), []
    for w in raw:
        if w and w not in seen:
            seen.add(w)
            words.append(w)
    units = sorted(set("".join(words)))
    unit_ids = {ch: i for i, ch in enumerate(units)}
    su = 3
    trans = []
    for _ in units:
        t = np.full((su, su), np.inf)
        for i in range(su):
            t[i, i] = rng.uniform(0.1, 1)
            if i + 1 < su:
                t[i + 1, i] = rng.uniform(0.1, 1)
        trans.append(t)
    lexg = build_lex_graph(words, trans, unit_ids, word_insertion_cost=0.5)
    plan = lex_pallas_plan(lexg, layout="wide")
    v = len(words)
    lm = fit_bigram([[int(x) for x in rng.integers(0, v, 20)]
                     for _ in range(400)], v)
    sliced = rescore_backoff_sliced(lm, lexg.leaf_word)
    if sliced is not None:
        bo, bo_counts = sliced
        nnz = sum(bo_counts)
        log(f"dict1 bigram: {v} words, {lexg.n_states} states, sliced "
            f"backoff recombination ({nnz} pairs, counts {bo_counts})")
    else:
        bo, bo_counts = rescore_backoff(lm, lexg.leaf_word), None
        log(f"dict1 bigram: {v} words, {lexg.n_states} states, "
            f"{'backoff K=' + str(int(bo[1].shape[1])) if bo else 'dense'} "
            f"recombination")
    lw = jnp.asarray(lexg.leaf_word)
    cost_d = jnp.asarray(np.asarray(lm.cost, np.float32))
    start_d = jnp.asarray(np.asarray(lm.start_cost, np.float32))
    end_d = jnp.asarray(np.asarray(lm.end_cost, np.float32))
    eb = jnp.asarray(rng.uniform(0, 5, (frames, len(units) * su, batch)),
                     jnp.float32)
    nfb = jnp.full((batch,), frames, jnp.int32)

    def body(dep, eb, nfb):
        nf2 = jnp.where(jnp.isnan(dep), nfb + 1, nfb)
        ec, et = viterbi_lex_pallas_wide_lattice(eb, plan, nf2, plan.topo)
        r = lattice_rescore(ec, et, lw, cost_d, start_d, end_d, nf2,
                            backoff=bo, backoff_counts=bo_counts)
        return jnp.sum(r.cost) + jnp.sum(r.pred_w[-1].astype(jnp.float32))

    dt = _timeit_device(body, args=(eb, nfb))
    audio_s = batch * frames * frame_step_s
    log(f"dict1 bigram decode (lattice kernel + rescore): {batch}x{frames} "
        f"in {dt*1e3:.2f} ms device-time ({LAST_REGIME}) "
        f"-> {audio_s/dt:.0f} audio-s/s")
    return audio_s / dt


def bench_lextree_bigram(batch=128, frames=500, n_words=1000,
                         frame_step_s=0.01):
    """Exact-bigram-over-lattice decode on a 1,000-word deep trie:
    Pallas lattice pass (tau carry, end-slice streaming) + bigram
    rescoring scan, one jit — the VERDICT round-2 item-2 target shape
    (>= 10k audio-s/s with a real LM on a deep tree)."""
    import jax
    import jax.numpy as jnp

    from speech_recognition_tpu.langmodel.bigram import fit_bigram
    from speech_recognition_tpu.models.lexgraph import build_lex_graph
    from speech_recognition_tpu.ops.lattice import (
        lattice_rescore,
        rescore_backoff,
    )
    from speech_recognition_tpu.ops.viterbi_lex_pallas import (
        lex_pallas_plan,
        viterbi_lex_pallas_lattice,
    )

    units = list("abcdefgh")
    unit_ids = {ch: i for i, ch in enumerate(units)}
    su = 3
    rng = np.random.default_rng(7)
    trans = []
    for _ in units:
        t = np.full((su, su), np.inf)
        for i in range(su):
            t[i, i] = rng.uniform(0.1, 1)
            if i + 1 < su:
                t[i + 1, i] = rng.uniform(0.1, 1)
        trans.append(t)
    vocab = set()
    while len(vocab) < n_words:
        n = int(rng.integers(3, 9))
        vocab.add("".join(rng.choice(units, n)))
    words = sorted(vocab)
    lexg = build_lex_graph(words, trans, unit_ids, word_insertion_cost=0.5)
    plan = lex_pallas_plan(lexg)
    lm = fit_bigram([[int(x) for x in rng.integers(0, n_words, 12)]
                     for _ in range(200)], n_words)
    big = jnp.asarray(lm.cost)
    start_c = jnp.asarray(lm.start_cost)
    end_c = jnp.asarray(lm.end_cost)
    leaf_word = jnp.asarray(lexg.leaf_word)
    bo = rescore_backoff(lm, lexg.leaf_word)  # add-k LM: always present

    e = jnp.asarray(rng.uniform(0, 5, (frames, len(units) * su, batch)),
                    jnp.float32)
    nf = jnp.full((batch,), frames, jnp.int32)

    use_pallas = jax.default_backend() == "tpu"

    def body(dep):
        nf2 = jnp.where(jnp.isnan(dep), nf + 1, nf)
        if use_pallas:
            ends_cost, ends_tau = viterbi_lex_pallas_lattice(
                e, plan, nf2, plan.topo)
        else:
            from speech_recognition_tpu.ops.lattice import viterbi_lattice_tb

            nll_tb = e[:, np.asarray(lexg.banded.bank_state), :]
            _, ends_cost, ends_tau = viterbi_lattice_tb(
                nll_tb, lexg.banded, nf2)
        res = lattice_rescore(ends_cost, ends_tau, leaf_word, big, start_c,
                              end_c, nf2, backoff=bo)
        return jnp.sum(res.cost) + jnp.sum(res.best_leaf.astype(jnp.float32))

    dt = _timeit_device(body)
    audio_s = batch * frames * frame_step_s
    log(f"lextree bigram ({n_words} words): {batch}x{frames} in "
        f"{dt*1e3:.2f} ms device-time ({LAST_REGIME}) "
        f"-> {audio_s/dt:.0f} audio-s/s")
    return audio_s / dt


def bench_soft_em(batch=32, frames=300, banded="auto"):
    """Baum-Welch (sum-product) embedded step, device time.  The
    production form picks the forward-backward pass by graph size
    (``pad_graphs_auto``): dense [S, S] for transcript-scale graphs
    (S ~ 30 — where the banded pass's gather machinery cost 4.3x,
    the round-3 regression), banded O(3S)/frame past the crossover.
    ``banded=True/False`` force a pass for comparison."""
    import jax
    import jax.numpy as jnp

    from speech_recognition_tpu.models.graph import (
        build_word_graph, pad_graphs, pad_graphs_auto, pad_graphs_banded)
    from speech_recognition_tpu.train.embedded_step import embedded_step_soft

    bank = _bank()
    trans_np = [np.asarray(bank.trans_cost[i]) for i in range(bank.n_models)]
    rng = np.random.default_rng(3)
    labels = [[int(rng.integers(0, 11)) for _ in range(5)] for _ in range(batch)]
    graphs = [build_word_graph(trans_np, [[l] for l in ls]) for ls in labels]
    if banded == "auto":
        gb, eps_depth = pad_graphs_auto(graphs)
        banded = "band" in gb
    elif banded:
        gb, eps_depth = pad_graphs_banded(graphs)
    else:
        gb, eps_depth = pad_graphs(graphs)
    if "band" in gb:
        g = {k: jnp.asarray(v) for k, v in gb.items()}
    else:
        g = {k: jnp.asarray(gb[k]) for k in ("trans", "eps_trans", "init_cost",
                                             "end_scores", "bank_state")}
    feats = jnp.asarray(rng.standard_normal((batch, frames, 39)), jnp.float32)
    nf = jnp.full((batch,), frames, jnp.int32)

    def body(dep):
        nf2 = jnp.where(jnp.isnan(dep), nf + 1, nf)
        return embedded_step_soft(bank, feats, nf2, g,
                                  eps_depth=eps_depth)[1].total_cost

    dt = _timeit_device(body)
    form = "banded" if "band" in gb else "dense"
    log(f"soft-EM step ({form} FB): {batch} utts in {dt*1e3:.2f} ms "
        f"device-time ({LAST_REGIME}) -> {batch/dt:.0f} utts/s")
    return batch / dt


def bench_streaming(batch=64, chunk=256, n_chunks=20, frame_step_s=0.01):
    """Long-audio streaming decoder: per-chunk device time of the
    carried-frontier step, plus a real multi-chunk push + one-call
    device backtrace (finish) timed end-to-end (host transfers ride
    the axon tunnel; labeled separately)."""
    import jax
    import jax.numpy as jnp

    from speech_recognition_tpu.decode.connected import connected_graph_arrays
    from speech_recognition_tpu.decode.streaming import StreamingDecoder, _chunk_step

    bank = _bank()
    graph = connected_graph_arrays(bank, 7)
    dec = StreamingDecoder(bank, graph, chunk_frames=chunk, batch=batch)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, chunk, 39)), jnp.float32)
    nv = jnp.full((batch,), chunk, jnp.int32)
    fr = dec._frontier

    def body(dep):
        nv2 = jnp.where(jnp.isnan(dep), nv + 1, nv)
        f2, bp8, eps_u = jax.vmap(
            lambda f, xx, n: _chunk_step(bank, dec.bg, f, xx, n,
                                         eps_depth=graph.eps_depth,
                                         first_chunk=False))(fr, x, nv2)
        return jnp.sum(f2) + jnp.sum(bp8[0, 0].astype(jnp.float32))

    dt = _timeit_device(body)
    audio_s = batch * chunk * frame_step_s
    log(f"streaming chunk step: {batch}x{chunk} frames in {dt*1e3:.2f} ms "
        f"device-time ({LAST_REGIME}) -> {audio_s/dt:.0f} audio-s/s")

    # real end-to-end long-audio decode through the push API.
    # (a) device-resident chunks (the serving shape: the on-chip MFCC
    # frontend feeds the decoder, so features never cross the host) —
    # bp planes stay on device, finish() fetches only the [B, T] paths
    chunks_dev = [
        jax.block_until_ready(jnp.asarray(
            rng.standard_normal((batch, chunk, 39)), jnp.float32))
        for _ in range(n_chunks)]
    total_audio = batch * chunk * n_chunks * frame_step_s
    for trial in range(2):  # second run reuses compiled programs
        dec.reset()
        t0 = time.perf_counter()
        for x_dev in chunks_dev:
            dec.push(x_dev)
        words = dec.finish()
        wall = time.perf_counter() - t0
    log(f"streaming e2e (device chunks): {n_chunks} chunks x {batch} "
        f"streams ({total_audio:.0f} audio-s) in {wall:.2f} s wall -> "
        f"{total_audio/wall:.0f} audio-s/s through the push API")
    e2e = total_audio / wall

    # (b) host numpy chunks: adds the feature upload over the tunnel
    dec.reset()
    chunks_np = [np.asarray(c) for c in chunks_dev]
    t0 = time.perf_counter()
    for x_np in chunks_np:
        dec.push(x_np)
    words = dec.finish()
    wall = time.perf_counter() - t0
    log(f"streaming e2e (host chunks): {total_audio:.0f} audio-s in "
        f"{wall:.2f} s wall incl. feature upload -> "
        f"{total_audio/wall:.0f} audio-s/s")

    # (c) incremental emission: unbounded-audio mode — words emitted
    # mid-stream via path-immortality flushes, plane memory O(window).
    # Two requirements for stabilization: speech-like input (pure noise
    # keeps every hypothesis competitive) and an unbounded-audio graph
    # (the LOOP graph; a fixed-slot sausage keeps lagging slot-1 tokens
    # alive forever, so no boundary is ever shared — and it cannot
    # model unbounded audio in the first place).
    from speech_recognition_tpu.decode.streaming import StreamingDecoder as SD
    from speech_recognition_tpu.models.graph import build_loop_graph

    loop_g = build_loop_graph(
        [np.asarray(bank.trans_cost[i]) for i in range(bank.n_models)])

    means = np.asarray(bank.means)  # [N, S, M, D]
    n_models, n_states = means.shape[0], means.shape[1]
    t_total = chunk * n_chunks
    sig_feats = np.zeros((batch, t_total, means.shape[-1]), np.float32)
    for bi in range(batch):
        t = 0
        while t < t_total:
            w = int(rng.integers(0, n_models))
            for st in range(n_states):
                for _ in range(int(rng.integers(2, 5))):
                    if t >= t_total:
                        break
                    sig_feats[bi, t] = (means[w, st, 0]
                                        + 0.5 * rng.standard_normal(
                                            means.shape[-1]))
                    t += 1
    chunks_sp = [
        jax.block_until_ready(jnp.asarray(
            sig_feats[:, i * chunk : (i + 1) * chunk], jnp.float32))
        for i in range(n_chunks)]

    for fe in (2, 4):
        dec_i = SD(bank, loop_g, chunk_frames=chunk, batch=batch,
                   emit_incremental=True, window_chunks=8, flush_every=fe)
        n_early = 0
        max_buf = 0
        for trial in range(2):
            dec_i.reset()
            n_early = 0
            t0 = time.perf_counter()
            for x_dev in chunks_sp:
                new = dec_i.push(x_dev)
                n_early += sum(len(w) for w in new)
                max_buf = max(max_buf, len(dec_i._bp_chunks))
            res = dec_i.finish()
            wall_i = time.perf_counter() - t0
        n_total = sum(len(r[0]) for r in res)
        log(f"streaming e2e (incremental, window 8, flush_every {fe}): "
            f"{total_audio:.0f} audio-s in {wall_i:.2f} s wall -> "
            f"{total_audio/wall_i:.0f} audio-s/s; "
            f"{n_early}/{n_total} words emitted mid-stream, plane buffer "
            f"peak {max_buf} chunks (memory O(window) for unbounded audio)")

    # (d) incremental over a LEXGRAPH (big-vocabulary unbounded-audio
    # serving): 1,000-word trie, speech-like audio spelling random
    # words, bounded-memory word emission mid-stream
    from speech_recognition_tpu.models.hmm import GMMHMM, HMMBank
    from speech_recognition_tpu.models.lexgraph import build_lex_graph
    from speech_recognition_tpu.data.synthetic import random_gmm_hmm
    from speech_recognition_tpu.utils.numerics import to_cost_matrix

    nprng = np.random.default_rng(3)
    units = list("abcdefgh")
    unit_ids = {ch: i for i, ch in enumerate(units)}
    vocab = set()
    while len(vocab) < 1000:
        vocab.add("".join(nprng.choice(units, int(nprng.integers(3, 8)))))
    words_v = sorted(vocab)
    su, dim = 3, 10
    models, unit_trans, umeans = [], [], []
    for _ in units:
        p = random_gmm_hmm(nprng, n_states=su, n_mix=1, dim=dim, sep=4.0)
        models.append(GMMHMM(
            means=jnp.asarray(p["means"], jnp.float32),
            log_vars=jnp.log(jnp.asarray(p["variances"], jnp.float32)),
            log_weights=jnp.log(jnp.asarray(p["weights"], jnp.float32)),
            trans_cost=jnp.asarray(to_cost_matrix(p["trans"])),
        ))
        unit_trans.append(p["trans"])
        umeans.append(p["means"][:, 0, :])
    lbank = HMMBank.stack(models)
    lexg = build_lex_graph(words_v, unit_trans, unit_ids,
                           word_insertion_cost=0.5)
    bl, n_ch = 16, 8
    t_tot = chunk * n_ch
    lf = np.zeros((bl, t_tot, dim), np.float32)
    for bi in range(bl):
        t = 0
        while t < t_tot:
            w = words_v[int(nprng.integers(0, len(words_v)))]
            for ch in w:
                for j in range(su):
                    for _ in range(3):
                        if t < t_tot:
                            lf[bi, t] = (umeans[unit_ids[ch]][j]
                                         + 0.4 * nprng.standard_normal(dim))
                            t += 1
    chunks_lex = [jax.block_until_ready(jnp.asarray(
        lf[:, i * chunk:(i + 1) * chunk], jnp.float32))
        for i in range(n_ch)]
    dec_l = SD(lbank, lexg, chunk_frames=chunk, batch=bl,
               emit_incremental=True, window_chunks=4, flush_every=2)
    lex_audio = bl * t_tot * frame_step_s
    for trial in range(2):
        dec_l.reset()
        n_early = 0
        t0 = time.perf_counter()
        for x_dev in chunks_lex:
            new = dec_l.push(x_dev)
            n_early += sum(len(w) for w in new)
        res = dec_l.finish()
        wall_l = time.perf_counter() - t0
    n_total = sum(len(r[0]) for r in res)
    log(f"streaming e2e (incremental LEXGRAPH, 1k words): "
        f"{lex_audio:.0f} audio-s in {wall_l:.2f} s wall -> "
        f"{lex_audio/wall_l:.0f} audio-s/s; {n_early}/{n_total} words "
        f"emitted mid-stream")
    return e2e


def bench_spellcheck():
    """Reference workload: text Viterbi of the misspelled tale against
    the 6,250-word dict1 trie (27.5k nodes) — device chars/s of the
    column scan (``/root/reference/tests/lextree_tests.py:7-51`` runs
    this exact workload with a per-cell Python loop and no asserts)."""
    import re

    import jax
    import jax.numpy as jnp

    from speech_recognition_tpu.langmodel.lextree import lextree_from_words
    from speech_recognition_tpu.langmodel.spellcheck import _text_viterbi_device

    words = [ln.strip() for ln in
             open("/root/reference/tests/test_data/dict1.txt")][1:]
    words = list(dict.fromkeys(w for w in words if w))
    tree = lextree_from_words(words)
    src = open("/root/reference/tests/lextree_tests.py").read()
    tale = re.search(r"typos = '''(.*?)'''", src, re.S).group(1).strip()
    tale = " ".join(tale.split())

    # a 512-char slice keeps one dispatch ~2 s — at that scale the
    # tunnel's 10-50 ms round trip is noise, so plain repeated wall
    # timing is honest here (the fori-slope harness would chain
    # multi-minute iterations and trip the tunnel's watchdog)
    n_chars = min(len(tale), 512)
    codes = jnp.asarray([ord("*")] + [ord(c) for c in tale[: n_chars]],
                        jnp.int32)
    val = jnp.asarray(tree.val.astype(np.int32))
    parent = jnp.asarray(tree.parent)
    is_root_child = jnp.asarray(tree.parent == 0)
    is_word_end = jnp.asarray(tree.prop == 2)
    md = tree.max_depth

    def run():
        costs, _, _ = _text_viterbi_device(
            codes, val, parent, is_root_child, is_word_end, max_depth=md)
        return float(jnp.sum(jnp.where(costs[-1] < 1e29, costs[-1], 0.0)))

    run()  # compile + warm
    t0 = time.perf_counter()
    reps = 2
    for _ in range(reps):
        run()
    dt = (time.perf_counter() - t0) / reps
    global LAST_REGIME
    LAST_REGIME = "single-dispatch"
    log(f"spellcheck (per-string reference-DP kernel): {n_chars} chars "
        f"over {tree.n_nodes} trie nodes in {dt*1e3:.0f} ms -> "
        f"{n_chars/dt:.0f} chars/s (gather-bound)")

    # production kernel: depth-level sweep, batch on lanes ([N, B])
    from speech_recognition_tpu.langmodel.spellcheck import (
        _LevelPlan, _text_viterbi_levels)

    plan = _LevelPlan(tree)
    b = 128
    c = 257
    chunks = [(tale + tale)[7 * i : 7 * i + c - 1] for i in range(b)]
    codes_b = np.full((c, b), ord("*"), np.int32)
    for i, txt in enumerate(chunks):
        codes_b[1 : 1 + len(txt), i] = np.frombuffer(
            txt.encode("latin-1"), np.uint8)
    codes_b = jnp.asarray(codes_b)
    dev_args = plan.device_args()

    def run_b():
        ends_min = _text_viterbi_levels(codes_b, *dev_args, off=plan.off,
                                        need_bp=False)
        return float(jnp.sum(jnp.where(ends_min[-1] < 1e29,
                                       ends_min[-1], 0.0)))

    run_b()
    t0 = time.perf_counter()
    for _ in range(reps):
        run_b()
    dt_b = (time.perf_counter() - t0) / reps
    total = b * (c - 1)
    log(f"spellcheck (level-sweep kernel, batch {b}): {total} chars in "
        f"{dt_b*1e3:.0f} ms -> {total/dt_b:.0f} chars/s")
    return total / dt_b


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="headline",
                    choices=["headline", "frontend", "train", "soft_em",
                             "decode", "pipeline", "lextree", "lex_pipeline",
                             "lextree_dict1", "lextree_bigram",
                             "lextree_dict1_bigram",
                             "streaming", "spellcheck"])
    ap.add_argument("--batch", type=int, default=0,
                    help="0 = per-benchmark default (headline pins 512 — "
                         "the shape RESULTS.md is measured at; the repo's "
                         ".jax_cache makes its compile a cache hit)")
    ap.add_argument("--frames", type=int, default=500)
    ap.add_argument("--beam-k", type=int, default=0,
                    help="lextree only: token-beam width (0 = exact kernel)")
    ap.add_argument("--primary-timeout", type=float, default=1500.0,
                    help="headline only: time box for the pinned batch-512 "
                         "subprocess before falling back to batch 64")
    args = ap.parse_args()

    import jax

    # persistent compilation cache, kept inside the repo so the driver's
    # end-of-round run hits the programs this session already compiled
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass

    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")

    simple = {
        "frontend": (bench_frontend, "mfcc-frontend", "audio-seconds/s/chip", 64),
        "pipeline": (bench_pipeline, "wav-to-words-pipeline",
                     "audio-seconds/s/chip", 256),
        "train": (bench_embedded_train, "embedded-EM", "utterances/s/chip", 32),
        "soft_em": (bench_soft_em, "embedded-EM-baum-welch",
                    "utterances/s/chip", 32),
        "streaming": (bench_streaming, "streaming-decode",
                      "audio-seconds/s/chip", 64),
        "lex_pipeline": (bench_lex_pipeline, "lex-wav-to-words-pipeline",
                         "audio-seconds/s/chip", 128),
    }
    if args.what == "spellcheck":
        v = bench_spellcheck()
        print(json.dumps({"metric": "spellcheck-tale-dict1",
                          "value": round(v, 1), "unit": "chars/s/chip",
                          "vs_baseline": 0, "regime": LAST_REGIME}))
        return
    if args.what in simple:
        fn, metric, unit, default_b = simple[args.what]
        v = fn(args.batch or default_b)
        print(json.dumps({"metric": metric, "value": round(v, 1), "unit": unit,
                          "vs_baseline": 0, "regime": LAST_REGIME}))
        return
    if args.what == "lextree":
        import jax as _jax

        v = bench_lextree(args.batch or 64, args.frames, beam_k=args.beam_k,
                          pallas=(_jax.default_backend() == "tpu"
                                  and not args.beam_k))
        print(json.dumps({"metric": "lextree-1k-word-decode",
                          "value": round(v, 1),
                          "unit": "audio-seconds/s/chip", "vs_baseline": 0,
                          "regime": LAST_REGIME}))
        return
    if args.what == "lextree_bigram":
        v = bench_lextree_bigram(args.batch or 128, args.frames)
        print(json.dumps({"metric": "lextree-bigram-rescored-decode",
                          "value": round(v, 1),
                          "unit": "audio-seconds/s/chip", "vs_baseline": 0,
                          "regime": LAST_REGIME}))
        return
    if args.what == "lextree_dict1":
        import jax as _jax

        v = bench_lextree(args.batch or 32, args.frames, dict1=True,
                          pallas=(_jax.default_backend() == "tpu"))
        print(json.dumps({"metric": "lextree-dict1-6250-word-decode",
                          "value": round(v, 1),
                          "unit": "audio-seconds/s/chip", "vs_baseline": 0,
                          "regime": LAST_REGIME}))
        return
    if args.what == "lextree_dict1_bigram":
        v = bench_lextree_dict1_bigram(args.batch or 16, args.frames)
        print(json.dumps({"metric": "lextree-dict1-bigram-decode",
                          "value": round(v, 1),
                          "unit": "audio-seconds/s/chip", "vs_baseline": 0,
                          "regime": LAST_REGIME}))
        return
    if args.what == "decode":
        v = bench_connected_decode(args.batch or 512, args.frames)
        print(json.dumps({"metric": "connected-digit-decode", "value": round(v, 1),
                          "unit": "audio-seconds/s/chip", "vs_baseline": 0,
                          "regime": LAST_REGIME}))
        return

    # Headline: the PINNED shape is batch 512 x 500 frames (what
    # RESULTS.md reports).  Run it in a time-boxed subprocess — with the
    # repo-local compile cache warm this takes ~1 min; only if it fails
    # or times out (cold remote-AOT compile can be ~10 min) fall back to
    # the batch-64 shape in-process, and the JSON's "shape" field says
    # which one produced the artifact.
    import os
    import subprocess

    thr, regime, shape = None, None, None
    primary_b = args.batch or 512
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--what", "decode",
             "--batch", str(primary_b), "--frames", str(args.frames)],
            capture_output=True, text=True, timeout=args.primary_timeout,
        )
        sys.stderr.write(r.stderr)
        got = json.loads(r.stdout.strip().splitlines()[-1])
        thr, regime = got["value"], got.get("regime", "unknown")
        shape = f"batch{primary_b}x{args.frames}"
    except Exception as e:
        log(f"pinned batch-{primary_b} run failed ({type(e).__name__}); "
            f"falling back to batch 64")
        thr = bench_connected_decode(64, args.frames)
        regime, shape = LAST_REGIME, f"batch64x{args.frames}"

    base = bench_reference_baseline()
    out = {
        "metric": "connected-digit-decode",
        "value": round(thr, 1),
        "unit": "audio-seconds/s/chip",
        "vs_baseline": round(thr / base, 1),
        "regime": regime,
        "shape": shape,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
