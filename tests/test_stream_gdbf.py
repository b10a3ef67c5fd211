"""GDBF streaming harness: per-frame bit-exact equality vs the batched decoder.

The stream driver keys decoder noise per (frame, local step) —
``frame_perturbation_sequence``/``frame_stoch_uniforms`` generate a
frame's exact sequences for ``decode_gdbf``'s injection hooks, so the
batched decoder replays streamed frames bit-exactly.  These tests assert
per-frame (iterations, errors, satisfied, phases) equality across the
preset families (plain/smoothed/noise/adaptation/mode-switching/
sequential/stochastic/redecode/shaping/uniform), refill cadences, call
boundaries, quantized inputs (signed zeros), f16 pools, and the QC path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpcsimulation_tpu.channel.awgn import snr_to_sigma
from ldpcsimulation_tpu.channel.quantize import quantize_round, saturate
from ldpcsimulation_tpu.codes.qc import qc_peg
from ldpcsimulation_tpu.decoders.gdbf import GDBFConfig, decode_gdbf, preset
from ldpcsimulation_tpu.harness.montecarlo import StopRule, simulate
from ldpcsimulation_tpu.harness.stream_gdbf import (
    build_channel_pool_gdbf,
    frame_perturbation_sequence,
    frame_stoch_uniforms,
    gdbf_stream_init,
    make_gdbf_stream_call,
    simulate_stream_gdbf,
)

QC = qc_peg(8, 4, 3, z=16, seed=0)  # (128, 64)
CODE = QC.to_code()
N = CODE.n
SNR, RATE = 3.5, 0.5
SIGMA = float(snr_to_sigma(SNR, RATE))
KCH = jax.random.key(11)
KDEC = jax.random.key(23)


def reference_frames(cfg, n_frames, preprocess=None, qc=None):
    """Batch-decode the pool rows with stream-keyed injected sequences."""
    rows, _unc, _sat0 = build_channel_pool_gdbf(
        CODE, KCH, 0, n_frames, SIGMA, preprocess, qc=qc
    )
    pert = None
    su = None
    gids = jnp.arange(n_frames)
    if cfg.add_noise:
        seqs = jax.vmap(
            lambda g: frame_perturbation_sequence(KDEC, g, cfg, SIGMA, N)
        )(gids)  # [F, total, N]
        pert = jnp.moveaxis(seqs, 0, -1)  # [total, N, F]
    if cfg.quantize_probabilities:
        seqs = jax.vmap(
            lambda g: frame_stoch_uniforms(KDEC, g, cfg, N)
        )(gids)
        su = jnp.moveaxis(seqs, 0, -1)
    res = decode_gdbf(
        CODE, rows, SIGMA, cfg, key=jax.random.key(0),
        perturbations=pert, stoch_uniforms=su, qc=qc,
    )
    hard = np.asarray(res.hard)
    iters = np.asarray(res.iterations)
    sat = np.asarray(res.satisfied)
    phases = np.asarray(res.phases)
    errs = (hard != 1).sum(axis=1)
    return {
        g: (int(iters[g]), int(errs[g]), bool(sat[g]), int(phases[g]))
        for g in range(n_frames)
    }


def run_stream(cfg, pools, lanes, rounds, refill_every, preprocess=None,
               qc=None, pool_dtype=None):
    """Drive the raw stream call; return {gid: (iters, errs, sat, phases)}
    plus consistency-checked totals."""
    rec_cap = max(f for _b, f in pools) + lanes
    state = gdbf_stream_init(CODE, cfg, lanes, pool_dtype or jnp.float32)
    call = make_gdbf_stream_call(
        CODE, rounds, refill_every, qc=qc, record=True, rec_cap=rec_cap,
    )
    per_frame = {}
    totals = dict(frames=0, bit_errs=0, iter_sum=0, word_errs=0, sat=0)
    total_steps = cfg.max_phases * cfg.num_iterations
    for base, f in pools:
        pool, unc, sat0 = build_channel_pool_gdbf(
            CODE, KCH, base, f, SIGMA, preprocess, pool_dtype, qc=qc
        )
        state, acc, rec = call(
            state, pool, unc, sat0, jnp.int32(base), KDEC, SIGMA, cfg
        )
        a = jax.device_get(acc)
        r = jax.device_get(rec)
        rc = int(a["rc"])
        assert rc <= rec_cap
        for g, it, er, st_, ph in zip(
            r["gid"][:rc], r["iters"][:rc], r["errs"][:rc],
            r["sat"][:rc], r["phases"][:rc],
        ):
            assert int(g) >= 0
            assert int(g) not in per_frame, "frame retired twice"
            per_frame[int(g)] = (int(it), int(er), bool(st_), int(ph))
        for k in totals:
            totals[k] += int(a[k])
        # histograms must agree with the per-frame records
        ih = np.zeros(total_steps + 1, np.int64)
        phh = np.zeros(cfg.max_phases + 1, np.int64)
        for g, it, ph in zip(r["gid"][:rc], r["iters"][:rc],
                             r["phases"][:rc]):
            ih[int(it)] += 1
            phh[int(ph)] += 1
        np.testing.assert_array_equal(ih, np.asarray(a["iter_hist"]))
        np.testing.assert_array_equal(phh, np.asarray(a["phase_hist"]))
    assert totals["frames"] == len(per_frame)
    assert totals["bit_errs"] == sum(e for _i, e, _s, _p in per_frame.values())
    assert totals["iter_sum"] == sum(i for i, _e, _s, _p in per_frame.values())
    assert totals["sat"] == sum(1 for _i, _e, s, _p in per_frame.values() if s)
    return per_frame


def check_equal(per_frame, ref, min_covered):
    assert len(per_frame) >= min_covered
    for g, v in per_frame.items():
        assert ref[g] == v, (g, ref[g], v)


@pytest.mark.parametrize("refill_every", [1, 3])
def test_plain_gdbf_stream_matches_batch(refill_every):
    cfg = preset("GDBF", num_iterations=12, theta=-0.6)
    ref = reference_frames(cfg, 160)
    # two pools: frames cross the call boundary in flight; second pool
    # exhausts mid-call (idle-lane path)
    per_frame = run_stream(
        cfg, [(0, 96), (96, 64)], lanes=32, rounds=30,
        refill_every=refill_every,
    )
    check_equal(per_frame, ref, 120)


def test_smngdbf_stream_matches_batch():
    cfg = preset(
        "SMNGDBF", num_iterations=16, theta=-0.7, noise_scale=0.9,
        lam=0.98, alpha=0.8, window_size=10,
    )
    pre = lambda y: saturate(y, 2.5)
    ref = reference_frames(cfg, 128, preprocess=pre)
    per_frame = run_stream(
        cfg, [(0, 128)], lanes=32, rounds=80, refill_every=1,
        preprocess=pre,
    )
    check_equal(per_frame, ref, 100)


def test_smngdbf_stream_qc_and_f16_pool():
    """QC graph ops + f16 pool rows: matches a batch decode of the SAME
    f16-quantized rows through the QC path."""
    cfg = preset(
        "SMNGDBF", num_iterations=16, theta=-0.7, noise_scale=0.9,
        lam=0.98, alpha=0.8, window_size=10,
    )
    pre = lambda y: saturate(y, 2.5)

    # reference truth on the f16 pool rows (upcast exactly, as the stream
    # iterate consumes them)
    rows16, _unc, _sat0 = build_channel_pool_gdbf(
        CODE, KCH, 0, 128, SIGMA, pre, jnp.float16, qc=QC
    )
    gids = jnp.arange(128)
    seqs = jax.vmap(
        lambda g: frame_perturbation_sequence(KDEC, g, cfg, SIGMA, N)
    )(gids)
    res = decode_gdbf(
        CODE, rows16.astype(jnp.float32), SIGMA, cfg,
        perturbations=jnp.moveaxis(seqs, 0, -1), qc=QC,
    )
    hard = np.asarray(res.hard)
    ref = {
        g: (
            int(np.asarray(res.iterations)[g]),
            int((hard[g] != 1).sum()),
            bool(np.asarray(res.satisfied)[g]),
            int(np.asarray(res.phases)[g]),
        )
        for g in range(128)
    }
    per_frame = run_stream(
        cfg, [(0, 128)], lanes=32, rounds=80, refill_every=2,
        preprocess=pre, qc=QC, pool_dtype=jnp.float16,
    )
    check_equal(per_frame, ref, 100)


def test_redecode_stream_matches_batch():
    """RSMNGDBF: redecode phases + legacy per-node weight; phase counts
    and accumulated iteration counts match the batched decoder."""
    cfg = preset(
        "RSMNGDBF", num_iterations=8, theta=-0.7, noise_scale=0.9,
        lam=0.98, alpha=0.8, window_size=6, max_phases=3,
    )
    pre = lambda y: saturate(y, 2.5)
    ref = reference_frames(cfg, 96, preprocess=pre)
    per_frame = run_stream(
        cfg, [(0, 96)], lanes=24, rounds=120, refill_every=1,
        preprocess=pre,
    )
    check_equal(per_frame, ref, 80)
    # redecode must actually occur for the test to mean anything
    assert any(p > 1 for _i, _e, _s, p in per_frame.values())


def test_modeswitch_sequential_stream_match_batch():
    for name in ("MGDBF", "SGDBF"):
        cfg = preset(name, num_iterations=10, theta=-0.6)
        ref = reference_frames(cfg, 96)
        per_frame = run_stream(
            cfg, [(0, 96)], lanes=24, rounds=60, refill_every=1
        )
        check_equal(per_frame, ref, 80)


def test_stochastic_stream_matches_batch():
    cfg = preset(
        "StochasticNGDBF", num_iterations=10, theta=-0.6,
        noise_scale=0.9, alpha=0.8,
    )
    pre = lambda y: saturate(y, 2.5)
    ref = reference_frames(cfg, 96, preprocess=pre)
    per_frame = run_stream(
        cfg, [(0, 96)], lanes=24, rounds=60, refill_every=1,
        preprocess=pre,
    )
    check_equal(per_frame, ref, 80)


def test_uniform_and_shaped_noise_stream_match_batch():
    for kw in (dict(uniform_noise=True), dict(noise_shaping=True)):
        cfg = preset(
            "MNGDBF", num_iterations=10, theta=-0.7, noise_scale=0.9,
            lam=0.98, alpha=0.8, **kw,
        )
        ref = reference_frames(cfg, 96)
        per_frame = run_stream(
            cfg, [(0, 96)], lanes=24, rounds=60, refill_every=1
        )
        check_equal(per_frame, ref, 80)


def test_quantized_input_signed_zero_stream():
    """quantize_round emits signed zeros; the stream's signbit-based
    channel decisions must match the batched decoder on quantized rows."""
    cfg = preset("GDBF", num_iterations=12, theta=-0.6)
    pre = lambda y: quantize_round(saturate(y, 1.5), 1.5, 3)
    ref = reference_frames(cfg, 128, preprocess=pre)
    per_frame = run_stream(
        cfg, [(0, 128)], lanes=32, rounds=40, refill_every=1,
        preprocess=pre,
    )
    check_equal(per_frame, ref, 100)


def test_gdbf_drain_retires_every_injected_frame():
    """ptr0 = pool size turns the call into a drain (no refills): after
    draining, every injected gid has retired exactly once — the counted
    set is a gap-free prefix of the frame sequence, killing the in-flight
    drop bias (in-flight frames are enriched in failures)."""
    cfg = preset(
        "SMNGDBF", num_iterations=16, theta=-0.7, noise_scale=0.9,
        lam=0.98, alpha=0.8, window_size=10,
    )
    lanes, F = 24, 72
    rec_cap = F + lanes
    state = gdbf_stream_init(CODE, cfg, lanes)
    call = make_gdbf_stream_call(
        CODE, rounds=6, refill_every=1, record=True, rec_cap=rec_cap,
    )
    pool, unc, sat0 = build_channel_pool_gdbf(CODE, KCH, 0, F, SIGMA)
    # short main call: guaranteed in-flight lanes at its end
    state, acc, rec = call(
        state, pool, unc, sat0, jnp.int32(0), KDEC, SIGMA, cfg
    )
    a0 = jax.device_get(acc)
    consumed = int(a0["consumed"])
    retired = {int(g) for g in jax.device_get(rec)["gid"][: int(a0["rc"])]}
    assert consumed > len(retired), "test needs in-flight frames"
    # drain
    for _ in range(8):
        state, acc, rec = call(
            state, pool, unc, sat0, jnp.int32(0), KDEC, SIGMA, cfg, F
        )
        a = jax.device_get(acc)
        assert int(a["consumed"]) == 0  # drain consumes nothing
        r = jax.device_get(rec)
        got = {int(g) for g in r["gid"][: int(a["rc"])]}
        assert not (got & retired), "frame retired twice"
        retired |= got
        if int(a["frames"]) == 0:
            break
    assert retired == set(range(consumed))


def test_simulate_stream_drain_counts_all_frames():
    """Binary harness: with a stop rule that fires after one call, the
    drain still counts every injected frame (total_words is a multiple of
    nothing — it equals the consumed prefix, which we bound below by the
    no-drain count)."""
    from ldpcsimulation_tpu.harness.stream import (
        minsum_qc_stream, simulate_stream,
    )

    dec = minsum_qc_stream(QC)
    stats = simulate_stream(
        CODE.n, dec, SNR, RATE, 20,
        stop=StopRule(min_bit_errors=0, min_word_errors=0, max_frames=32),
        lanes=64, rounds_per_call=4, refill_every=1, seed=5,
    )
    # 64 lanes fill at the first boundary; with only 4 rounds/call many
    # are in flight at stop — drain must still count them
    assert stats.total_words >= 64
    assert stats.iteration_hist.sum() == stats.total_words


def test_stream_gdbf_one_compile_across_operating_points():
    """sigma and the config's operating-point scalars are call-time
    traced arguments (like the batched decode_gdbf's pytree-data fields):
    a whole (SNR x parameter) sweep grid shares ONE compiled program, and
    _cached_call reuses the jitted wrapper across simulate invocations."""
    from ldpcsimulation_tpu.harness.stream_gdbf import _cached_call

    call = _cached_call(CODE, 4, 1, None, None)
    assert _cached_call(CODE, 4, 1, None, None) is call
    cfg1 = preset("SMNGDBF", num_iterations=8, theta=-0.6,
                  noise_scale=0.9, lam=0.98, alpha=0.8, window_size=6)
    cfg2 = preset("SMNGDBF", num_iterations=8, theta=-0.8,
                  noise_scale=0.7, lam=0.95, alpha=1.2, window_size=6)
    before = call._cache_size()
    st = gdbf_stream_init(CODE, cfg1, 16)
    pool, unc, sat0 = build_channel_pool_gdbf(CODE, KCH, 0, 32, SIGMA)
    st, _acc, _ = call(st, pool, unc, sat0, jnp.int32(0), KDEC,
                       SIGMA, cfg1)
    st, _acc, _ = call(st, pool, unc, sat0, jnp.int32(0), KDEC,
                       0.9 * SIGMA, cfg2)
    assert call._cache_size() - before == 1


def test_sharded_gdbf_stream_matches_batch():
    """Mesh-sharded GDBF stream (8 virtual devices): per-frame equality
    vs the batched decoder fed the stream-keyed sequences — per-device
    gid windows keep the per-(frame, step) noise globally unique."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()), ("data",))
    nd = mesh.shape["data"]
    cfg = preset(
        "SMNGDBF", num_iterations=16, theta=-0.7, noise_scale=0.9,
        lam=0.98, alpha=0.8, window_size=10,
    )
    F, lanes, rec_cap = 256, 64, 512
    call = make_gdbf_stream_call(
        CODE, rounds=20, refill_every=1, record=True, rec_cap=rec_cap,
        mesh=mesh,
    )
    state = gdbf_stream_init(CODE, cfg, lanes)
    state = jax.device_put(
        state,
        jax.tree.map(
            lambda x: NamedSharding(
                mesh, P(*([None] * (x.ndim - 1) + ["data"]))
            ),
            state,
        ),
    )
    shard_rows = NamedSharding(mesh, P("data"))
    pool_fn = jax.jit(
        lambda b: build_channel_pool_gdbf(CODE, KCH, b, F, SIGMA),
        out_shardings=(shard_rows, shard_rows, shard_rows),
    )

    per_frame = {}
    base = 0
    for _ci in range(2):
        pool, unc, sat0 = pool_fn(jnp.int32(base))
        state, acc, rec = call(
            state, pool, unc, sat0, base, KDEC, SIGMA, cfg
        )
        r = jax.device_get(rec)
        seg = rec_cap + 1
        for d in range(nd):
            rc_d = int(r["rc_local"][d])
            for g, it, er in zip(
                r["gid"][d * seg:d * seg + rc_d],
                r["iters"][d * seg:d * seg + rc_d],
                r["errs"][d * seg:d * seg + rc_d],
            ):
                assert int(g) not in per_frame
                per_frame[int(g)] = (int(it), int(er))
        base += F
    # drain
    state, acc, rec = call(
        state, pool, unc, sat0, base, KDEC, SIGMA, cfg, F // nd
    )
    r = jax.device_get(rec)
    seg = rec_cap + 1
    for d in range(nd):
        rc_d = int(r["rc_local"][d])
        for g, it, er in zip(
            r["gid"][d * seg:d * seg + rc_d],
            r["iters"][d * seg:d * seg + rc_d],
            r["errs"][d * seg:d * seg + rc_d],
        ):
            assert int(g) not in per_frame
            per_frame[int(g)] = (int(it), int(er))

    # truth: batch decode each window with stream-keyed noise sequences
    ref = {}
    for w in range(2):
        rows, _u, _s = build_channel_pool_gdbf(CODE, KCH, w * F, F, SIGMA)
        gids = w * F + jnp.arange(F)
        seqs = jax.vmap(
            lambda g: frame_perturbation_sequence(KDEC, g, cfg, SIGMA, N)
        )(gids)
        res = decode_gdbf(
            CODE, rows, SIGMA, cfg,
            perturbations=jnp.moveaxis(seqs, 0, -1),
        )
        hard = np.asarray(res.hard)
        for k in range(F):
            ref[w * F + k] = (
                int(np.asarray(res.iterations)[k]),
                int((hard[k] != 1).sum()),
            )
    assert len(per_frame) >= 250  # window-advance skips unconsumed gids
    for g, v in per_frame.items():
        assert ref[g] == v, (g, ref[g], v)


def test_sharded_simulate_stream_gdbf_deterministic():
    """simulate_stream_gdbf(mesh=...): deterministic psum'd counters,
    self-consistent, statistically matching the single-device stream."""
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()), ("data",))
    cfg = preset(
        "SMNGDBF", num_iterations=16, theta=-0.7, noise_scale=0.9,
        lam=0.98, alpha=0.8, window_size=10,
    )
    kw = dict(
        stop=StopRule(min_bit_errors=0, min_word_errors=0,
                      max_frames=1200),
        lanes=128, rounds_per_call=16, refill_every=1, seed=5, qc=QC,
        preprocess=lambda y: saturate(y, 2.5),
    )
    s1 = simulate_stream_gdbf(CODE, cfg, SNR, mesh=mesh, **kw)
    s2 = simulate_stream_gdbf(CODE, cfg, SNR, mesh=mesh, **kw)
    assert (s1.total_words, s1.errors, s1.word_errors) == (
        s2.total_words, s2.errors, s2.word_errors
    )
    assert s1.total_words >= 1200
    assert s1.iteration_hist.sum() == s1.total_words
    assert s1.extra["phase_hist"].sum() == s1.total_words
    s0 = simulate_stream_gdbf(CODE, cfg, SNR, **kw)
    p = max(s0.ber, 1e-4)
    tol = 5.0 * np.sqrt(p * (1 - p) / s1.total_bits) + 0.25 * p
    assert abs(s1.ber - s0.ber) < tol, (s1.ber, s0.ber)


def test_simulate_stream_gdbf_stats_match_batched_harness():
    """End-to-end: simulate_stream_gdbf's aggregate statistics are
    consistent with the batched simulate() at the same operating point
    within Monte-Carlo tolerance, and its counters are self-consistent."""
    cfg = preset(
        "SMNGDBF", num_iterations=16, theta=-0.7, noise_scale=0.9,
        lam=0.98, alpha=0.8, window_size=10,
    )
    stop = StopRule(min_bit_errors=0, min_word_errors=0, max_frames=512)
    st_s = simulate_stream_gdbf(
        CODE, cfg, SNR, stop=stop, lanes=64, rounds_per_call=32,
        refill_every=1, seed=3, qc=QC,
        preprocess=lambda y: saturate(y, 2.5),
    )
    st_b = simulate(
        CODE,
        lambda yq, key: decode_gdbf(CODE, yq, SIGMA, cfg, key=key, qc=QC),
        SNR,
        stop=stop,
        batch_size=128,
        seed=3,
        preprocess=lambda y: saturate(y, 2.5),
    )
    assert st_s.total_words >= 512
    # self-consistency
    assert st_s.iteration_hist.sum() == st_s.total_words
    assert st_s.extra["phase_hist"].sum() == st_s.total_words
    assert st_s.satisfied_words <= st_s.total_words
    # statistical agreement (independent noise realizations)
    p = max(st_b.ber, 1e-4)
    tol = 5.0 * np.sqrt(p * (1 - p) / st_s.total_bits) + 0.2 * p
    assert abs(st_s.ber - st_b.ber) < tol, (st_s.ber, st_b.ber)
    assert abs(
        st_s.avg_iterations - st_b.avg_iterations
    ) <= max(2.0, 0.25 * st_b.avg_iterations)
