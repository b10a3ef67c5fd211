"""NGDBFhw streaming harness: per-frame equality vs the batched decoder.

A streamed lane injected at ring offset ``g0`` behaves exactly like
``decode_ngdbf_hw`` run on that frame with its per-gid ring injected and
``qpointer0 = g0`` — the rec hook records ``qp0`` per frame so these
tests replay every retired frame bit-exactly, across single- and
multi-phase configs, refill cadences, and call boundaries.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpcsimulation_tpu.channel.awgn import snr_to_sigma
from ldpcsimulation_tpu.codes.construct import peg
from ldpcsimulation_tpu.codes import build_code
from ldpcsimulation_tpu.decoders.ngdbf_hw import (
    NGDBFHwConfig,
    decode_ngdbf_hw,
    hw_quantize_int,
)
from ldpcsimulation_tpu.harness.montecarlo import StopRule
from ldpcsimulation_tpu.harness.stream_ngdbfhw import (
    build_channel_pool_hw,
    hw_stream_init,
    make_hw_stream_call,
    simulate_stream_ngdbfhw,
)

CODE = build_code(peg(96, 48, 3, seed=7))
SNR = 4.0
SIGMA = float(snr_to_sigma(SNR, 0.5))
KCH = jax.random.key(11)
KDEC = jax.random.key(23)


def _gid_ring(cfg, gid):
    """The exact raw ring the stream draws for frame ``gid`` ([ring_len]
    f32, pre-scale — decode_ngdbf_hw applies its own quantization)."""
    k = jax.random.fold_in(KDEC, gid)
    return SIGMA * cfg.noise_scale * jax.random.normal(
        k, (cfg.ring_len,), jnp.float32
    )


def run_stream(cfg, pools, lanes, rounds, refill_every):
    rec_cap = max(f for _b, f in pools) + lanes
    state = hw_stream_init(CODE, cfg, lanes)
    call = make_hw_stream_call(
        CODE, cfg, rounds, refill_every, record=True, rec_cap=rec_cap
    )
    per_frame = {}
    for base, f in pools:
        pool, unc, sat0 = build_channel_pool_hw(
            CODE, KCH, base, f, SIGMA
        )
        state, acc, rec = call(
            state, pool, unc, sat0, jnp.int32(base), KDEC, SIGMA
        )
        a = jax.device_get(acc)
        r = jax.device_get(rec)
        rc = int(a["rc"])
        assert rc <= rec_cap
        for g, it, er, st_, qp in zip(
            r["gid"][:rc], r["iters"][:rc], r["errs"][:rc],
            r["sat"][:rc], r["qp0"][:rc],
        ):
            assert int(g) >= 0
            assert int(g) not in per_frame, "frame retired twice"
            per_frame[int(g)] = (int(it), int(er), bool(st_), int(qp))
        # counters == records
        assert int(a["frames"]) == rc
        assert int(a["iter_sum"]) == int(r["iters"][:rc].sum())
        assert int(a["bit_errs"]) == int(r["errs"][:rc].sum())
    return per_frame


def batched_truth(cfg, gid, qp0):
    """Batched decode of frame ``gid`` with the stream's exact ring and
    injection offset."""
    keys = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(
        KCH, jnp.asarray([gid])
    )
    y = 1.0 + SIGMA * jax.vmap(
        lambda kk: jax.random.normal(kk, (CODE.n,), jnp.float32)
    )(keys)
    res = decode_ngdbf_hw(
        CODE, y, SIGMA, cfg, key=jax.random.key(0),
        qpointer0=jnp.asarray([qp0], jnp.int32),
        ring_noise=_gid_ring(cfg, gid)[:, None],
    )
    errs = int((np.asarray(res.hard)[0] != 1).sum())
    return (
        int(np.asarray(res.iterations)[0]),
        errs,
        bool(np.asarray(res.satisfied)[0]),
    )


@pytest.mark.parametrize("refill_every", [1, 3])
def test_hw_stream_matches_batch_single_phase(refill_every):
    cfg = NGDBFHwConfig(num_iterations=12, ring_len=CODE.n + 40)
    per_frame = run_stream(
        cfg, [(0, 64), (64, 48)], lanes=16, rounds=40,
        refill_every=refill_every,
    )
    assert len(per_frame) >= 80
    # the ring-offset semantic must actually vary across frames
    assert len({qp for _i, _e, _s, qp in per_frame.values()}) > 3
    for g, (it, er, sat, qp0) in per_frame.items():
        assert batched_truth(cfg, g, qp0) == (it, er, sat), g


def test_hw_stream_matches_batch_multiphase():
    """Redecode phases chain immediately in the stream; least-errors/
    least-iterations across phases match the batched parallel-decoder
    model frame for frame."""
    cfg = NGDBFHwConfig(num_iterations=8, max_phases=3,
                        ring_len=CODE.n + 64)
    per_frame = run_stream(
        cfg, [(0, 72)], lanes=12, rounds=220, refill_every=1
    )
    assert len(per_frame) >= 60
    multi = 0
    for g, (it, er, sat, qp0) in per_frame.items():
        truth = batched_truth(cfg, g, qp0)
        assert truth == (it, er, sat), (g, truth, (it, er, sat))
        if not sat or it > 0:
            multi += 1
    assert multi > 0


def test_sharded_hw_stream_matches_batch():
    """Mesh-sharded NGDBFhw stream (8 virtual devices): per-frame
    (iters, errs, sat) equality via each frame's recorded ring offset —
    the gstep scalar is replicated (devices advance it in lockstep)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from ldpcsimulation_tpu.harness.stream import _lane_spec

    mesh = Mesh(np.array(jax.devices()), ("data",))
    nd = mesh.shape["data"]
    cfg = NGDBFHwConfig(num_iterations=12, ring_len=CODE.n + 40)
    F, lanes, rec_cap = 256, 64, 512
    call = make_hw_stream_call(
        CODE, cfg, rounds=24, refill_every=2, record=True,
        rec_cap=rec_cap, mesh=mesh,
    )
    spec = _lane_spec("data")
    state = hw_stream_init(CODE, cfg, lanes)
    state = jax.device_put(
        state,
        jax.tree.map(lambda x: NamedSharding(mesh, spec(x)), state),
    )
    shard_rows = NamedSharding(mesh, P("data"))
    pool_fn = jax.jit(
        lambda b: build_channel_pool_hw(CODE, KCH, b, F, SIGMA),
        out_shardings=(shard_rows, shard_rows, shard_rows),
    )
    per_frame = {}
    base = 0
    for _ci in range(2):
        pool, unc, sat0 = pool_fn(jnp.int32(base))
        state, acc, rec = call(
            state, pool, unc, sat0, base, KDEC, SIGMA
        )
        r = jax.device_get(rec)
        seg = rec_cap + 1
        for d_i in range(nd):
            rc_d = int(r["rc_local"][d_i])
            for g, it, er, st_, qp in zip(
                r["gid"][d_i * seg:d_i * seg + rc_d],
                r["iters"][d_i * seg:d_i * seg + rc_d],
                r["errs"][d_i * seg:d_i * seg + rc_d],
                r["sat"][d_i * seg:d_i * seg + rc_d],
                r["qp0"][d_i * seg:d_i * seg + rc_d],
            ):
                assert int(g) not in per_frame
                per_frame[int(g)] = (int(it), int(er), bool(st_), int(qp))
        base += F
    assert len(per_frame) >= 150
    for g, (it, er, sat, qp0) in list(per_frame.items())[:64]:
        assert batched_truth(cfg, g, qp0) == (it, er, sat), g


def test_sweep_stream_cli_ngdbfhw(tmp_path):
    """CLI route: ngdbfhw --stream produces a reference-format row and
    rejects the --persistent-qpointer combination."""
    from ldpcsimulation_tpu.tools import sweep as sweep_mod

    log = str(tmp_path / "hw_stream.log")
    rc = sweep_mod.main([
        "ngdbfhw", "--code", "peg_96_48", "--snr", "4.0", "-T", "12",
        "--log", log, "--batch", "64", "--stream", "--frames", "256",
    ])
    assert rc == 0
    row = open(log).read().strip()
    assert row and len(row.split("\n")) == 1
    with pytest.raises(SystemExit):
        sweep_mod.main([
            "ngdbfhw", "--code", "peg_96_48", "--snr", "4.0", "-T", "12",
            "--log", log, "--batch", "64", "--stream", "--frames", "64",
            "--persistent-qpointer",
        ])


def test_simulate_stream_ngdbfhw_stats():
    """Driver: counters self-consistent; statistical agreement with the
    batched fixed-frames harness at the same operating point."""
    from ldpcsimulation_tpu.harness.montecarlo import simulate

    cfg = NGDBFHwConfig(num_iterations=16, ring_len=CODE.n + 64)
    st = simulate_stream_ngdbfhw(
        CODE, cfg, SNR,
        stop=StopRule(min_bit_errors=0, min_word_errors=0,
                      max_frames=1024),
        lanes=64, rounds_per_call=16, refill_every=2, seed=3,
        avg_iters_hint=8.0,
    )
    assert st.total_words >= 1024
    assert st.iteration_hist.sum() == st.total_words
    sb = simulate(
        CODE,
        lambda y, key: decode_ngdbf_hw(CODE, y, SIGMA, cfg, key=key),
        SNR,
        stop=StopRule.fixed_frames(1024),
        batch_size=256,
        seed=3,
    )
    p = max(sb.ber, 1e-4)
    tol = 5.0 * np.sqrt(p * (1 - p) / st.total_bits) + 0.25 * p
    assert abs(st.ber - sb.ber) < tol, (st.ber, sb.ber)
    assert abs(
        st.avg_iterations - sb.avg_iterations
    ) <= max(2.0, 0.3 * sb.avg_iterations)
