"""Min-sum and BP decoders vs the ragged NumPy oracle, plus channel tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpcsimulation_tpu.channel import (
    MAXLLR,
    awgn,
    bpsk,
    llr_from_channel,
    quantize_no_zero,
    quantize_round,
    quantize_threshold_table,
    snr_to_n0,
    snr_to_sigma,
)
from ldpcsimulation_tpu.codes import build_code, make_regular_code, peg
from ldpcsimulation_tpu.decoders.bp import decode_bp
from ldpcsimulation_tpu.decoders.minsum import decode_minsum
from tests import oracle


@pytest.fixture(scope="module")
def small_code():
    a = peg(48, 24, 3, seed=5)
    return a, build_code(a)


def _random_llrs(rng, b, n, scale=2.0):
    return rng.normal(0.0, scale, size=(b, n)).astype(np.float64)


# ---------------------------------------------------------------- channel


def test_snr_conversions():
    n0 = float(snr_to_n0(2.0, 0.5))
    assert n0 == pytest.approx(10 ** (-0.2) / 0.5)
    sigma = float(snr_to_sigma(2.0, 0.5))
    assert sigma == pytest.approx(np.sqrt(n0 / 2))


def test_awgn_statistics():
    key = jax.random.key(0)
    x = jnp.ones((200, 100))
    sigma = 0.7
    y_mult = awgn(key, x, sigma, form="multiplicative", dtype=jnp.float64)
    y_add = awgn(key, x, sigma, form="additive", dtype=jnp.float64)
    # For x=+1 the two forms coincide
    np.testing.assert_allclose(np.asarray(y_mult), np.asarray(y_add))
    assert float(jnp.std(y_mult - 1.0)) == pytest.approx(sigma, rel=0.05)
    # For x=-1, multiplicative flips noise sign; distribution is symmetric
    ym = awgn(key, -x, sigma, form="multiplicative", dtype=jnp.float64)
    assert float(jnp.mean(ym)) == pytest.approx(-1.0, abs=0.01)


def test_llr_clamp():
    y = jnp.array([0.1, 10.0, -10.0])
    n0 = 0.5
    out = np.asarray(llr_from_channel(y, n0))
    assert out[0] == pytest.approx(0.8)
    assert out[1] == MAXLLR and out[2] == -MAXLLR


def test_bpsk():
    assert np.asarray(bpsk(jnp.array([0, 1, 0]))).tolist() == [1, -1, 1]


def test_quantize_no_zero():
    # decodeMinSum.cpp:479-490 with Ymax=2, Nq=5: LSB = 1.0
    xs = jnp.array([0.0, 0.3, 1.2, 2.5, -0.3, -1.7, -9.0, 2.0])
    out = np.asarray(quantize_no_zero(xs, 2.0, 5))
    assert out.tolist() == [1.0, 1.0, 1.0, 2.0, -1.0, -1.0, -2.0, 2.0]


def test_quantize_round():
    # decodeGDBF.cpp:488-493 with Ymax=2, NQ=3: step = 0.5
    xs = jnp.array([0.0, 0.2, 0.3, 0.74, 0.76, -0.3, 5.0])
    out = np.asarray(quantize_round(xs, 2.0, 3))
    assert out.tolist() == [0.0, 0.0, 0.5, 0.5, 1.0, -0.5, 5.0]


def test_quantize_threshold_table():
    # SystemC ldpcsim.h:85-118, Nq=5, Ymax=2: levels -2,-1,0,1,2,
    # thresholds -1.5,-0.5,0.5,1.5 with strict > (ties go DOWN).
    xs = jnp.array([-3.0, -1.6, -1.5, -1.49, 0.0, 0.5, 0.51, 1.5, 3.0])
    out = np.asarray(quantize_threshold_table(xs, 2.0, 5))
    assert out.tolist() == [-2.0, -2.0, -2.0, -1.0, 0.0, 0.0, 1.0, 1.0, 2.0]


# ---------------------------------------------------------------- min-sum


@pytest.mark.parametrize(
    "variant,kw",
    [
        ("plain", {}),
        ("normalized", {"alpha": 1.25}),
        ("offset", {"delta": 0.15}),
    ],
)
def test_minsum_matches_oracle(small_code, rng, variant, kw):
    a, code = small_code
    b = 4
    y = _random_llrs(rng, b, a.n)
    res = decode_minsum(code, jnp.asarray(y), num_iterations=5, variant=variant, **kw)
    hard = np.asarray(res.hard)
    for f in range(b):
        d_ref, _s2c, _c2s = oracle.minsum_decode(a, y[f], 5, variant=variant, **kw)
        np.testing.assert_array_equal(hard[f], d_ref, err_msg=f"frame {f}")
    assert np.asarray(res.iterations).tolist() == [5] * b


def test_minsum_message_level_match(small_code, rng):
    """Check intermediate messages, not just decisions, after 1 iteration."""
    a, code = small_code
    y = _random_llrs(rng, 1, a.n)
    from ldpcsimulation_tpu.decoders.minsum import minsum_cn_update

    y_t = jnp.asarray(y).T
    v2c0 = jnp.repeat(y_t, code.dv_max, axis=0)
    c2v = np.asarray(minsum_cn_update(code, v2c0)).reshape(
        code.m, code.dc_max, 1
    )
    _d, _s2c, c2s_ref = oracle.minsum_decode(a, y[0], 1)
    for c in range(a.m):
        for j in range(len(a.mlist[c])):
            assert c2v[c, j, 0] == pytest.approx(c2s_ref[c][j], abs=1e-12)


def test_minsum_tie_break_last_min_wins():
    """Two equal minima: the LAST one (slot order) gets min2 = the other min.

    decodeMinSum.cpp:428-437 uses `<=`, so with inputs (+1, +1, +3) the
    min-index lands on slot 1; slot 1 emits min2=1 and slots 0,2 emit min1=1
    — outputs (1, 1, 1)*signs. With inputs (+1, +2, +3) outputs are (2,1,1).
    """
    h = np.array([[1, 1, 1]])
    a_ = oracle.Alist(n=3, m=1, nlist=[[0], [0], [0]], mlist=[[0, 1, 2]])
    code = build_code(a_)
    from ldpcsimulation_tpu.decoders.minsum import minsum_cn_update

    y = jnp.array([[1.0], [1.0], [3.0]])  # [N*dv=3, B=1]
    out = np.asarray(minsum_cn_update(code, y)).reshape(1, 3)
    assert out[0].tolist() == [1.0, 1.0, 1.0]
    y2 = jnp.array([[1.0], [2.0], [3.0]])
    out2 = np.asarray(minsum_cn_update(code, y2)).reshape(1, 3)
    assert out2[0].tolist() == [2.0, 1.0, 1.0]


def test_minsum_decodes_noisy_codeword():
    """End-to-end: all-zero codeword through mild AWGN decodes cleanly."""
    code = make_regular_code(96, 48, 3, seed=0)
    b = 64
    key = jax.random.key(42)
    sigma = float(snr_to_sigma(4.0, 0.5))
    x = jnp.ones((b, code.n))
    y = awgn(key, x, sigma)
    res = decode_minsum(code, y, num_iterations=20, early_termination=True)
    hard = np.asarray(res.hard)
    # At 4 dB on a (3,6) code nearly all frames must decode to all-(+1)
    frame_ok = (hard == 1).all(axis=1)
    assert frame_ok.mean() > 0.9
    assert np.asarray(res.satisfied)[frame_ok].all()
    # early termination must report fewer iterations than the cap for most
    assert np.median(np.asarray(res.iterations)[frame_ok]) < 20


def test_minsum_early_termination_freezes_state(small_code, rng):
    """ET at high iteration cap must agree with the no-ET decode on frames
    that converge (the frozen state is the first satisfying one)."""
    a, code = small_code
    key = jax.random.key(7)
    sigma = float(snr_to_sigma(3.0, 0.5))
    y = awgn(key, jnp.ones((32, a.n)), sigma)
    res_et = decode_minsum(code, y, num_iterations=15, early_termination=True)
    sat = np.asarray(res_et.satisfied)
    hard = np.asarray(res_et.hard)
    # each satisfied frame's output really does satisfy all checks
    for f in np.flatnonzero(sat):
        assert oracle.syndrome_ok(a, hard[f].tolist())


# ---------------------------------------------------------------- BP


def test_bp_matches_oracle(small_code, rng):
    a, code = small_code
    b = 4
    llr = np.clip(_random_llrs(rng, b, a.n, scale=4.0), -MAXLLR, MAXLLR)
    res = decode_bp(code, jnp.asarray(llr), num_iterations=5)
    hard = np.asarray(res.hard)
    for f in range(b):
        d_ref, _s2c, _c2s = oracle.bp_decode(a, llr[f], 5)
        np.testing.assert_array_equal(hard[f], d_ref, err_msg=f"frame {f}")


def test_bp_cn_message_match(small_code, rng):
    """phi-domain CN update equals the tanh-product form (float64)."""
    a, code = small_code
    llr = np.clip(_random_llrs(rng, 1, a.n, scale=3.0), -MAXLLR, MAXLLR)
    from ldpcsimulation_tpu.decoders.bp import bp_cn_update

    llr_t = jnp.asarray(llr).T
    v2c0 = jnp.repeat(llr_t, code.dv_max, axis=0)
    c2v = np.asarray(bp_cn_update(code, v2c0)).reshape(code.m, code.dc_max, 1)
    _d, _s2c, c2s_ref = oracle.bp_decode(a, llr[0], 1)
    for c in range(a.m):
        for j in range(len(a.mlist[c])):
            assert c2v[c, j, 0] == pytest.approx(c2s_ref[c][j], rel=1e-9, abs=1e-9)


def test_bp_zero_message():
    """A zero input message forces the other outputs of that check to 0."""
    a_ = oracle.Alist(n=3, m=1, nlist=[[0], [0], [0]], mlist=[[0, 1, 2]])
    code = build_code(a_)
    from ldpcsimulation_tpu.decoders.bp import bp_cn_update

    v2c = jnp.array([[0.0], [2.0], [-3.0]])
    out = np.asarray(bp_cn_update(code, v2c)).reshape(3)
    assert out[1] == 0.0 and out[2] == 0.0
    # the zero-slot output is the product of the OTHER two (finite, negative)
    assert out[0] < 0 and np.isfinite(out[0])


def test_bp_float32_stability(small_code):
    """Saturated LLRs (±20) must not produce inf/nan in float32."""
    a, code = small_code
    llr = jnp.full((2, a.n), 20.0, jnp.float32)
    res = decode_bp(code, llr, num_iterations=3)
    assert np.isfinite(np.asarray(res.hard)).all()
    assert (np.asarray(res.hard) == 1).all()


def test_bp_decodes_noisy_codeword():
    code = make_regular_code(96, 48, 3, seed=0)
    b = 64
    key = jax.random.key(3)
    snr = 3.0
    rate = 0.5
    sigma = float(snr_to_sigma(snr, rate))
    n0 = float(snr_to_n0(snr, rate))
    y = awgn(key, jnp.ones((b, code.n)), sigma)
    llr = llr_from_channel(y, n0)
    res = decode_bp(code, llr, num_iterations=30, early_termination=True)
    hard = np.asarray(res.hard)
    assert (hard == 1).all(axis=1).mean() > 0.9


def test_bp_clamps_extreme_input_llrs(small_code):
    """decodeBP.cpp:188-191 clamps input LLRs to ±MAXLLR; without the clamp
    |llr| ≳ 89 makes phi underflow to 0 in f32 and a later phi(0)=inf turns
    total − self into NaN.  Extreme inputs must decode like clamped ones."""
    _, small_code = small_code
    llr = np.full((2, small_code.n), 1000.0, np.float32)
    llr[0, 0] = -500.0  # one flipped bit, absurd confidence
    out = decode_bp(small_code, jnp.asarray(llr), num_iterations=5)
    assert not np.any(np.isnan(np.asarray(out.hard)))
    ref = decode_bp(
        small_code, jnp.clip(jnp.asarray(llr), -20, 20), num_iterations=5
    )
    np.testing.assert_array_equal(np.asarray(out.hard), np.asarray(ref.hard))


def test_minsum_matches_oracle_many_seeds(small_code):
    """Association-pinning regression (the DD-BMP lesson applied to
    min-sum): decoder and oracle share the exact message-first/channel-
    last grouping, so bit-exactness must hold for ANY draw — 32 fresh
    seeds x 4 frames of quantized samples (non-representable values are
    what expose grouping drift)."""
    from ldpcsimulation_tpu.channel import quantize_no_zero

    a, code = small_code
    sigma = float(snr_to_sigma(3.0, 0.5))
    for seed in range(32):
        r = np.random.default_rng(20_000 + seed)
        y = np.ones((4, a.n)) * (1.0 + sigma * r.normal(size=(4, a.n)))
        yq = np.asarray(quantize_no_zero(jnp.asarray(y), 1.5, 8.0))
        res = decode_minsum(code, jnp.asarray(yq), num_iterations=8)
        hard = np.asarray(res.hard)
        for f in range(4):
            d_ref, _s, _c = oracle.minsum_decode(a, yq[f], 8)
            np.testing.assert_array_equal(
                hard[f], d_ref, err_msg=f"seed {seed} frame {f}"
            )
