"""Layered min-sum schedule: correctness + convergence-vs-flooding tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpcsimulation_tpu.channel import awgn, snr_to_sigma
from ldpcsimulation_tpu.codes.qc import QCCode, qc_ira, qc_peg
from ldpcsimulation_tpu.decoders.minsum_layered import decode_minsum_layered_qc
from ldpcsimulation_tpu.decoders.minsum_qc import decode_minsum_qc


def layered_oracle(qc: QCCode, y, T, variant="plain", alpha=1.0, delta=0.0):
    """Straightforward per-edge NumPy implementation of the layered spec.

    Two-phase per layer (scan all rows from the pre-layer posterior, then
    apply the updates) — identical to sequential row order for single-edge
    blocks, and the defined block-parallel semantics for multi-edge pairs
    and minus edges (see decoders/minsum_layered.py docstring)."""
    z = qc.z
    minus = set(qc.minus_edges)
    q = np.array(y, np.float64).reshape(qc.nb, z)
    L = {}  # (bi, t) -> [z]
    for bi in range(qc.mb):
        for t in range(len(qc.cn_blocks[bi])):
            L[(bi, t)] = np.zeros(z)
    for _ in range(T):
        for bi in range(qc.mb):
            blocks = qc.cn_blocks[bi]
            dc = len(blocks)
            qext = np.zeros((dc, z))
            outs = np.zeros((dc, z))
            absent = np.zeros((dc, z), bool)
            for r in range(z):  # phase 1: scans from pre-layer posterior
                for t, (bj, s) in enumerate(blocks):
                    if (bi, bj, s, r) in minus:
                        qext[t, r] = np.inf
                        absent[t, r] = True
                    else:
                        qext[t, r] = q[bj, (r + s) % z] - L[(bi, t)][r]
                min1 = min2 = np.inf
                minidx = -1
                sprod = 1.0
                for t in range(dc):
                    v = qext[t, r]
                    a = abs(v)
                    sprod *= 1.0 if v >= 0 else -1.0
                    if a <= min1:
                        min2, min1, minidx = min1, a, t
                    elif a < min2:
                        min2 = a
                for t in range(dc):
                    mag = min2 if t == minidx else min1
                    out = sprod * mag * (1.0 if qext[t, r] >= 0 else -1.0)
                    if variant == "normalized":
                        out = out / alpha
                    elif variant == "offset":
                        m2 = abs(out) - delta
                        out = (
                            (1.0 if out >= 0 else -1.0) * m2 if m2 > 0 else 0.0
                        )
                    outs[t, r] = 0.0 if absent[t, r] else out
            t = 0
            while t < dc:  # phase 2: apply posteriors
                bj, s = blocks[t]
                a_t = np.empty(z)
                for r in range(z):
                    c = (r + s) % z
                    a_t[c] = (
                        q[bj, c] if absent[t, r] else qext[t, r] + outs[t, r]
                    )
                if t + 1 < dc and blocks[t + 1][0] == bj:
                    s2 = blocks[t + 1][1]
                    a_2 = np.empty(z)
                    for r in range(z):
                        c = (r + s2) % z
                        a_2[c] = (
                            q[bj, c]
                            if absent[t + 1, r]
                            else qext[t + 1, r] + outs[t + 1, r]
                        )
                    q[bj] = (a_t - q[bj]) + a_2
                    L[(bi, t + 1)] = outs[t + 1].copy()
                    t_step = 2
                else:
                    q[bj] = a_t
                    t_step = 1
                L[(bi, t)] = outs[t].copy()
                t += t_step
    d = np.where(q.reshape(-1) > 0, 1, -1)
    return d


@pytest.fixture(scope="module")
def lqc():
    return qc_peg(12, 6, 3, z=8, seed=3)  # (96, 48)


@pytest.mark.parametrize(
    "variant,kw",
    [("plain", {}), ("normalized", {"alpha": 1.25}), ("offset", {"delta": 0.1})],
)
def test_layered_matches_numpy_oracle(lqc, rng, variant, kw):
    y = rng.normal(0.5, 1.0, size=(4, lqc.n))
    res = decode_minsum_layered_qc(
        lqc, jnp.asarray(y), num_iterations=4, variant=variant, **kw
    )
    hard = np.asarray(res.hard)
    for f in range(4):
        d_ref = layered_oracle(lqc, y[f], 4, variant=variant, **kw)
        np.testing.assert_array_equal(hard[f], d_ref, err_msg=f"frame {f}")


def test_layered_converges_faster_than_flooding():
    """The point of the layered schedule: fewer iterations at equal BER."""
    qc = qc_peg(24, 12, 3, z=16, seed=5)  # (384, 192)
    sigma = float(snr_to_sigma(3.0, 0.5))
    y = awgn(jax.random.key(0), jnp.ones((256, qc.n)), sigma)
    fl = decode_minsum_qc(qc, y, num_iterations=30, early_termination=True)
    la = decode_minsum_layered_qc(qc, y, num_iterations=30, early_termination=True)
    it_f = np.asarray(fl.iterations, float)
    it_l = np.asarray(la.iterations, float)
    ok_f = np.asarray(fl.satisfied)
    ok_l = np.asarray(la.satisfied)
    assert ok_l.mean() >= ok_f.mean() - 0.02
    both = ok_f & ok_l
    assert it_l[both].mean() < 0.75 * it_f[both].mean(), (
        f"layered {it_l[both].mean():.2f} vs flooding {it_f[both].mean():.2f}"
    )


def test_layered_decodes_clean(lqc):
    y = jnp.ones((8, lqc.n)) * 0.9
    res = decode_minsum_layered_qc(lqc, y, num_iterations=5)
    assert (np.asarray(res.hard) == 1).all()
    assert np.asarray(res.satisfied).all()


def test_wifi_like_code():
    from ldpcsimulation_tpu.codes.library import load_named_qc

    qc = load_named_qc("wifi_like_1944_972")
    assert qc.n == 1944 and qc.m == 972 and qc.z == 81
    h = qc.to_alist().to_dense()
    gram = h.T @ h
    np.fill_diagonal(gram, 0)
    assert gram.max() <= 1
    # IRA parity part: last column weight 2, accumulator chain
    col_w = h.sum(axis=0)
    assert col_w[-1] == 2
    assert col_w[12 * 81] == 3  # first parity column weight 3


def test_layered_on_wifi_like():
    from ldpcsimulation_tpu.codes.library import load_named_qc

    qc = load_named_qc("wifi_like_1944_972")
    sigma = float(snr_to_sigma(2.5, 0.5))
    y = awgn(jax.random.key(1), jnp.ones((32, qc.n)), sigma)
    res = decode_minsum_layered_qc(
        qc, y, num_iterations=30, variant="normalized", alpha=1.25,
        early_termination=True,
    )
    hard = np.asarray(res.hard)
    assert (hard == 1).all(axis=1).mean() > 0.8


def bp_layered_oracle(qc, llr, T, max_llr=20.0):
    """Per-edge NumPy implementation of the layered BP spec (tanh form).

    Two-phase per layer, like :func:`layered_oracle`: scans read the
    pre-layer posterior, updates apply afterwards — identical to
    sequential row order for single-edge blocks, the block-parallel rule
    for pairs, and minus edges are product-excluded and column-neutral."""
    import math

    z = qc.z
    minus = set(qc.minus_edges)
    q = np.array(llr, np.float64).reshape(qc.nb, z)
    L = {
        (bi, t): np.zeros(z)
        for bi in range(qc.mb)
        for t in range(len(qc.cn_blocks[bi]))
    }
    for _ in range(T):
        for bi in range(qc.mb):
            blocks = qc.cn_blocks[bi]
            dc = len(blocks)
            qext = np.zeros((dc, z))
            outs = np.zeros((dc, z))
            absent = np.zeros((dc, z), bool)
            for r in range(z):
                qin = []
                for t, (bj, s) in enumerate(blocks):
                    absent[t, r] = (bi, bj, s, r) in minus
                    v = q[bj, (r + s) % z] - L[(bi, t)][r]
                    qext[t, r] = v
                    qin.append(max(-max_llr, min(max_llr, v)))
                for t in range(dc):
                    if absent[t, r]:
                        outs[t, r] = 0.0
                        continue
                    prod = 1.0
                    for t2, v in enumerate(qin):
                        if t2 != t and not absent[t2, r]:
                            prod *= math.tanh(v / 2.0)
                    prod = max(-1 + 1e-15, min(1 - 1e-15, prod))
                    outs[t, r] = math.log((1 + prod) / (1 - prod))
            t = 0
            while t < dc:
                bj, s = blocks[t]
                a_t = np.empty(z)
                for r in range(z):
                    c = (r + s) % z
                    a_t[c] = (
                        q[bj, c] if absent[t, r] else qext[t, r] + outs[t, r]
                    )
                if t + 1 < dc and blocks[t + 1][0] == bj:
                    s2 = blocks[t + 1][1]
                    a_2 = np.empty(z)
                    for r in range(z):
                        c = (r + s2) % z
                        a_2[c] = (
                            q[bj, c]
                            if absent[t + 1, r]
                            else qext[t + 1, r] + outs[t + 1, r]
                        )
                    q[bj] = (a_t - q[bj]) + a_2
                    L[(bi, t + 1)] = outs[t + 1].copy()
                    t_step = 2
                else:
                    q[bj] = a_t
                    t_step = 1
                L[(bi, t)] = outs[t].copy()
                t += t_step
    return np.where(q.reshape(-1) > 0, 1, -1)


def test_bp_layered_matches_numpy_oracle(lqc, rng):
    from ldpcsimulation_tpu.decoders.bp_layered import decode_bp_layered_qc

    llr = np.clip(rng.normal(0.5, 2.0, size=(4, lqc.n)), -18, 18)
    res = decode_bp_layered_qc(lqc, jnp.asarray(llr), num_iterations=4)
    hard = np.asarray(res.hard)
    for f in range(4):
        d_ref = bp_layered_oracle(lqc, llr[f], 4)
        np.testing.assert_array_equal(hard[f], d_ref, err_msg=f"frame {f}")


def test_bp_layered_converges_faster_than_flooding():
    from ldpcsimulation_tpu.decoders.bp_layered import decode_bp_layered_qc
    from ldpcsimulation_tpu.decoders.bp_qc import decode_bp_qc
    from ldpcsimulation_tpu.channel import llr_from_channel, snr_to_n0

    qc = qc_peg(24, 12, 3, z=16, seed=5)
    n0 = float(snr_to_n0(2.5, 0.5))
    sigma = float(np.sqrt(n0 / 2))
    y = awgn(jax.random.key(3), jnp.ones((256, qc.n)), sigma)
    llr = llr_from_channel(y, n0)
    fl = decode_bp_qc(qc, llr, 30, early_termination=True)
    la = decode_bp_layered_qc(qc, llr, 30, early_termination=True)
    ok_f = np.asarray(fl.satisfied)
    ok_l = np.asarray(la.satisfied)
    assert ok_l.mean() >= ok_f.mean() - 0.02
    both = ok_f & ok_l
    it_f = np.asarray(fl.iterations, float)[both]
    it_l = np.asarray(la.iterations, float)[both]
    assert it_l.mean() < 0.75 * it_f.mean(), (it_l.mean(), it_f.mean())


def test_bp_layered_not_worse_than_flooding_at_scale():
    """Regression pin: clamping the reconstructed posterior (the original
    formulation) collapsed ~1% of frames to ~800-bit-error garbage at
    2.5 dB on the (1008,504) code; the corrected clamp-on-CN-input-only
    semantics must keep layered at-or-better than flooding."""
    from ldpcsimulation_tpu.channel import llr_from_channel, snr_to_n0
    from ldpcsimulation_tpu.codes.library import load_named_qc
    from ldpcsimulation_tpu.decoders.bp_layered import decode_bp_layered_qc
    from ldpcsimulation_tpu.decoders.bp_qc import decode_bp_qc

    qc = load_named_qc("qc_1008_504")
    n0 = float(snr_to_n0(2.5, 0.5))
    sigma = float(np.sqrt(n0 / 2))
    y = awgn(jax.random.key(0), jnp.ones((512, qc.n)), sigma)
    llr = llr_from_channel(y, n0)
    fl = decode_bp_qc(qc, llr, 30, early_termination=True)
    la = decode_bp_layered_qc(qc, llr, 30, early_termination=True)
    fe_f = (np.asarray(fl.hard) != 1).any(axis=1)
    fe_l = (np.asarray(la.hard) != 1).any(axis=1)
    assert fe_l.sum() <= fe_f.sum() + 1
    assert (np.asarray(la.hard) != 1).mean() <= (
        np.asarray(fl.hard) != 1
    ).mean() + 1e-4


def test_layered_generalized_qc_matches_oracle():
    """Multi-edge pair + minus edge through the layered schedule: the
    vectorized decoder matches the two-phase NumPy oracle frame by frame."""
    from ldpcsimulation_tpu.codes.qc import build_qc_code_edges

    z = 5
    edges = [(0, 0, 1), (0, 0, 3), (0, 1, 0), (0, 2, 2),
             (1, 0, 2), (1, 1, 2), (1, 2, 4)]
    qc = build_qc_code_edges(edges, z, 2, 3, minus_edges=((1, 2, 4, 1),))
    rng = np.random.default_rng(7)
    y = rng.normal(size=(16, qc.n)).astype(np.float32)
    res = decode_minsum_layered_qc(qc, jnp.asarray(y), 4)
    hard = np.asarray(res.hard)
    for f in range(y.shape[0]):
        d_ref = layered_oracle(qc, y[f], 4)
        np.testing.assert_array_equal(hard[f], d_ref, err_msg=f"frame {f}")


def test_layered_generalized_rejects_defect_in_pair():
    from ldpcsimulation_tpu.codes.qc import build_qc_code_edges

    qc = build_qc_code_edges(
        [(0, 0, 1), (0, 0, 3), (0, 1, 0), (1, 1, 2), (1, 0, 0)],
        5, 2, 2, minus_edges=((0, 0, 3, 2),),
    )
    with pytest.raises(NotImplementedError):
        decode_minsum_layered_qc(qc, jnp.ones((1, qc.n), jnp.float32), 2)


def test_bp_layered_generalized_qc_matches_oracle():
    from ldpcsimulation_tpu.codes.qc import build_qc_code_edges
    from ldpcsimulation_tpu.decoders.bp_layered import decode_bp_layered_qc

    z = 5
    edges = [(0, 0, 1), (0, 0, 3), (0, 1, 0), (0, 2, 2),
             (1, 0, 2), (1, 1, 2), (1, 2, 4)]
    qc = build_qc_code_edges(edges, z, 2, 3, minus_edges=((1, 2, 4, 1),))
    rng = np.random.default_rng(9)
    llr = np.clip(rng.normal(0.5, 2.0, size=(16, qc.n)), -18, 18)
    res = decode_bp_layered_qc(qc, jnp.asarray(llr), 4)
    hard = np.asarray(res.hard)
    for f in range(llr.shape[0]):
        d_ref = bp_layered_oracle(qc, llr[f], 4)
        np.testing.assert_array_equal(hard[f], d_ref, err_msg=f"frame {f}")
