"""DD-BMP decoder vs the ragged oracle + end-to-end checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpcsimulation_tpu.channel import awgn, quantize_no_zero, snr_to_sigma
from ldpcsimulation_tpu.codes import build_code, make_regular_code, peg
from ldpcsimulation_tpu.decoders.ddbmp import decode_ddbmp
from tests import oracle


@pytest.fixture(scope="module")
def dcode():
    a = peg(48, 24, 3, seed=21)
    return a, build_code(a)


def test_ddbmp_matches_oracle(dcode, rng):
    a, code = dcode
    b = 6
    sigma = float(snr_to_sigma(4.0, 0.5))
    y = np.ones((b, a.n)) * (1.0 + sigma * rng.normal(size=(b, a.n)))
    yq = np.asarray(quantize_no_zero(jnp.asarray(y), 1.5, 8.0))
    res = decode_ddbmp(code, jnp.asarray(yq), num_iterations=20)
    hard = np.asarray(res.hard)
    iters = np.asarray(res.iterations)
    sats = np.asarray(res.satisfied)
    for f in range(b):
        ref = oracle.ddbmp_decode(a, yq[f], 20)
        np.testing.assert_array_equal(hard[f], ref["d"], err_msg=f"frame {f}")
        assert iters[f] == ref["iterations"], f"frame {f}"
        assert bool(sats[f]) == ref["satisfied"], f"frame {f}"


def test_ddbmp_decodes_end_to_end():
    code = make_regular_code(96, 48, 3, seed=0)
    b = 128
    sigma = float(snr_to_sigma(5.0, 0.5))
    key = jax.random.key(11)
    y = awgn(key, jnp.ones((b, code.n)), sigma)
    yq = quantize_no_zero(y, 1.5, 8.0)
    res = decode_ddbmp(code, yq, num_iterations=50)
    hard = np.asarray(res.hard)
    frame_ok = (hard == 1).all(axis=1)
    assert frame_ok.mean() > 0.9
    # stop-after-update semantics: a clean frame still costs one round but
    # reports iteration index 0
    assert np.asarray(res.iterations)[frame_ok].min() == 0


def test_ddbmp_iteration_semantics(dcode):
    """A frame whose first update round satisfies checks reports it=0."""
    a, code = dcode
    y = jnp.ones((1, a.n)) * 0.9  # clean channel
    res = decode_ddbmp(code, y, num_iterations=10)
    assert int(res.iterations[0]) == 0
    assert bool(res.satisfied[0])


def test_ddbmp_qc_bit_exact_vs_generic():
    """QC roll DD-BMP == generic gather DD-BMP, decisions AND iteration
    counts, on a plain QC code and on a generalized (pair + minus) one."""
    import jax.numpy as jnp

    from ldpcsimulation_tpu.codes import build_code
    from ldpcsimulation_tpu.codes.qc import build_qc_code_edges, qc_peg
    from ldpcsimulation_tpu.channel import quantize_no_zero
    from ldpcsimulation_tpu.decoders.ddbmp import (
        decode_ddbmp,
        decode_ddbmp_qc,
    )

    rng = np.random.default_rng(11)
    cases = [
        qc_peg(12, 6, 3, z=8, seed=3),
        build_qc_code_edges(
            [(0, 0, 1), (0, 0, 3), (0, 1, 0), (0, 2, 2),
             (1, 0, 2), (1, 1, 2), (1, 2, 4)],
            5, 2, 3, minus_edges=((1, 2, 4, 1),),
        ),
    ]
    for qc in cases:
        code = build_code(qc.to_alist())
        y = rng.normal(1.0, 0.8, size=(64, qc.n)).astype(np.float32)
        yq = quantize_no_zero(jnp.asarray(y), 1.5, 8.0)
        a = decode_ddbmp_qc(qc, yq, 20)
        bres = decode_ddbmp(code, yq, 20)
        np.testing.assert_array_equal(np.asarray(a.hard), np.asarray(bres.hard))
        np.testing.assert_array_equal(
            np.asarray(a.iterations), np.asarray(bres.iterations)
        )
        np.testing.assert_array_equal(
            np.asarray(a.satisfied), np.asarray(bres.satisfied)
        )


def test_ddbmp_matches_oracle_many_seeds(dcode):
    """Regression for the floating-point association bug: the decoder
    computed (mem + total) − msg and total = y + Σmsgs, while the C
    reference accumulates mem += (sum − msg) with sum left-folded FROM y
    (decodeDDBMP.cpp:399-413).  The 1-ulp drift compounds in the memories
    and flips message signs at zero crossings — before the fix, ~1% of
    random frames diverged from the oracle (first caught by an
    order-shifted rng draw under pytest-xdist).  48 fresh seeds x 4
    frames, bit-exact."""
    a, code = dcode
    sigma = float(snr_to_sigma(4.0, 0.5))
    for seed in range(48):
        r = np.random.default_rng(10_000 + seed)
        y = np.ones((4, a.n)) * (1.0 + sigma * r.normal(size=(4, a.n)))
        yq = np.asarray(quantize_no_zero(jnp.asarray(y), 1.5, 8.0))
        res = decode_ddbmp(code, jnp.asarray(yq), num_iterations=20)
        hard = np.asarray(res.hard)
        iters = np.asarray(res.iterations)
        sats = np.asarray(res.satisfied)
        for f in range(4):
            ref = oracle.ddbmp_decode(a, yq[f], 20)
            np.testing.assert_array_equal(
                hard[f], ref["d"], err_msg=f"seed {seed} frame {f}"
            )
            assert iters[f] == ref["iterations"], (seed, f)
            assert bool(sats[f]) == ref["satisfied"], (seed, f)
