"""Fixed-point NGDBFhw decoder vs the ragged oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpcsimulation_tpu.channel import snr_to_sigma
from ldpcsimulation_tpu.codes import build_code, make_regular_code, peg
from ldpcsimulation_tpu.decoders.ngdbf_hw import (
    NGDBFHwConfig,
    decode_ngdbf_hw,
    hw_quantize_int,
)
from tests import oracle


@pytest.fixture(scope="module")
def hcode():
    # high-rate-ish small code to echo the 802.3an regime
    a = peg(64, 16, 2, seed=31)
    return a, build_code(a)


def test_config_integers():
    cfg = NGDBFHwConfig()  # 802.3an defaults, NGDBFhw.cpp:48-57
    assert cfg.nl == 31
    assert cfg.lmax == pytest.approx(1.625 / 0.37)
    # quantize(2) = floor(2*31/(2*lmax)) = floor(7.058) = 7 -> theta = 15
    assert cfg.theta_int == 15
    # Smult = round(31/4.3919) = 7
    assert cfg.smult == 7


def test_hw_quantize_int_matches_packing():
    # unpack(pack(m, s)) = ±(2m+1); sgn(0) = -1
    lmax, nl = 4.0, 31
    xs = jnp.array([0.0, 0.1, 1.0, -1.0, 3.99, -3.99])
    out = np.asarray(hw_quantize_int(xs, nl, lmax))
    def ref(x):
        import math
        mag = math.floor(abs(x) * nl / (2 * lmax))
        return (1 if x > 0 else -1) * (2 * mag + 1)
    assert out.tolist() == [ref(float(x)) for x in np.asarray(xs)]
    assert out[0] == -1  # zero maps to -1


@pytest.mark.parametrize("max_phases", [1, 3])
def test_ngdbf_hw_matches_oracle(hcode, rng, max_phases):
    a, code = hcode
    b = 4
    cfg = NGDBFHwConfig(
        num_iterations=30,
        w=0.25,
        ymax=1.5,
        noise_scale=0.9,
        theta0=-0.5,
        nq=5,
        max_phases=max_phases,
        ring_len=200,
    )
    sigma = float(snr_to_sigma(4.0, 0.75))
    y = np.ones((b, a.n)) * (1.0 + sigma * rng.normal(size=(b, a.n)))
    ring = rng.normal(0.0, sigma * cfg.noise_scale, size=(cfg.ring_len, b))
    res = decode_ngdbf_hw(
        code,
        jnp.asarray(y),
        sigma,
        cfg,
        key=jax.random.key(0),
        ring_noise=jnp.asarray(ring),
    )
    hard = np.asarray(res.hard)
    iters = np.asarray(res.iterations)
    lerrs = np.asarray(res.least_errors)
    sats = np.asarray(res.satisfied)
    for f in range(b):
        ref = oracle.ngdbf_hw_decode(
            a,
            y[f],
            sigma,
            ring[:, f],
            T=cfg.num_iterations,
            w=cfg.w,
            ymax=cfg.ymax,
            theta0=cfg.theta0,
            nq=cfg.nq,
            max_phases=max_phases,
        )
        np.testing.assert_array_equal(
            hard[f], [1 - 2 * bb for bb in ref["d"]], err_msg=f"frame {f}"
        )
        assert iters[f] == ref["iterations"], f"frame {f}"
        assert lerrs[f] == ref["least_errors"], f"frame {f}"
        assert bool(sats[f]) == ref["satisfied"], f"frame {f}"


def test_ngdbf_hw_end_to_end():
    """Statistical: clean-ish channel, most frames decode."""
    code = make_regular_code(96, 48, 3, seed=0)
    cfg = NGDBFHwConfig(
        num_iterations=100, w=0.2, ymax=2.0, noise_scale=0.8,
        theta0=-0.6, nq=5, ring_len=512,
    )
    sigma = float(snr_to_sigma(6.0, 0.5))
    key = jax.random.key(3)
    y = jnp.ones((64, code.n)) * (
        1.0 + sigma * jax.random.normal(jax.random.key(4), (64, code.n))
    )
    res = decode_ngdbf_hw(code, y, sigma, cfg, key=key)
    assert np.asarray(res.least_errors).mean() < 3
    assert np.asarray(res.satisfied).mean() > 0.5


def test_ngdbfhw_qc_ops_bit_exact():
    """QC roll graph ops == generic gather ops, full decode outputs, on a
    plain QC code and a generalized (multi-edge + defect) structure."""
    import jax
    import jax.numpy as jnp

    from ldpcsimulation_tpu.codes import build_code
    from ldpcsimulation_tpu.codes.qc import build_qc_code_edges, qc_peg
    from ldpcsimulation_tpu.decoders.ngdbf_hw import (
        NGDBFHwConfig,
        decode_ngdbf_hw,
    )

    rng = np.random.default_rng(13)
    cfg = NGDBFHwConfig(num_iterations=30, ring_len=400)
    for qc in (
        qc_peg(12, 6, 3, z=8, seed=3),
        build_qc_code_edges(
            [(0, 0, 1), (0, 0, 3), (0, 1, 0), (0, 2, 2),
             (1, 0, 2), (1, 1, 2), (1, 2, 4)],
            5, 2, 3, minus_edges=((1, 2, 4, 1),),
        ),
    ):
        code = build_code(qc.to_alist())
        y = jnp.asarray(
            rng.normal(1.0, 0.7, size=(32, qc.n)).astype(np.float32)
        )
        key = jax.random.key(4)
        a = decode_ngdbf_hw(code, y, 0.7, cfg, key=key, qc=qc)
        b = decode_ngdbf_hw(code, y, 0.7, cfg, key=key)
        np.testing.assert_array_equal(np.asarray(a.hard), np.asarray(b.hard))
        np.testing.assert_array_equal(
            np.asarray(a.iterations), np.asarray(b.iterations)
        )
        np.testing.assert_array_equal(
            np.asarray(a.least_errors), np.asarray(b.least_errors)
        )


def test_ngdbf_hw_persistent_qpointer_chain(hcode, rng):
    """Cross-frame ring-pointer persistence (NGDBFhw.cpp:153, 356-358):
    the decoder returns its final per-lane qpointer; chaining it as the
    next frame's qpointer0 matches a serial oracle run that carries the
    pointer the same way — and the chained second frame genuinely differs
    from an unchained one (persistence is observable)."""
    a, code = hcode
    b = 3
    cfg = NGDBFHwConfig(
        num_iterations=25, w=0.25, ymax=1.5, noise_scale=0.9,
        theta0=-0.5, nq=5, ring_len=150,
    )
    sigma = float(snr_to_sigma(3.0, 0.75))
    qp = np.zeros(b, int)
    qp_jax = jnp.zeros((b,), jnp.int32)
    diverged = False
    for frame in range(3):
        y = np.ones((b, a.n)) * (1.0 + sigma * rng.normal(size=(b, a.n)))
        ring = rng.normal(
            0.0, sigma * cfg.noise_scale, size=(cfg.ring_len, b)
        )
        res = decode_ngdbf_hw(
            code, jnp.asarray(y), sigma, cfg, key=jax.random.key(0),
            ring_noise=jnp.asarray(ring), qpointer0=qp_jax,
        )
        res_un = decode_ngdbf_hw(
            code, jnp.asarray(y), sigma, cfg, key=jax.random.key(0),
            ring_noise=jnp.asarray(ring),
        )
        for f in range(b):
            ref = oracle.ngdbf_hw_decode(
                a, y[f], sigma, ring[:, f], T=cfg.num_iterations,
                w=cfg.w, ymax=cfg.ymax, theta0=cfg.theta0, nq=cfg.nq,
                qpointer0=int(qp[f]),
            )
            np.testing.assert_array_equal(
                np.asarray(res.hard)[f],
                [1 - 2 * bb for bb in ref["d"]],
                err_msg=f"frame {frame} lane {f}",
            )
            assert int(np.asarray(res.iterations)[f]) == ref["iterations"]
            assert (
                int(np.asarray(res.qpointer)[f]) == ref["final_qpointer"]
            ), f"frame {frame} lane {f}"
            qp[f] = ref["final_qpointer"]
        if frame > 0 and np.any(
            np.asarray(res.hard) != np.asarray(res_un.hard)
        ):
            diverged = True
        qp_jax = res.qpointer
    assert np.any(qp != 0)
    assert diverged, "chained decode never differed from unchained"
