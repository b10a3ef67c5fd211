"""SystemC-semantics NGDBF decoder vs the ragged oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpcsimulation_tpu.channel import snr_to_sigma
from ldpcsimulation_tpu.codes import build_code, make_regular_code, peg
from ldpcsimulation_tpu.decoders.ngdbf_systemc import (
    SystemCNGDBFConfig,
    decode_ngdbf_systemc,
)
from tests import oracle


@pytest.fixture(scope="module")
def scode():
    a = peg(48, 24, 3, seed=13)
    return a, build_code(a)


@pytest.mark.parametrize("smoothed", [True, False])
def test_systemc_matches_oracle(scode, rng, smoothed):
    a, code = scode
    b = 4
    cfg = SystemCNGDBFConfig(
        num_iterations=40, theta=-0.5, lam=0.975, alpha=0.95,
        ymax=3.0, nq_levels=16, smoothed=smoothed,
    )
    sigma = float(snr_to_sigma(3.5, 0.5))
    # additive channel form (LDPC_testbench.h:144-149)
    y = 1.0 + sigma * rng.normal(size=(b, a.n))
    stream = sigma * rng.normal(size=(a.n + cfg.num_iterations, b))
    res = decode_ngdbf_systemc(
        code, jnp.asarray(y), sigma, cfg,
        key=jax.random.key(0), noise_stream=jnp.asarray(stream),
    )
    hard = np.asarray(res.hard)
    iters = np.asarray(res.iterations)
    sats = np.asarray(res.satisfied)
    for f in range(b):
        ref = oracle.ngdbf_systemc_decode(
            a, y[f], stream[:, f], cfg.num_iterations, cfg.theta,
            cfg.lam, cfg.alpha, cfg.ymax, cfg.nq_levels, smoothed=smoothed,
        )
        np.testing.assert_array_equal(hard[f], ref["d"], err_msg=f"frame {f}")
        assert iters[f] == ref["iterations"], f"frame {f}"
        if not ref["satisfied"]:
            # JAX side may report satisfied if the smoothed output passes
            assert iters[f] == cfg.num_iterations
        else:
            assert bool(sats[f])


def test_systemc_per_node_weight(scode):
    """w_i = alpha*Ymax/dv_i differs per node on irregular codes."""
    _a, code = scode
    cfg = SystemCNGDBFConfig(num_iterations=5, theta=-0.5)
    # all nodes dv=3 here; just validate the decode runs and uses dv
    y = jnp.ones((2, code.n)) * 1.2
    res = decode_ngdbf_systemc(code, y, 0.4, cfg, key=jax.random.key(1))
    assert (np.asarray(res.hard) == 1).all()
    assert np.asarray(res.iterations).tolist() == [0, 0]


def test_systemc_end_to_end():
    code = make_regular_code(96, 48, 3, seed=0)
    cfg = SystemCNGDBFConfig(
        num_iterations=120, theta=-0.5, lam=0.975, alpha=0.95,
        ymax=3.0, nq_levels=16,
    )
    sigma = float(snr_to_sigma(4.5, 0.5))
    key = jax.random.key(5)
    y = 1.0 + sigma * jax.random.normal(jax.random.key(6), (64, code.n))
    res = decode_ngdbf_systemc(code, y, sigma, cfg, key=key)
    ok = (np.asarray(res.hard) == 1).all(axis=1)
    assert ok.mean() > 0.7
