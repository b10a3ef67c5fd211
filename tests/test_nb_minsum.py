"""NB min-sum / min-max decoder tests."""

import itertools

import jax.numpy as jnp
import numpy as np
import pytest

from ldpcsimulation_tpu.channel import snr_to_n0
from ldpcsimulation_tpu.channel.nb import symbol_priors
from ldpcsimulation_tpu.codes import build_code, peg
from ldpcsimulation_tpu.codes.construct import nb_regular
from ldpcsimulation_tpu.codes.gf import gf_mul, gf_tables
from ldpcsimulation_tpu.decoders.minsum import decode_minsum
from ldpcsimulation_tpu.decoders.nb_minsum import decode_nb_minsum


def test_gf2_nb_minsum_matches_binary_minsum(rng):
    """Over GF(2), NB min-sum is binary min-sum: decisions coincide."""
    a = peg(48, 24, 3, seed=5)
    code = build_code(a)
    n0 = float(snr_to_n0(2.5, 0.5))
    sigma = float(np.sqrt(n0 / 2))
    b = 8
    y = np.ones((b, 48)) * (1 + sigma * rng.normal(size=(b, 48)))
    pri = symbol_priors(jnp.asarray(y)[..., None], n0, 2)
    res_nb = decode_nb_minsum(
        code, pri, num_iterations=6, q=2, early_termination=False
    )
    # binary min-sum on the bit LLRs (scale-invariant, so 4y/n0 vs y same)
    res_b = decode_minsum(code, jnp.asarray(4 * y / n0), 6)
    nb_bipolar = 1 - 2 * np.asarray(res_nb.symbols)
    # knife-edge ties between the two formulations are possible but should
    # be absent for generic noise; require exact agreement
    np.testing.assert_array_equal(nb_bipolar, np.asarray(res_b.hard))


def brute_force_cn_nll(h_coefs, in_nll, op):
    """Exhaustive (min, op)-convolution check-node (single check)."""
    q = in_nll[0].shape[0]
    dc = len(h_coefs)
    mul, inv = gf_tables(q)
    outs = []
    for e in range(dc):
        out = np.full(q, np.inf)
        others = [j for j in range(dc) if j != e]
        for combo in itertools.product(range(q), repeat=dc - 1):
            vals = [in_nll[j][xj] for j, xj in zip(others, combo)]
            cost = sum(vals) if op == "sum" else max(vals)
            s = 0
            for j, xj in zip(others, combo):
                s ^= int(gf_mul(q, h_coefs[j], xj))
            xe = mul[inv[h_coefs[e]], s]
            out[xe] = min(out[xe], cost)
        outs.append(out - out.min())
    return outs


@pytest.mark.parametrize("variant", ["minsum", "minmax"])
def test_nb_minsum_cn_matches_brute_force(rng, variant):
    from ldpcsimulation_tpu.codes.alist import Alist

    q = 4
    h_coefs = [1, 2, 3]
    a = Alist(
        n=3, m=1, nlist=[[0], [0], [0]], mlist=[[0, 1, 2]],
        q=q, nvals=[[1], [2], [3]], mvals=[[1, 2, 3]],
    )
    code = build_code(a)
    probs = [rng.dirichlet(np.ones(q) * 2) for _ in range(3)]
    nll = [-np.log(p) for p in probs]
    nll = [v - v.min() for v in nll]
    op = "sum" if variant == "minsum" else "max"
    outs = brute_force_cn_nll(h_coefs, nll, op)
    # posterior (NLL) = prior + incoming; decision = argmin
    expect = [int(np.argmin(nll[e] + outs[e])) for e in range(3)]
    pri = jnp.asarray(np.stack(probs)[None])
    res = decode_nb_minsum(
        code, pri, num_iterations=1, variant=variant, early_termination=False
    )
    np.testing.assert_array_equal(np.asarray(res.symbols)[0], expect)


@pytest.mark.parametrize("variant", ["minsum", "minmax"])
def test_nb_minsum_end_to_end_gf8(rng, variant):
    q = 8
    a = nb_regular(36, 18, 3, q=q, seed=4)
    code = build_code(a)
    n0 = float(snr_to_n0(5.0, 0.5))
    sigma = float(np.sqrt(n0 / 2))
    b = 16
    y = 1.0 + sigma * rng.normal(size=(b, 36, 3))
    pri = symbol_priors(jnp.asarray(y, jnp.float32), n0, q)
    res = decode_nb_minsum(code, pri, num_iterations=25, variant=variant)
    syms = np.asarray(res.symbols)
    assert (syms == 0).all(axis=1).mean() > 0.7, variant
