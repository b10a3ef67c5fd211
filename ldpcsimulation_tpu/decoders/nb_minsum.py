"""Non-binary min-sum (max-log QSPA) and min-max decoders over GF(2^m).

This realizes the intent of the reference's unfinished
``SystemC/NB-LDPC/min_max.py`` ("generalized min-max" skeleton with an
empty ``decode()``), using the standard log-domain simplifications of
QSPA (cf. the retrieved literature on GF(q) min-sum decoding):

Messages are normalized negative-log-likelihood vectors over GF(q)
(0 = most likely).  The check constraint Σ h_e·x_e = 0 becomes a
(min, op)-convolution over the XOR group:

    out[s] = min over configurations with ⊕ = s of  op(inputs)

with op = sum  -> NB min-sum (max-log QSPA),
     op = max  -> min-max (Savard/Declercq-style).

Both ops are associative over pairwise XOR-convolution, so the exclusion
uses exact prefix/suffix pairwise convolutions — O(dc·q²) per check instead
of the brute-force O(q^dc) (``NB-LDPC/inc/nodes.h:240-287``).  Per-edge GF
coefficients permute indices exactly as in :mod:`.nb_qspa`.

For q = 2 with op = sum this reduces to binary min-sum exactly (the
LLR-difference view), which the tests assert.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..codes.code import Code
from ..codes.gf import gf_tables
from .base import run_flooding
from .nb_qspa import NBDecodeResult

__all__ = ["decode_nb_minsum"]


def _pairwise_conv(a, b, op: str):
    """(min, op)-convolution over XOR along the last axis.

    a, b: [..., q] negative-log vectors.  out[k] = min_{i^j=k} op(a[i], b[j])
    = min_j op(a[k^j], b[j]).  Evaluated as q accumulation steps, each a
    static XOR permutation of ``a`` (O(q²) work; XOR by a constant is an
    involution, so the permutation is its own inverse).
    """
    q = a.shape[-1]
    out = None
    for j in range(q):
        perm = jnp.arange(q) ^ j  # static: a[k^j] for all k
        aj = a[..., perm]
        term = aj + b[..., j : j + 1] if op == "sum" else jnp.maximum(
            aj, b[..., j : j + 1]
        )
        out = term if out is None else jnp.minimum(out, term)
    return out


@functools.partial(
    jax.jit,
    static_argnames=("num_iterations", "variant", "early_termination", "q"),
)
def decode_nb_minsum(
    code: Code,
    priors: jax.Array,
    num_iterations: int,
    variant: str = "minsum",
    q: int = 0,
    early_termination: bool = True,
) -> NBDecodeResult:
    """Batched NB min-sum / min-max decode.

    priors: [B, N, q] channel symbol probabilities (converted to normalized
    negative-log internally).  variant: "minsum" | "minmax".
    """
    if variant not in ("minsum", "minmax"):
        raise ValueError(f"unknown variant {variant!r}")
    op = "sum" if variant == "minsum" else "max"
    q = q or code.q
    mul_np, inv_np = gf_tables(q)
    mul = jnp.asarray(mul_np)
    inv = jnp.asarray(inv_np)

    pri = jnp.moveaxis(jnp.asarray(priors), 0, -1)  # [N, q, B]
    n, qq, b = pri.shape
    assert qq == q and n == code.n
    dtype = pri.dtype
    eps = jnp.asarray(1e-30, dtype)
    nll = -jnp.log(pri + eps)
    nll = nll - jnp.min(nll, axis=1, keepdims=True)  # normalized NLL

    h_cn = code.cn_coef.reshape(-1)
    pre_idx = mul[inv[h_cn]]  # L_u[s] = L_x[h^-1 s]
    post_idx = mul[h_cn]
    cn_gather = code.cn_from_vn.reshape(-1)
    vn_gather = code.vn_from_cn.reshape(-1)
    cn_mask = code.cn_mask.reshape(-1)[:, None, None]
    vn_mask = code.vn_mask.reshape(-1)[:, None, None]
    # neutral for XOR-convolution: delta at 0 = NLL (0, inf, inf, ...)
    biginf = jnp.asarray(1e30, dtype)
    delta0 = jnp.full((q,), biginf, dtype).at[0].set(0.0)[None, :, None]

    def cn_update(v2c):
        g = jnp.take(v2c, cn_gather, axis=0)  # [M*dc_max, q, B]
        g = jnp.take_along_axis(g, pre_idx[:, :, None], axis=1)
        g = jnp.where(cn_mask, g, delta0)
        f = jnp.moveaxis(g, 1, -1).reshape(code.m, code.dc_max, b, q)
        neutral = jnp.broadcast_to(
            jnp.full((q,), biginf, dtype).at[0].set(0.0), (code.m, b, q)
        )
        pre = [neutral]
        for t in range(code.dc_max - 1):
            pre.append(_pairwise_conv(pre[-1], f[:, t], op))
        suf = [neutral]
        for t in range(code.dc_max - 1, 0, -1):
            suf.append(_pairwise_conv(suf[-1], f[:, t], op))
        suf.reverse()
        excl = jnp.stack(
            [_pairwise_conv(pre[t], suf[t], op) for t in range(code.dc_max)],
            axis=1,
        )  # [M, dc_max, B, q]
        s = jnp.moveaxis(
            excl.reshape(code.m * code.dc_max, b, q), -1, 1
        )  # [slots, q, B]
        out = jnp.take_along_axis(s, post_idx[:, :, None], axis=1)
        return out - jnp.min(out, axis=1, keepdims=True)

    def vn_update(c2v):
        g = jnp.take(c2v, vn_gather, axis=0)
        g = jnp.where(vn_mask, g, jnp.zeros_like(g))
        g = g.reshape(code.n, code.dv_max, q, b)
        zeros = jnp.zeros((code.n, q, b), dtype)
        pre = [zeros]
        for s2 in range(code.dv_max - 1):
            pre.append(pre[-1] + g[:, s2])
        suf = [zeros]
        for s2 in range(code.dv_max - 1, 0, -1):
            suf.append(suf[-1] + g[:, s2])
        suf.reverse()
        excl = jnp.stack(
            [nll + pre[s2] + suf[s2] for s2 in range(code.dv_max)], axis=1
        )
        excl = excl - jnp.min(excl, axis=2, keepdims=True)
        v2c = excl.reshape(code.n * code.dv_max, q, b)
        post = nll + jnp.sum(g, axis=1)
        return v2c, post

    def decide(post):
        return jnp.argmin(post, axis=1).astype(jnp.int32)

    def syndrome_ok(symbols):
        s = jnp.take(symbols, code.cn_vn.reshape(-1), axis=0)
        hs = jnp.take_along_axis(mul[h_cn], s, axis=1)
        hs = jnp.where(code.cn_mask.reshape(-1)[:, None], hs, 0)
        hs = hs.reshape(code.m, code.dc_max, b)
        acc = jnp.zeros((code.m, b), jnp.int32)
        for t in range(code.dc_max):
            acc = jnp.bitwise_xor(acc, hs[:, t])
        return jnp.all(acc == 0, axis=0)

    v2c0 = jnp.broadcast_to(
        nll[:, None], (code.n, code.dv_max, q, b)
    ).reshape(code.n * code.dv_max, q, b)

    def step(st):
        v2c, _sym = st
        v2c_new, post = vn_update(cn_update(v2c))
        return (v2c_new, decide(post))

    sym0 = decide(nll)
    sym, iters, done = run_flooding(
        (v2c0, sym0), step, lambda st: st[1], syndrome_ok,
        num_iterations, early_termination, b,
    )
    return NBDecodeResult(symbols=sym.T, iterations=iters, satisfied=done)
