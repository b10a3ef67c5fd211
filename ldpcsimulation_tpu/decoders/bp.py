"""Flooding sum-product belief propagation (LLR domain).

Behavioral reference: ``C_implementations/src/decodeBP.cpp``:
  * CN update (``:353-377``): true extrinsic exclusion — for each output
    edge, the product of ``tanh(m/2)`` over the *other* edges, then
    ``log((1+p)/(1-p))``.  (The reference recomputes the product per output
    edge, O(dc²); here exclusion uses prefix/suffix accumulation, O(dc),
    which is the same arithmetic reassociated.)
  * VN update (``:379-409``): total sum; outgoing = total − self clamped to
    ±MAXLLR = ±20 (``:58``); decision ``sum > 0``.
  * Inputs are LLRs ``4y/N0`` clamped to ±MAXLLR (``:188-191``).
  * No early termination in the reference (``:206-213`` runs all T
    iterations); ``early_termination=True`` is the framework extension used
    by the BASELINE "BP with early syndrome termination" configuration.

Numerics: the tanh-product is evaluated in the log-magnitude ("phi")
domain — ``|out| = phi(Σ_{k≠j} phi(|m_k|))`` with
``phi(x) = -log(tanh(x/2)) = log1p(2/expm1(x))`` — which is algebraically
identical but float32-safe: tanh(10) rounds to 1.0 in float32 and the
literal form returns ±inf, while phi keeps magnitudes ~2e-9 representable.
A zero input message (phi = +inf) correctly forces all other outputs of the
check to 0 and drops out of its own exclusion sum.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..codes.code import Code
from .base import (
    DecodeResult,
    check_satisfied,
    gather_cn,
    run_flooding_soft,
    sgn_pos,
)
from .minsum import vn_update

__all__ = ["bp_cn_update", "decode_bp", "MAXLLR"]

MAXLLR = 20.0  # decodeBP.cpp:58


def _phi(x):
    """phi(x) = -log(tanh(x/2)), stable for x in [~1e-30, ~1e30]."""
    # log1p(2/expm1(x)); expm1(0) = 0 -> inf which is the correct limit.
    return jnp.log1p(2.0 / jnp.expm1(x))


def bp_cn_update(code: Code, v2c_flat: jax.Array) -> jax.Array:
    """Sum-product CN update with exact extrinsic exclusion.

    v2c_flat: [N*dv_max, B] -> c2v_flat [M*dc_max, B].
    """
    msgs = gather_cn(code, v2c_flat)  # [M, dc_max, B]
    dtype = msgs.dtype
    m, dc_max, b = msgs.shape
    mask = code.cn_mask[:, :, None]

    mag = _phi(jnp.abs(msgs))  # [M, dc_max, B]; phi(0)=inf handled above
    sign = sgn_pos(msgs)
    # Neutral elements for padding: magnitude 0 (phi-sum), sign +1.
    mag = jnp.where(mask, mag, jnp.zeros_like(mag))
    sign = jnp.where(mask, sign, jnp.ones_like(sign))

    # Exclusive prefix/suffix over the slot axis (static, unrolled).
    zeros = jnp.zeros((m, b), dtype)
    ones = jnp.ones((m, b), dtype)
    pre_m, pre_s = [zeros], [ones]
    for j in range(dc_max - 1):
        pre_m.append(pre_m[-1] + mag[:, j, :])
        pre_s.append(pre_s[-1] * sign[:, j, :])
    suf_m, suf_s = [zeros], [ones]
    for j in range(dc_max - 1, 0, -1):
        suf_m.append(suf_m[-1] + mag[:, j, :])
        suf_s.append(suf_s[-1] * sign[:, j, :])
    suf_m.reverse()
    suf_s.reverse()

    outs = []
    for j in range(dc_max):
        excl_mag = pre_m[j] + suf_m[j]
        excl_sign = pre_s[j] * suf_s[j]
        outs.append(excl_sign * _phi(excl_mag))
    c2v = jnp.stack(outs, axis=1)
    c2v = jnp.where(mask, c2v, jnp.zeros_like(c2v))
    return c2v.reshape(m * dc_max, b)


@functools.partial(
    jax.jit, static_argnames=("num_iterations", "early_termination")
)
def decode_bp(
    code: Code,
    llr: jax.Array,
    num_iterations: int,
    max_llr: float = MAXLLR,
    early_termination: bool = False,
) -> DecodeResult:
    """Batched flooding sum-product decode.  llr: [B, N] channel LLRs."""
    # Input clamp (decodeBP.cpp:188-191): without it, |llr| ≳ 89 makes
    # phi(|m|) underflow to exactly 0 in f32, a later phi(0)=inf appears in
    # the exclusion sums, and total − self produces inf − inf = NaN.
    llr_t = jnp.clip(jnp.asarray(llr).T, -max_llr, max_llr)  # [N, B]
    b = llr_t.shape[1]
    v2c0 = jnp.repeat(llr_t, code.dv_max, axis=0)

    def step(v2c):
        c2v = bp_cn_update(code, v2c)
        v2c, total, _d = vn_update(code, llr_t, c2v, clamp=max_llr)
        return v2c, total

    d, iters, done = run_flooding_soft(
        llr_t, v2c0, step,
        lambda d: check_satisfied(code, d),
        num_iterations, early_termination, b,
    )
    return DecodeResult(hard=d.T, iterations=iters, satisfied=done)
