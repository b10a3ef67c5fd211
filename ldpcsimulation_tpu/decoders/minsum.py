"""Flooding min-sum decoder: plain, normalized, and offset variants.

Behavioral reference: ``C_implementations/src/decodeMinSum.cpp`` (one source
compiled three ways, ``Makefile:58-65``):

  * CN update (``:410-450``): per-check sign product and two smallest input
    magnitudes; the ``<=`` comparison means the *last* minimum in slot order
    claims the min-index (and therefore receives min2) — reproduced exactly
    by the sequential slot scan below.
  * ``applyNormalization`` (``:493-500``) **divides** by alpha;
    ``applyOffset`` (``:502-516``) subtracts delta and clamps at 0.
  * VN update (``:452-476``): total sum (channel sample + all incoming),
    output = total − self, decision ``d = sum > 0 ? +1 : −1``.  No message
    clamping in min-sum (only BP clamps, ``decodeBP.cpp:399-401``).
  * The reference min-sum always runs all T iterations (``:247-263`` — no
    syndrome test); ``early_termination=True`` is this framework's extension
    (and the configuration used for throughput benchmarks).
  * Min-sum operates directly on (optionally quantized/saturated) channel
    samples, *not* LLRs — min-sum is scale-invariant, and only BP rescales by
    4/N0 (``decodeBP.cpp:188``).

The decoder is a pure function of (code, samples, config); batch rides the
trailing axis (see :mod:`.base`).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..codes.code import Code
from .base import (
    DecodeResult,
    check_satisfied,
    gather_cn,
    gather_vn,
    run_flooding_soft,
    sgn_pos,
    storage_cast,
)

__all__ = ["minsum_cn_update", "minsum_step", "vn_update", "decode_minsum"]


def minsum_cn_update(code: Code, v2c_flat: jax.Array) -> jax.Array:
    """Check-node min-sum update, bit-matching decodeMinSum.cpp:410-450.

    v2c_flat: [N*dv_max, B] variable→check messages (VN-slot layout).
    Returns c2v_flat: [M*dc_max, B] (CN-slot layout); padding slots emit 0.
    """
    msgs = gather_cn(code, v2c_flat)  # [M, dc_max, B]
    dtype = msgs.dtype
    m, dc_max, b = msgs.shape
    inf = jnp.asarray(jnp.inf, dtype)

    min1 = jnp.full((m, b), inf, dtype)
    min2 = jnp.full((m, b), inf, dtype)
    minidx = jnp.full((m, b), -1, jnp.int32)
    sprod = jnp.ones((m, b), dtype)

    # Sequential slot scan (dc_max is small and static; unrolls fully).
    # `<=` lets later slots steal the min index — the reference's tie-break.
    for j in range(dc_max):
        msg = msgs[:, j, :]
        valid = code.cn_mask[:, j][:, None]
        a = jnp.abs(msg)
        sprod = jnp.where(valid, sprod * sgn_pos(msg), sprod)
        is_min = valid & (a <= min1)
        min2 = jnp.where(is_min, min1, jnp.where(valid & (a < min2), a, min2))
        minidx = jnp.where(is_min, j, minidx)
        min1 = jnp.where(is_min, a, min1)

    outs = []
    for j in range(dc_max):
        msg = msgs[:, j, :]
        mag = jnp.where(minidx == j, min2, min1)
        outs.append(sprod * mag * sgn_pos(msg))
    c2v = jnp.stack(outs, axis=1)  # [M, dc_max, B]
    c2v = jnp.where(code.cn_mask[:, :, None], c2v, jnp.zeros_like(c2v))
    return c2v.reshape(m * dc_max, b)


def vn_update(
    code: Code,
    y_t: jax.Array,
    c2v_flat: jax.Array,
    clamp: Optional[float] = None,
):
    """Variable-node total-sum update (decodeMinSum.cpp:452-476).

    y_t: [N, B] channel samples (decoder domain).  Returns
    (v2c_flat [N*dv_max, B], total [N, B], d [N, B] ±1).
    ``clamp`` bounds outgoing messages (used by BP, decodeBP.cpp:399-401).
    """
    msgs = gather_vn(code, c2v_flat)  # [N, dv_max, B]
    msgs = jnp.where(code.vn_mask[:, :, None], msgs, jnp.zeros_like(msgs))
    # Association is EXPLICIT and pinned: messages left-fold first, the
    # channel term is added last — y + ((m0+m1)+m2).  The reference
    # left-folds FROM y (decodeMinSum.cpp:456-463); the two groupings
    # differ by 1 ulp on non-representable inputs, which is statistically
    # invisible but matters for bit-exact oracle tests — tests/oracle.py
    # mirrors THIS grouping (the y-first grouping measured ~6.5% slower
    # on the flagship QC path; DD-BMP, whose memories accumulate the
    # drift against a C-exact oracle, keeps the reference grouping).
    acc = msgs[:, 0, :]
    for j in range(1, code.dv_max):
        acc = acc + msgs[:, j, :]
    total = y_t + acc
    v2c = total[:, None, :] - msgs
    if clamp is not None:
        v2c = jnp.clip(v2c, -clamp, clamp)
    d = jnp.where(total > 0, 1, -1).astype(jnp.int32)
    return v2c.reshape(code.n * code.dv_max, -1), total, d


def apply_normalization(c2v_flat: jax.Array, alpha: float) -> jax.Array:
    """check_to_sym /= alpha (decodeMinSum.cpp:493-500 — a division)."""
    return c2v_flat / alpha


def apply_offset(c2v_flat: jax.Array, delta: float) -> jax.Array:
    """|msg| -= delta, clamped at 0, sign kept (decodeMinSum.cpp:502-516)."""
    mag = jnp.abs(c2v_flat) - delta
    return jnp.where(mag > 0, sgn_pos(c2v_flat) * mag, jnp.zeros_like(c2v_flat))


def minsum_step(
    code: Code,
    variant: str = "plain",
    alpha: float = 1.0,
    delta: float = 0.0,
    storage_dtype=None,
):
    """The :func:`decode_minsum` iteration as a pure function of (messages,
    channel term): ``step(v2c, y_t) -> (v2c', total)`` with ``y_t`` the
    ``[N, B]`` channel samples.  Identical operations to the closure inside
    :func:`decode_minsum` — factored out for drivers that replace the
    channel term mid-decode (the streaming refill harness)."""

    def step(v2c, y_t):
        sdt = storage_dtype if storage_dtype is not None else y_t.dtype
        c2v = minsum_cn_update(code, v2c)
        if variant == "normalized":
            c2v = apply_normalization(c2v, alpha)
        elif variant == "offset":
            c2v = apply_offset(c2v, delta)
        v2c, total, _d = vn_update(code, y_t, c2v.astype(y_t.dtype))
        return storage_cast(v2c, sdt), total

    return step


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_iterations",
        "variant",
        "early_termination",
        "storage_dtype",
    ),
)
def decode_minsum(
    code: Code,
    y: jax.Array,
    num_iterations: int,
    variant: str = "plain",
    alpha: float = 1.0,
    delta: float = 0.0,
    early_termination: bool = False,
    storage_dtype=None,
) -> DecodeResult:
    """Batched flooding min-sum decode.

    y: [B, N] channel samples (pre-quantized/saturated by the caller for the
    Offset/Normalized fixed-point variants — the reference quantizes the
    channel, not the messages: ``decodeMinSum.cpp:218-238``).
    variant: "plain" | "normalized" | "offset".
    storage_dtype: optional narrower dtype (e.g. float16) for the message
    arrays — same semantics and measured BER behavior as
    :func:`..decoders.minsum_qc.decode_minsum_qc`'s flag (CN min/sign is
    exact on stored values; the only rounding is the v2c store after the
    f32 VN sum).  Halves the gather traffic, the generic path's
    bottleneck.
    """
    if variant not in ("plain", "normalized", "offset"):
        raise ValueError(f"unknown min-sum variant {variant!r}")
    y_t = jnp.asarray(y).T  # [N, B]
    b = y_t.shape[1]
    sdt = storage_dtype if storage_dtype is not None else y_t.dtype
    # initializeSymMessages: every VN slot starts at the channel sample
    # (decodeMinSum.cpp:364-370).
    v2c0 = jnp.repeat(y_t, code.dv_max, axis=0).astype(sdt)
    step_y = minsum_step(code, variant, alpha, delta, storage_dtype)

    d, iters, done = run_flooding_soft(
        y_t, v2c0, lambda v2c: step_y(v2c, y_t),
        lambda d: check_satisfied(code, d),
        num_iterations, early_termination, b,
    )
    return DecodeResult(hard=d.T, iterations=iters, satisfied=done)
