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

Numerics: the tanh-product is evaluated in the **hyperbolic-pair domain**.
With ``u_j = exp(-|m_j|)`` each edge contributes
``tanh(|m_j|/2) = (1-u_j)/(1-(-u_j))``; tracking the pair
``(s, d) = (Π(1+u_j) + Π(1-u_j), Π(1+u_j) − Π(1-u_j)) / 2``
under the combine rule ``(s,d)·(s',d') = (ss'+dd', sd'+ds')`` (all terms
positive — no cancellation) gives the exact product magnitude as
``|out| = log(s/d)``.  This is algebraically identical to the classical
phi-domain form ``phi(Σ phi(|m|))`` with ``phi(x) = -log(tanh(x/2))`` but
costs ONE transcendental per input edge (exp) and ONE per output edge
(log) instead of two phi chains (expm1+div+log1p each) — about half the
VPU work of the phi form, which dominated BP's iteration time on v5e
(docs/DESIGN.md).  Stability envelope is the same as phi: with messages
clamped to ±MAXLLR, ``u ∈ [e^-20, 1]`` and every pair term stays normal in
float32; a zero input message (u = 1) forces the other outputs of the
check to exactly 0 and drops out of its own exclusion.
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
    storage_cast,
)
from .minsum import vn_update

__all__ = ["bp_cn_update", "decode_bp", "MAXLLR"]

MAXLLR = 20.0  # decodeBP.cpp:58


def _phi(x):
    """phi(x) = -log(tanh(x/2)), stable for x in [~1e-30, ~1e30].

    Kept as the documentation/oracle form of the CN magnitude map; the
    decoders use the hyperbolic-pair evaluation below (same values, half
    the transcendentals)."""
    # log1p(2/expm1(x)); expm1(0) = 0 -> inf which is the correct limit.
    return jnp.log1p(2.0 / jnp.expm1(x))


def pair_excl_logmags(us):
    """Exclusive prefix/suffix tanh-product magnitudes from ``u = e^-|m|``.

    us: list of per-edge u arrays (common shape).  Returns the list of
    ``|out|_t = log((1+P_t)/(1-P_t))`` where ``P_t = Π_{k≠t} tanh(|m_k|/2)``,
    evaluated in the cancellation-free (s, d) pair domain (module
    docstring).  The neutral element is (1, 0) — an absent edge must
    present u = 0 (i.e. message +inf), which leaves the fold bit-exactly
    untouched (``s + d·0 == s``).
    """
    k = len(us)
    one = jnp.ones_like(us[0])
    zero = jnp.zeros_like(us[0])
    pre = [(one, zero)]
    for t in range(k - 1):
        s, d = pre[-1]
        u = us[t]
        pre.append((s + d * u, d + s * u))
    suf = [(one, zero)]
    for t in range(k - 1, 0, -1):
        s, d = suf[-1]
        u = us[t]
        suf.append((s + d * u, d + s * u))
    suf.reverse()
    outs = []
    for t in range(k):
        sp, dp = pre[t]
        ss, ds = suf[t]
        outs.append(jnp.log((sp * ss + dp * ds) / (sp * ds + dp * ss)))
    return outs


def bp_cn_update(code: Code, v2c_flat: jax.Array) -> jax.Array:
    """Sum-product CN update with exact extrinsic exclusion.

    v2c_flat: [N*dv_max, B] -> c2v_flat [M*dc_max, B].  Arithmetic runs in
    (at least) float32 regardless of the message storage dtype.
    """
    msgs = gather_cn(code, v2c_flat)  # [M, dc_max, B]
    cdt = jnp.promote_types(msgs.dtype, jnp.float32)
    m, dc_max, b = msgs.shape
    mask = code.cn_mask[:, :, None]

    msgs_c = msgs.astype(cdt)
    u = jnp.exp(-jnp.abs(msgs_c))  # [M, dc_max, B]
    sign = sgn_pos(msgs_c)
    # Neutral elements for padding: u = 0 (pair fold), sign +1.
    u = jnp.where(mask, u, jnp.zeros_like(u))
    sign = jnp.where(mask, sign, jnp.ones_like(sign))

    mags = pair_excl_logmags([u[:, j, :] for j in range(dc_max)])
    # Exclusive sign prefix/suffix (static, unrolled).
    ones = jnp.ones((m, b), cdt)
    pre_s = [ones]
    for j in range(dc_max - 1):
        pre_s.append(pre_s[-1] * sign[:, j, :])
    suf_s = [ones]
    for j in range(dc_max - 1, 0, -1):
        suf_s.append(suf_s[-1] * sign[:, j, :])
    suf_s.reverse()

    outs = [pre_s[j] * suf_s[j] * mags[j] for j in range(dc_max)]
    c2v = jnp.stack(outs, axis=1)
    c2v = jnp.where(mask, c2v, jnp.zeros_like(c2v))
    return c2v.reshape(m * dc_max, b)


@functools.partial(
    jax.jit,
    static_argnames=("num_iterations", "early_termination", "storage_dtype"),
)
def decode_bp(
    code: Code,
    llr: jax.Array,
    num_iterations: int,
    max_llr: float = MAXLLR,
    early_termination: bool = False,
    storage_dtype=None,
) -> DecodeResult:
    """Batched flooding sum-product decode.  llr: [B, N] channel LLRs.

    storage_dtype: optional narrower dtype (e.g. float16) for the v2c
    message array; CN/VN arithmetic stays float32.  Messages are clamped
    to ±MAXLLR, so the only loss is the f16 rounding of the stored
    extrinsics (~1e-2 absolute at |m|≈20) — measured BER-neutral at the
    2 dB operating point (docs/PERF.md).
    """
    # Input clamp (decodeBP.cpp:188-191): without it, |llr| ≳ 89 makes
    # u = e^-|m| underflow to exactly 0 in f32, a later log(s/0) = inf
    # appears in the exclusion, and total − self produces inf − inf = NaN.
    llr_t = jnp.clip(jnp.asarray(llr).T, -max_llr, max_llr)  # [N, B]
    b = llr_t.shape[1]
    sdt = storage_dtype if storage_dtype is not None else llr_t.dtype
    v2c0 = jnp.repeat(llr_t, code.dv_max, axis=0).astype(sdt)

    def step(v2c):
        c2v = bp_cn_update(code, v2c)
        v2c, total, _d = vn_update(code, llr_t, c2v, clamp=max_llr)
        return storage_cast(v2c, sdt), total

    d, iters, done = run_flooding_soft(
        llr_t, v2c0, step,
        lambda d: check_satisfied(code, d),
        num_iterations, early_termination, b,
    )
    return DecodeResult(hard=d.T, iterations=iters, satisfied=done)
