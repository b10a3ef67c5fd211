"""Shared decoder machinery: layouts, sign conventions, syndrome checks.

Layout convention
-----------------
All decoders are *batched over frames with the batch on the last axis*:
channel samples enter as ``[B, N]`` (user-facing) and are transposed to
``[N, B]`` internally, so that every Tanner-graph gather moves contiguous
TPU lane vectors (B rides the 128-wide lane dimension).  Messages live in
flat padded slot arrays:

  * v2c (variable→check) : ``[N * dv_max, B]`` in VN-slot order
  * c2v (check→variable) : ``[M * dc_max, B]`` in CN-slot order

and move between layouts with one static gather (``Code.cn_from_vn`` /
``Code.vn_from_cn``) instead of the reference's per-message linear ``find()``
(``C_implementations/src/decodeMinSum.cpp:527-536``).

Sign conventions (a documented bit-exactness trap, SURVEY §7):
  * BP / min-sum / DDBMP: ``sgn(0) = +1`` (``decodeBP.cpp:412-417``)
  * GDBF family / NGDBFhw: ``sgn(0) = -1`` (``decodeGDBF.cpp:495-501``)
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..codes.code import Code

__all__ = [
    "DecodeResult",
    "sgn_pos",
    "sgn_neg",
    "gather_cn",
    "gather_vn",
    "syndrome_from_hard",
    "check_satisfied",
]


@dataclasses.dataclass
class DecodeResult:
    """Outcome of a batched decode.  A JAX pytree.

    hard:       [B, N] int32, bipolar ±1 decisions (reference's ``d``).
    iterations: [B] int32 — for early-terminating decoders, the loop index at
                which the frame's syndrome first checked out (the reference's
                ``it`` at ``break``); for fixed-trip decoders, T.
    satisfied:  [B] bool — all parity checks satisfied at exit.
    """

    hard: jax.Array
    iterations: jax.Array
    satisfied: jax.Array


jax.tree_util.register_dataclass(
    DecodeResult, data_fields=["hard", "iterations", "satisfied"], meta_fields=[]
)


def sgn_pos(x):
    """sgn(0) = +1 convention (BP/min-sum/DDBMP)."""
    return jnp.where(x >= 0, 1.0, -1.0).astype(x.dtype)


def sgn_neg(x):
    """sgn(0) = -1 convention (GDBF family)."""
    return jnp.where(x > 0, 1.0, -1.0).astype(x.dtype)


def gather_cn(code: Code, v2c_flat: jax.Array) -> jax.Array:
    """[N*dv_max, B] v2c -> [M, dc_max, B] per-check incoming messages."""
    g = jnp.take(v2c_flat, code.cn_from_vn.reshape(-1), axis=0)
    return g.reshape(code.m, code.dc_max, -1)


def gather_vn(code: Code, c2v_flat: jax.Array) -> jax.Array:
    """[M*dc_max, B] c2v -> [N, dv_max, B] per-variable incoming messages."""
    g = jnp.take(c2v_flat, code.vn_from_cn.reshape(-1), axis=0)
    return g.reshape(code.n, code.dv_max, -1)


def syndrome_from_hard(code: Code, d: jax.Array) -> jax.Array:
    """Bipolar syndrome per check from hard decisions.

    d: [N, B] ±1.  Returns [M, B] with +1 = satisfied, -1 = unsatisfied
    (the reference's bipolar product, ``decodeGDBF.cpp:517-534``).
    Padding slots contribute +1.
    """
    vals = jnp.take(d, code.cn_vn.reshape(-1), axis=0).reshape(
        code.m, code.dc_max, -1
    )
    vals = jnp.where(code.cn_mask[:, :, None], vals, jnp.ones_like(vals))
    return jnp.prod(vals, axis=1)


def check_satisfied(code: Code, d: jax.Array) -> jax.Array:
    """[B] bool: all parity checks satisfied for each frame."""
    return jnp.all(syndrome_from_hard(code, d) > 0, axis=0)
