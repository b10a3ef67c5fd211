"""DD-BMP: Differential Decoding with Binary Message Passing.

Behavioral reference: ``C_implementations/src/decodeDDBMP.cpp``:
  * Channel samples are always quantized with the no-zero-level quantizer
    (``:433-443``, Nq = 2^Q levels) — done by the caller/harness here.
  * Init (``:301-310``): every VN slot's accumulator memory starts at the
    channel sample; outgoing binary message = its sign.
  * CN update (``:350-372``): sign product excluding self (signs are ±1, so
    exclusion is multiplication by self).
  * VN update (``:395-422``): ``memory[v][s] += (total − c2v[s])`` where
    ``total = y[v] + Σ c2v``; outgoing message = sign(memory); decision =
    majority of ``sign(y[v]) + Σ outgoing`` (ties → −1).
  * Stopping (``:202-204, 375-393``): hard-decision syndrome checked *after*
    each update round; the reported iteration count is the loop index at
    break (0-based), or T if never satisfied — one less than the number of
    update rounds performed, matching ``totalIterations += it``.

The invariant ``outgoing = sgn(memory)`` lets the decoder carry only the
memory array; sgn uses the +1-at-zero convention (``:426-430``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..codes.code import Code
from .base import DecodeResult, check_satisfied, gather_cn, gather_vn, sgn_pos, vma_like

__all__ = ["decode_ddbmp"]


@functools.partial(jax.jit, static_argnames=("num_iterations",))
def decode_ddbmp(
    code: Code, yq: jax.Array, num_iterations: int
) -> DecodeResult:
    """Batched DD-BMP decode.  yq: [B, N] (quantized) channel samples."""
    y_t = jnp.asarray(yq).T  # [N, B]
    dtype = y_t.dtype
    n, b = y_t.shape
    mem0 = jnp.repeat(y_t, code.dv_max, axis=0)  # [N*dv_max, B]
    d0 = jnp.where(y_t > 0, 1, -1).astype(jnp.int32)
    sign_y = sgn_pos(y_t)

    def one_round(mem):
        s2c = sgn_pos(mem)  # ±1 binary messages
        # CN: product over row signs, exclusion by self-multiplication.
        # Sequential product + per-slot emission: values are ±1 so any
        # order is exact, and the reduce-broadcast form (jnp.prod keepdims
        # * g) crashes this TPU toolchain's compiler when composed with the
        # downstream gather.
        g = gather_cn(code, s2c)  # [M, dc_max, B]
        g = jnp.where(code.cn_mask[:, :, None], g, jnp.ones_like(g))
        prod = g[:, 0, :]
        for t in range(1, code.dc_max):
            prod = prod * g[:, t, :]
        c2v = jnp.stack(
            [prod * g[:, t, :] for t in range(code.dc_max)], axis=1
        ).reshape(code.m * code.dc_max, b)
        # VN
        gv = gather_vn(code, c2v)  # [N, dv_max, B]
        gv = jnp.where(code.vn_mask[:, :, None], gv, jnp.zeros_like(gv))
        total = y_t + jnp.sum(gv, axis=1)  # [N, B]
        mem_new = (mem.reshape(n, code.dv_max, b) + total[:, None, :] - gv)
        mem_new = mem_new.reshape(n * code.dv_max, b)
        out_signs = sgn_pos(mem_new).reshape(n, code.dv_max, b)
        out_signs = jnp.where(
            code.vn_mask[:, :, None], out_signs, jnp.zeros_like(out_signs)
        )
        dsum = sign_y + jnp.sum(out_signs, axis=1)
        d = jnp.where(dsum > 0, 1, -1).astype(jnp.int32)
        return mem_new, d

    init = (
        jnp.int32(0),
        mem0,
        d0,
        vma_like(jnp.full((b,), num_iterations, jnp.int32), d0),
        vma_like(jnp.zeros((b,), bool), d0),
    )

    def cond(carry):
        t, _mem, _d, _iters, done = carry
        return (t < num_iterations) & ~jnp.all(done)

    def body(carry):
        t, mem, d, iters, done = carry
        mem_new, d_new = one_round(mem)
        act = ~done
        mem = jnp.where(act[None, :], mem_new, mem)
        d = jnp.where(act[None, :], d_new, d)
        sat = check_satisfied(code, d)
        newly = act & sat
        iters = jnp.where(newly, t, iters)  # break index, it = t
        done = done | sat
        return (t + 1, mem, d, iters, done)

    _t, _mem, d, iters, done = jax.lax.while_loop(cond, body, init)
    return DecodeResult(hard=d.T, iterations=iters, satisfied=done)
