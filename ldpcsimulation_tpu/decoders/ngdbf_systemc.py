"""SystemC NGDBF hardware-model semantics as a batched decoder.

The reference's ``SystemC/NGDBF`` tree is a cycle-accurate event-driven
model (one decoding iteration per clock, one ``sc_signal`` per Tanner edge).
Per SURVEY §2.6 / BASELINE, the cycle machinery itself is replaced by
iteration-count statistics; what this module preserves is the *algorithmic*
content that differs from the C ``decodeGDBF`` family:

  * Channel: additive AWGN ``y = x + σ·n`` (``LDPC_testbench.h:144-149``)
    and threshold-table quantization of the received samples
    (``decoder.h:219`` via ``ldpcsim.h:85-118``).
  * Per-node syndrome weight ``w_i = α·Ymax/dv_i`` (``nodes.h:56``) — the C
    family uses a global ``w = α``.
  * Flip rule (``nodes.h:108-126``): ``E = x·r + rnd + Σ w·s``; flip when
    ``E < quantize(local_θ)`` — the threshold is *quantized at every
    evaluation* while adapting in the continuous domain, and adaptation is
    two-sided: θ/λ on flip (harder), θ·λ on no-flip (easier).  The C family
    adapts only the no-flip side (``decodeGDBF.cpp:612-617``).
  * Noise: ONE quantized Gaussian ``quantize(σ·n)`` generated per clock at
    the source and shifted through the symnode chain
    (``decoder.h:113-119,187``) — node i at iteration k sees the sample
    generated k−i−1 clocks ago, a hardware sample-reuse correlation
    structure distinct from both the C fresh-noise and the NGDBFhw ring.
  * Output smoothing: fixed window 32 up/down counters
    (``decoder.h:221-246``), applied when the iteration cap is reached.
  * Reported ``iterations`` = symbol-update rounds executed before the
    syndrome check passed (cap T if never) — the cycle-count bookkeeping
    (+1 handshake offsets) of the event model is intentionally dropped.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..channel.quantize import quantize_threshold_table
from ..codes.code import Code
from .base import DecodeResult, syndrome_from_hard, vma_like

__all__ = ["SystemCNGDBFConfig", "decode_ngdbf_systemc"]

SMOOTHING_WINDOW = 32  # decoder.h:221-246 (compile-time constant SMOOTHED)


@dataclasses.dataclass(frozen=True)
class SystemCNGDBFConfig:
    """argv of ldpcsim.x (SystemC/NGDBF/src/ldpcsim.cpp:82-122):
    iterations, theta, lambda, precision (Nq = 2^precision levels), Ymax,
    alpha; smoothing per the SMOOTHED build flag."""

    num_iterations: int
    theta: float
    lam: float = 0.975
    alpha: float = 0.95
    ymax: float = 3.0
    nq_levels: int = 16
    smoothed: bool = True


@functools.partial(jax.jit, static_argnames=("cfg",))
def decode_ngdbf_systemc(
    code: Code,
    y: jax.Array,
    sigma: float,
    cfg: SystemCNGDBFConfig,
    key: jax.Array,
    noise_stream: Optional[jax.Array] = None,
) -> DecodeResult:
    """Batched decode with SystemC NGDBF semantics.

    y: [B, N] raw additive-AWGN samples (the decoder applies the quantizer,
    decoder.h:217-220).  noise_stream: optional [N + T, B] pre-drawn raw
    source samples (σ·n, pre-quantization) for replay — sample index
    ``(N−1−i) + k`` reaches node i at iteration k, reproducing the shift
    chain.
    """
    y_t = jnp.asarray(y, jnp.float32).T  # [N, B]
    n, b = y_t.shape
    T = cfg.num_iterations
    qz = lambda v: quantize_threshold_table(v, cfg.ymax, cfg.nq_levels)

    r = qz(y_t)  # quantized received samples
    x0 = jnp.where(r > 0, 1, -1).astype(jnp.int32)
    w = (cfg.alpha * cfg.ymax / code.vn_deg.astype(jnp.float32))[:, None]

    if noise_stream is None:
        noise_stream = sigma * jax.random.normal(key, (n + T, b), jnp.float32)
    gq = qz(jnp.asarray(noise_stream, jnp.float32))  # quantized source samples

    init = dict(
        x=x0,
        theta=vma_like(jnp.full((n, b), cfg.theta, jnp.float32), x0),
        updown=vma_like(jnp.zeros((n, b), jnp.int32), x0),
        done=vma_like(jnp.zeros((b,), bool), x0),
        iters=vma_like(jnp.full((b,), T, jnp.int32), x0),
        k=jnp.int32(0),
    )

    def cond(st):
        return (st["k"] < T) & ~jnp.all(st["done"])

    def body(st):
        k = st["k"]
        x = st["x"]
        syn = syndrome_from_hard(code, x)  # [M, B] bipolar
        satisfied = jnp.all(syn > 0, axis=0)
        newly = ~st["done"] & satisfied
        iters = jnp.where(newly, k, st["iters"])
        done = st["done"] | satisfied
        act = ~done

        # shift-chain noise: node i reads the sample generated (N-1-i)+k
        # positions into the stream (decoder.h:113-119)
        window = jax.lax.dynamic_slice_in_dim(gq, k, n, axis=0)
        rnd = jnp.flip(window, axis=0)  # node 0 sees the newest sample

        svals = jnp.take(syn, code.vn_cn.reshape(-1), axis=0).reshape(
            n, code.dv_max, b
        )
        svals = jnp.where(code.vn_mask[:, :, None], svals, 0)
        e = x.astype(jnp.float32) * r + rnd + w * jnp.sum(
            svals.astype(jnp.float32), axis=1
        )

        flip = e < qz(st["theta"])
        x = jnp.where(act[None, :] & flip, -x, x)
        theta = jnp.where(
            act[None, :],
            jnp.where(flip, st["theta"] / cfg.lam, st["theta"] * cfg.lam),
            st["theta"],
        )

        updown = st["updown"]
        if cfg.smoothed:
            in_window = (k + 1) > (T - SMOOTHING_WINDOW)
            updown = jnp.where(
                act[None, :] & in_window, updown + x, updown
            )
        return dict(
            x=x, theta=theta, updown=updown, done=done, iters=iters, k=k + 1
        )

    st = jax.lax.while_loop(cond, body, init)
    x = st["x"]
    if cfg.smoothed:
        # up/down counters rewrite unsatisfied frames at the cap
        # (decoder.h:237-246); counter 0 resolves to bit 1 (d = -1)
        smoothed = jnp.where(st["updown"] > 0, 1, -1).astype(jnp.int32)
        x = jnp.where(st["done"][None, :], x, smoothed)
    # satisfied = stopped early, or the final (possibly smoothed) output
    # happens to pass all checks at the cap
    final_sat = st["done"] | jnp.all(syndrome_from_hard(code, x) > 0, axis=0)
    return DecodeResult(hard=x.T, iterations=st["iters"], satisfied=final_sat)
