"""Gather-free sum-product BP for quasi-cyclic codes.

Same arithmetic as :mod:`.bp` (hyperbolic-pair CN update, exact
prefix/suffix extrinsic exclusion, ±MAXLLR VN clamp) with the QC per-block
static-roll message routing of :mod:`.minsum_qc` — the BASELINE
"(1008,504) BP with early syndrome termination" configuration at the QC
decoder's speed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..codes.qc import QCCode
from .base import DecodeResult, run_flooding_soft, sgn_pos, storage_cast
from .bp import MAXLLR, pair_excl_logmags
from .minsum_qc import (
    _swap_scan_views,
    _v2c_slot,
    _unswap_outputs,
    _vn_fold,
    qc_block_uniform,
    qc_check_satisfied,
    qc_ragged_init,
    qc_slot_plan,
)

__all__ = ["decode_bp_qc", "qc_bp_step"]


def qc_cn_bp_slots(qc: QCCode, v2c):
    """Sum-product CN update on the ragged per-block v2c (tuple of
    ``[deg_j, z, B]`` planes; the stacked array also works), returning
    c2v slot EXPRESSIONS in VN layout (``slots[bj][s]`` = [z, B]), never
    stacked — the VN update consumes them fused (see
    minsum_qc.qc_cn_minsum_slots for the rationale).  Arithmetic runs in
    (at least) float32 regardless of the message storage dtype.
    Generalized structures (multi-edge pairs, minus edges) follow the
    qc_slot_plan masks: absent edges read +inf, whose u = e^-|m| is
    exactly 0 and sign +1 — the pair fold's neutral element
    (bp.pair_excl_logmags)."""
    z = qc.z
    cdt = jnp.promote_types(v2c[0].dtype, jnp.float32)
    b = v2c[0].shape[-1]
    cn_plan, _ = qc_slot_plan(qc)
    inf = jnp.asarray(jnp.inf, v2c[0].dtype)

    c2v_slots = [[None] * len(qc.vn_blocks[bj]) for bj in range(qc.nb)]
    for bi in range(qc.mb):
        entries = cn_plan[bi]
        phys = []
        for e in entries:
            msg = jnp.roll(_v2c_slot(v2c, e.bj, e.vslot), -e.shift, axis=0)
            if e.cn_mask is not None:
                msg = jnp.where(jnp.asarray(e.cn_mask)[:, None], inf, msg)
            phys.append(msg.astype(cdt))
        views = _swap_scan_views(entries, phys)
        us = [jnp.exp(-jnp.abs(v)) for v in views]
        signs = [sgn_pos(v) for v in views]
        dc = len(views)
        mags = pair_excl_logmags(us)
        ones = jnp.ones((z, b), cdt)
        pre_s = [ones]
        for t in range(dc - 1):
            pre_s.append(pre_s[-1] * signs[t])
        suf_s = [ones]
        for t in range(dc - 1, 0, -1):
            suf_s.append(suf_s[-1] * signs[t])
        suf_s.reverse()
        outs = [pre_s[t] * suf_s[t] * mags[t] for t in range(dc)]
        outs = _unswap_outputs(entries, outs)
        for t, e in enumerate(entries):
            c2v_slots[e.bj][e.vslot] = jnp.roll(outs[t], e.shift, axis=0)
    return c2v_slots


def qc_bp_step(qc: QCCode, max_llr: float = MAXLLR, storage_dtype=None):
    """The :func:`decode_bp_qc` iteration as a pure function of (messages,
    channel term): ``step(v2c, yb) -> (v2c', totals)`` with ``yb`` the
    ``[Nb, z, B]`` clamped-LLR planes.  Identical operations to the closure
    inside :func:`decode_bp_qc` — factored out for drivers that replace the
    channel term mid-decode (the streaming refill harness)."""
    _, vn_plan = qc_slot_plan(qc)

    def step(v2c, yb):
        # c2v slots stay unstacked; messages left-fold first, channel
        # term last (the generic decoder's grouping, minsum.vn_update).
        # v2c is the ragged per-block tuple — no padded-slot writes
        # (see minsum_qc.qc_minsum_step).
        sdt = storage_dtype if storage_dtype is not None else yb.dtype
        slots = qc_cn_bp_slots(qc, v2c)
        totals = []
        planes = []
        for bj in range(qc.nb):
            total = yb[bj] + _vn_fold(vn_plan[bj], slots[bj])
            totals.append(total)
            pl = [
                storage_cast(jnp.clip(total - sa, -max_llr, max_llr), sdt)
                for sa in slots[bj]
            ]
            planes.append(jnp.stack(pl))
        if qc_block_uniform(qc):
            return jnp.stack(planes), jnp.stack(totals)
        return tuple(planes), jnp.stack(totals)

    return step


@functools.partial(
    jax.jit,
    static_argnames=(
        "qc", "num_iterations", "early_termination", "storage_dtype"
    ),
)
def decode_bp_qc(
    qc: QCCode,
    llr: jax.Array,
    num_iterations: int,
    max_llr: float = MAXLLR,
    early_termination: bool = False,
    storage_dtype=None,
) -> DecodeResult:
    """Batched flooding sum-product on a QC code.  llr: [B, N].

    storage_dtype: optional narrower dtype (e.g. float16) for the v2c
    message planes; CN/VN arithmetic stays float32 (see decode_bp).
    """
    # Input clamp (decodeBP.cpp:188-191), matching decode_bp: without it,
    # |llr| ≳ 89 underflows u = e^-|m| to 0 and the resulting log(s/0) =
    # inf NaN-poisons the frame on this fast path only.
    llr_t = jnp.clip(jnp.asarray(llr).T, -max_llr, max_llr)
    n, b = llr_t.shape
    assert n == qc.n
    yb = llr_t.reshape(qc.nb, qc.z, b)
    sdt = storage_dtype if storage_dtype is not None else llr_t.dtype
    v2c0 = qc_ragged_init(qc, yb, sdt)
    step_y = qc_bp_step(qc, max_llr, storage_dtype)

    d, iters, done = run_flooding_soft(
        yb, v2c0, lambda v2c: step_y(v2c, yb),
        lambda d: qc_check_satisfied(qc, d),
        num_iterations, early_termination, b,
    )
    return DecodeResult(
        hard=d.reshape(n, b).T, iterations=iters, satisfied=done
    )
