"""Gather-free min-sum decoder for quasi-cyclic codes.

Same arithmetic, slot order, and tie-breaking as :mod:`.minsum` (bit-exact
equivalence is tested), but the VN↔CN permutation is done with per-block
cyclic rolls whose offsets are compile-time constants (see
:mod:`..codes.qc`).  XLA lowers a static-shift roll to two contiguous
copies, so the decoder contains no dynamic gathers at all — on TPU v5e this
moves min-sum from gather-bound (~0.84 ms per iteration at B=8192 on the
(1008,504) code) to VPU-bound.

Message layout: ``v2c[Nb, dv_max, z, B]`` — base-column planes of z×B
circulant rows, batch in lanes.  Invalid (irregular) slots hold zeros and
are statically skipped: QC blocks are all-or-nothing, so no per-row masking
is needed anywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..codes.qc import QCCode
from .base import DecodeResult, run_flooding_soft, sgn_pos, storage_cast

__all__ = ["decode_minsum_qc", "qc_check_satisfied", "qc_cn_minsum",
           "qc_cn_minsum_slots"]


def _vn_slot_index(qc: QCCode):
    """For each (bi, t) CN slot, the (bj, s, shift) of its VN-side slot."""
    table = []
    for bi in range(qc.mb):
        row = []
        for bj, shift in qc.cn_blocks[bi]:
            s = next(
                i for i, (b, _) in enumerate(qc.vn_blocks[bj]) if b == bi
            )
            row.append((bj, s, shift))
        table.append(row)
    return table


def qc_cn_minsum_slots(qc: QCCode, v2c, variant="plain", alpha=1.0, delta=0.0):
    """CN update + variant post-op, returning c2v slot EXPRESSIONS in VN
    layout: ``slots[bj][s]`` is a ``[z, B]`` array for VN block ``bj``'s
    ``s``-th edge block.

    Returning the unstacked list lets the VN update consume the c2v values
    as fused expressions — XLA CSEs the shared slot between the total sum
    and the extrinsic subtraction, so the stacked ``[Nb, dv_max, z, B]``
    c2v buffer is never materialized in HBM (measured ~12% of the flagship
    iteration time on v5e).

    v2c: [Nb, dv_max, z, B].  Identical scan semantics to minsum_cn_update
    (<= last-min-wins).
    """
    z = qc.z
    dtype = v2c.dtype
    b = v2c.shape[-1]
    table = _vn_slot_index(qc)
    inf = jnp.asarray(jnp.inf, dtype)

    c2v_slots = [
        [None] * len(qc.vn_blocks[bj]) for bj in range(qc.nb)
    ]
    for bi in range(qc.mb):
        # CN-row-space views of incoming messages (static rolls)
        views = [
            jnp.roll(v2c[bj, s], -shift, axis=0)
            for (bj, s, shift) in table[bi]
        ]
        min1 = jnp.full((z, b), inf, dtype)
        min2 = jnp.full((z, b), inf, dtype)
        minidx = jnp.full((z, b), -1, jnp.int32)
        sprod = jnp.ones((z, b), dtype)
        for t, msg in enumerate(views):
            a = jnp.abs(msg)
            sprod = sprod * sgn_pos(msg)
            is_min = a <= min1
            min2 = jnp.where(is_min, min1, jnp.where(a < min2, a, min2))
            minidx = jnp.where(is_min, t, minidx)
            min1 = jnp.where(is_min, a, min1)
        for t, msg in enumerate(views):
            mag = jnp.where(minidx == t, min2, min1)
            out = sprod * mag * sgn_pos(msg)
            if variant == "normalized":
                out = out / alpha
            elif variant == "offset":
                m2 = jnp.abs(out) - delta
                out = jnp.where(m2 > 0, sgn_pos(out) * m2, jnp.zeros_like(out))
            bj, s, shift = table[bi][t]
            c2v_slots[bj][s] = jnp.roll(out, shift, axis=0)
    return c2v_slots


def qc_cn_minsum(qc: QCCode, v2c, variant="plain", alpha=1.0, delta=0.0):
    """CN update + variant post-op, returning c2v stacked in VN layout
    ``[Nb, dv_max, z, B]`` (missing irregular slots are zero)."""
    c2v_slots = qc_cn_minsum_slots(qc, v2c, variant, alpha, delta)
    z = qc.z
    b = v2c.shape[-1]
    zero = jnp.zeros((z, b), v2c.dtype)
    planes = []
    for bj in range(qc.nb):
        slots = list(c2v_slots[bj]) + [zero] * (
            qc.dv_max - len(c2v_slots[bj])
        )
        planes.append(jnp.stack(slots))
    return jnp.stack(planes)


def qc_check_satisfied(qc: QCCode, d):
    """d: [Nb, z, B] ±1 -> [B] all-checks-satisfied."""
    ok = None
    for bi in range(qc.mb):
        prod = None
        for bj, shift in qc.cn_blocks[bi]:
            v = jnp.roll(d[bj], -shift, axis=0)
            prod = v if prod is None else prod * v
        row_ok = jnp.all(prod > 0, axis=0)  # [B]
        ok = row_ok if ok is None else ok & row_ok
    return ok


@functools.partial(
    jax.jit,
    static_argnames=(
        "qc",
        "num_iterations",
        "variant",
        "early_termination",
        "storage_dtype",
    ),
)
def decode_minsum_qc(
    qc: QCCode,
    y: jax.Array,
    num_iterations: int,
    variant: str = "plain",
    alpha: float = 1.0,
    delta: float = 0.0,
    early_termination: bool = False,
    storage_dtype=None,
) -> DecodeResult:
    """Batched flooding min-sum on a QC code.  y: [B, N].

    storage_dtype: optional narrower dtype (e.g. float16) for the message
    arrays.  CN min/sign is exact on the stored values and c2v magnitudes
    are copies of stored inputs (lossless), so the only rounding is the
    per-iteration v2c store after the f32 VN sum — a bandwidth/precision
    trade measured at ~1% BER effect for f16 at the 2 dB operating point
    (vs ~60% for doing all arithmetic in bf16).
    """
    if qc.extra_edges or qc.minus_edges:
        raise NotImplementedError(
            "message-passing QC decoders require single-edge defect-free "
            "blocks (multi-edge/defect codes route to qc_ops bit-flip "
            "decoders or the generic path)"
        )
    y_t = jnp.asarray(y).T  # [N, B]
    n, b = y_t.shape
    assert n == qc.n, (n, qc.n)
    yb = y_t.reshape(qc.nb, qc.z, b)
    dv_max = qc.dv_max
    sdt = storage_dtype if storage_dtype is not None else y_t.dtype

    # initializeSymMessages: all slots start at the channel sample
    v2c0 = jnp.broadcast_to(yb[:, None], (qc.nb, dv_max, qc.z, b)).astype(sdt)
    zero = jnp.zeros((qc.z, b), sdt)

    def step(v2c):
        """One flooding iteration.  Returns (v2c_new, totals).

        The c2v slots stay unstacked expressions: each is consumed by the
        per-block total (left-fold, matching jnp.sum's reduce order so the
        f32 rounding — and therefore every hard decision — is bit-exact
        with the stacked formulation) and by the extrinsic subtraction,
        which XLA CSEs into one fused computation with no materialized
        [Nb, dv_max, z, B] c2v buffer.
        """
        slots = qc_cn_minsum_slots(qc, v2c, variant, alpha, delta)
        totals = []
        planes = []
        for bj in range(qc.nb):
            acc = None
            accs = [s.astype(y_t.dtype) for s in slots[bj]]
            for sa in accs:
                acc = sa if acc is None else acc + sa
            total = yb[bj] + acc  # [z, B]
            totals.append(total)
            pl = [storage_cast(total - sa, sdt) for sa in accs]
            pl += [zero] * (dv_max - len(pl))
            planes.append(jnp.stack(pl))
        return jnp.stack(planes), jnp.stack(totals)

    d, iters, done = run_flooding_soft(
        yb, v2c0, step,
        lambda d: qc_check_satisfied(qc, d),
        num_iterations, early_termination, b,
    )
    return DecodeResult(
        hard=d.reshape(n, b).T, iterations=iters, satisfied=done
    )
