"""Roll-based graph operations for QC codes, shared by the bit-flip family.

The GDBF/NGDBF decoders touch the Tanner graph in exactly two places: the
bipolar syndrome per check and the per-variable sum of neighboring
syndromes.  Both are dynamic gathers in the generic path; for QC codes they
become static per-block rolls (see codes/qc.py for why that matters on
TPU).  Outputs are bit-identical to the generic implementations — products
and sums of the same operands in a different static order.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..codes.qc import QCCode

__all__ = ["qc_syndrome_bipolar", "qc_syndrome_sum_per_vn"]


def qc_syndrome_bipolar(qc: QCCode, d):
    """d: [N, B] ±1 -> bipolar syndrome [M, B] (+1 satisfied)."""
    b = d.shape[-1]
    db = d.reshape(qc.nb, qc.z, b)
    rows = []
    for bi in range(qc.mb):
        prod = None
        for bj, shift in qc.cn_blocks[bi]:
            v = jnp.roll(db[bj], -shift, axis=0)
            prod = v if prod is None else prod * v
        rows.append(prod)
    return jnp.stack(rows).reshape(qc.m, b)


def qc_syndrome_sum_per_vn(qc: QCCode, syn):
    """syn: [M, B] -> per-variable neighbor syndrome sums [N, B]."""
    b = syn.shape[-1]
    sb = syn.reshape(qc.mb, qc.z, b)
    cols = []
    for bj in range(qc.nb):
        acc = None
        for bi, shift in qc.vn_blocks[bj]:
            v = jnp.roll(sb[bi], shift, axis=0)
            acc = v if acc is None else acc + v
        cols.append(acc)
    return jnp.stack(cols).reshape(qc.n, b)
