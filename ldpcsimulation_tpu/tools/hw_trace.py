"""NGDBFhw bit-level iteration traces (the LOG_PROCESSING subsystem).

Reference counterpart: ``NGDBFhw.cpp`` compiled with ``-DLOG_PROCESSING``
(``:180-191, 261-277, 304-335``): binary dumps of the quantized channel
word, the noise ring, and per-iteration per-node records (incoming
syndromes, SSum, q sample, flip metric E, theta, flip decision) used to
diff the software model against RTL/ASIC simulation bit by bit.

This tool decodes ONE frame with a plain-Python integer-domain loop
(exactly the :mod:`..decoders.ngdbf_hw` semantics — asserted against it in
tests) while writing the same record structure.  Sign-magnitude packing of
the NQ-bit samples is reconstructed for the binary columns.
"""

from __future__ import annotations

import math
from typing import Optional, TextIO

import numpy as np

from ..codes.code import Code
from ..decoders.ngdbf_hw import NGDBFHwConfig

__all__ = ["trace_ngdbf_hw"]


def _quant_int(x: float, nl: int, lmax: float) -> int:
    mag = math.floor(abs(x) * nl / (2.0 * lmax))
    return (1 if x > 0 else -1) * (2 * mag + 1)


def _pack_bits(value: int, nq: int) -> str:
    """Sign-magnitude NQ-bit pattern of the pre-unpack sample
    (NGDBFhw.cpp pack(), :653-663): |value| = 2*mag + 1."""
    mag = (abs(value) - 1) // 2
    bits = format(mag, f"0{nq - 1}b")
    return ("1" if value < 0 else "0") + bits


def trace_ngdbf_hw(
    code: Code,
    y: Optional[np.ndarray],
    sigma: float,
    cfg: NGDBFHwConfig,
    ring_noise: Optional[np.ndarray],
    out: TextIO,
    max_iterations: Optional[int] = None,
    yint_override: Optional[np.ndarray] = None,
    qint_override: Optional[np.ndarray] = None,
    qpointer0: int = 0,
):
    """Decode one frame, writing LOG_PROCESSING-style records to ``out``.

    y: [N] raw channel samples; ring_noise: [ring_len] raw σ'·n draws.
    yint_override/qint_override: already-quantized unpacked integers (the
    ±(2·mag+1) domain) — for replaying a reference LOG_PROCESSING capture
    bit-exactly.  ``qpointer0``: starting ring offset — the reference's
    ``qpointer`` persists ACROSS frames (declared outside the frame loop,
    ``NGDBFhw.cpp:153``, wrapped only at ``:356-358``), so a multi-frame
    replay chains each frame's returned pointer into the next call.
    Returns (d_bits, iterations, satisfied, final_qpointer).
    """
    n, m = code.n, code.m
    lmax, nl, nq = cfg.lmax, cfg.nl, cfg.nq
    theta = cfg.theta_int
    smult = cfg.smult
    T = max_iterations or cfg.num_iterations

    vn_cn = np.asarray(code.vn_cn)
    vn_mask = np.asarray(code.vn_mask)
    cn_vn = np.asarray(code.cn_vn)
    cn_mask = np.asarray(code.cn_mask)

    if yint_override is not None:
        yint = [int(v) for v in yint_override]
    else:
        yc = np.where(np.abs(y) > cfg.ymax, np.sign(y) * cfg.ymax, y)
        yint = [_quant_int(v / (2.0 * cfg.w), nl, lmax) for v in yc]
    r = np.where(np.asarray(yint) > 0, 1, -1)
    d = ((1 - r) // 2).astype(int)
    if qint_override is not None:
        qint = [int(v) for v in qint_override]
    else:
        qint = []
        for q in ring_noise:
            qm = (float(q) - cfg.theta0) / (2.0 * cfg.w) - 1.0
            qm = max(-lmax, min(lmax, qm))
            qint.append(_quant_int(qm, nl, lmax))
    ring_mod = len(qint) - n

    out.write(f"GLOBALS:\n\ttheta = {theta}\n\tSmult = {smult}\n")
    out.write("CHANIN:\n")
    for v in yint:
        out.write(f"\t{_pack_bits(v, nq)}\n")
    out.write("NOISE:\n")
    for v in qint:
        out.write(f"\t{_pack_bits(v, nq)}\n")

    qptr = qpointer0 % ring_mod
    satisfied = False
    it = 0
    while it < T:
        syn = np.ones(m, int)
        satisfied = True
        for c in range(m):
            prod = 1
            for t in range(cn_mask.shape[1]):
                if cn_mask[c, t]:
                    prod *= 1 - 2 * d[cn_vn[c, t]]
            if prod < 0:
                satisfied = False
            syn[c] = (1 - prod) // 2
        if satisfied:
            break
        out.write(f"IT {it}\n")
        for i in range(n):
            ssum = 0
            msgs = []
            for s in range(vn_mask.shape[1]):
                if vn_mask[i, s]:
                    msg = syn[vn_cn[i, s]]
                    msgs.append(str(msg))
                    ssum += 1 - msg
            qv = qint[i + qptr]
            e = (1 - 2 * d[i]) * yint[i] + ssum * smult + qv
            flip = int(e <= theta)
            out.write(
                f"S{i}:\n\tchan: {yint[i]} ({_pack_bits(yint[i], nq)}), "
                f"{d[i]}\n\tin_messages: {' '.join(msgs)}\n"
                f"\tS: {ssum} ({ssum * smult})\n"
                f"\tq: {qv} ({_pack_bits(qv, nq)})\n"
                f"\tE: {e}\n\ttheta: {theta}\n\tflip: {flip}\n"
            )
            if flip:
                d[i] = 1 - d[i]
        qptr += 1
        if qptr >= ring_mod:
            qptr = 0
        it += 1
    return d, it, satisfied, qptr
