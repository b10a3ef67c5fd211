"""Erroneous-message tracing for the soft decoders.

Reference counterpart: ``writeErroneousMessagesToFile``
(``decodeBP.cpp:462-548``, compile-gated by ``-DerroneousMessageFile``):
per-frame / per-iteration dumps of which symbol→check messages carry the
wrong sign relative to the transmitted codeword, and which checks received
erroneous messages — the debugging view used to study decoder failures.

This version steps the flooding decoders iteration by iteration through the
public CN/VN update primitives and reports the same quantities as arrays.
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax.numpy as jnp
import numpy as np

from ..codes.code import Code
from ..decoders.bp import MAXLLR, bp_cn_update
from ..decoders.minsum import minsum_cn_update, vn_update

__all__ = ["MessageTrace", "trace_soft_decoder"]


@dataclasses.dataclass
class MessageTrace:
    """Per-iteration message-error view of a single frame.

    v2c_sign_errors[it][N, dv_max]: True where an outgoing VN message's
    sign disagrees with the transmitted bipolar symbol (masked slots False).
    checks_with_errors[it][M]: count of erroneous incoming messages per
    check (the reference's per-check view).
    decisions[it][N]: hard decisions after the iteration.
    """

    v2c_sign_errors: List[np.ndarray]
    checks_with_errors: List[np.ndarray]
    decisions: List[np.ndarray]


def trace_soft_decoder(
    code: Code,
    samples: np.ndarray,
    truth_bipolar: np.ndarray,
    num_iterations: int,
    algorithm: str = "minsum",
) -> MessageTrace:
    """Step a flooding decoder on ONE frame, recording message errors.

    samples: [N] decoder-domain inputs (LLRs for "bp", channel samples for
    "minsum").  truth_bipolar: [N] transmitted ±1 symbols.
    """
    y_t = jnp.asarray(samples, jnp.float64)[:, None]  # [N, 1]
    truth = np.asarray(truth_bipolar)
    v2c = jnp.repeat(y_t, code.dv_max, axis=0)
    vn_mask = np.asarray(code.vn_mask)
    cn_vn = np.asarray(code.cn_vn)
    cn_mask = np.asarray(code.cn_mask)
    out = MessageTrace([], [], [])
    clamp = MAXLLR if algorithm == "bp" else None
    for _ in range(num_iterations):
        if algorithm == "bp":
            c2v = bp_cn_update(code, v2c)
        elif algorithm == "minsum":
            c2v = minsum_cn_update(code, v2c)
        else:
            raise ValueError(f"unknown algorithm {algorithm!r}")
        v2c, _total, d = vn_update(code, y_t, c2v, clamp=clamp)
        msgs = np.asarray(v2c).reshape(code.n, code.dv_max)
        # a message is erroneous when its sign (sgn(0)=+1) disagrees with
        # the transmitted symbol (decodeBP.cpp:486-497)
        sign = np.where(msgs >= 0, 1, -1)
        errs = (sign != truth[:, None]) & vn_mask
        out.v2c_sign_errors.append(errs)
        # per-check: count of erroneous incoming messages
        vn_err_any = errs  # [N, dv_max] but checks care per-edge
        per_check = np.zeros(code.m, np.int64)
        for c in range(code.m):
            for t in range(code.dc_max):
                if cn_mask[c, t]:
                    v = cn_vn[c, t]
                    # find the VN slot feeding this check
                    s = int(np.where(np.asarray(code.vn_cn)[v] == c)[0][0])
                    if errs[v, s]:
                        per_check[c] += 1
        out.checks_with_errors.append(per_check)
        out.decisions.append(np.asarray(d)[:, 0])
    return out
