"""Channel-sample quantizers, bit-matching the reference's three families.

1. :func:`quantize_no_zero` — min-sum/DDBMP style
   (``C_implementations/src/decodeMinSum.cpp:479-490``,
   ``decodeDDBMP.cpp:433-443``): Nq *levels*, uniform floor quantizer with NO
   zero level; inputs beyond ±Ymax clamp to ±Ymax exactly, and any value that
   would quantize to 0 maps to ±1 LSB instead.

2. :func:`quantize_round` — GDBF-family style (``decodeGDBF.cpp:488-493``):
   NQ *bits*, round-to-nearest uniform quantizer
   ``sgn(x) * round(|x| * 2^(NQ-1) / Ymax) * Ymax / 2^(NQ-1)``
   (the reference writes it via lmax = Ymax/2; same value).  Note GDBF's
   ``sgn(0) = -1``, which is invisible here since the magnitude is 0.

3. :func:`quantize_threshold_table` — SystemC style
   (``SystemC/NGDBF/inc/ldpcsim.h:85-117``): Nq-*level* quantizer with
   endpoint-included output levels ``-Ymax + i * 2*Ymax/(Nq-1)`` for
   i = 0..Nq-1 and thresholds at the midpoints between adjacent levels.

Saturation (``-D saturateSamples``, e.g. ``decodeGDBF.cpp:263-267``) is a
plain clip and composes with any of the above.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = [
    "quantize_no_zero",
    "quantize_round",
    "quantize_threshold_table",
    "saturate",
]


def _sgn_pos(x):
    """sgn with sgn(0)=+1 (decodeBP.cpp:412-417, decodeMinSum.cpp:518-523)."""
    return jnp.where(x >= 0, 1.0, -1.0).astype(x.dtype)


def saturate(x, ymax):
    """Clip to ±Ymax (saturateSamples flag, decodeGDBF.cpp:263-267)."""
    return jnp.clip(x, -ymax, ymax)


def quantize_no_zero(x, ymax, nq):
    """Min-sum/DDBMP quantizer: Nq levels, no zero level.

    decodeMinSum.cpp:479-490:
        if |x| > Ymax: return sgn(x)*Ymax
        q = sgn(x) * floor(|x|*(Nq-1)/(2*Ymax)) * (2*Ymax/(Nq-1))
        if q == 0: q = sgn(x) * 2*Ymax/(Nq-1)
    """
    x = jnp.asarray(x)
    s = _sgn_pos(x)
    lsb = 2.0 * ymax / (nq - 1.0)
    q = s * jnp.floor(jnp.abs(x) / lsb) * lsb
    q = jnp.where(q == 0.0, s * lsb, q)
    return jnp.where(jnp.abs(x) > ymax, s * ymax, q)


def quantize_round(x, ymax, nq_bits):
    """GDBF quantizer (decodeGDBF.cpp:488-493): round-to-nearest, NQ bits.

    qmax = 2^(NQ-1); lmax = Ymax/2
    q = sgn(x) * floor(|x|*qmax/(2*lmax) + 0.5) * (2*lmax/qmax)
    (no saturation here — the reference saturates separately).
    """
    x = jnp.asarray(x)
    qmax = 2.0 ** (nq_bits - 1)
    step = ymax / qmax  # == 2*lmax/qmax with lmax = Ymax/2
    return _sgn_pos(x) * jnp.floor(jnp.abs(x) / step + 0.5) * step


def quantize_threshold_table(x, ymax, nq_levels):
    """SystemC quantizer (SystemC/NGDBF/inc/ldpcsim.h:85-118).

    Nq output levels L_i = -Ymax + i * 2*Ymax/(Nq-1), i = 0..Nq-1 (endpoints
    included); thresholds are the midpoints, and the comparison is strict
    (``if (Y > qthresholds[i]) k = i+1``), so a value exactly on a threshold
    takes the *lower* level.

    Implemented exactly as the reference does — an explicit threshold table
    and a strict-compare count — so the tie behavior is epsilon-free: any
    float that the reference's ``Y > qthresholds[i]`` classifies low is
    classified low here too, with no derived ceil/round arithmetic to drift.
    """
    x = jnp.asarray(x)
    delta = 2.0 * ymax / (nq_levels - 1.0)
    # ldpcsim.h:91: qthresholds[i] = -Ymax*(Nq-2)/(Nq-1) + i*2*Ymax/(Nq-1)
    thresholds = (
        -ymax * (nq_levels - 2.0) / (nq_levels - 1.0)
        + np.arange(nq_levels - 1) * delta
    )
    # ldpcsim.h:92-94: qvalues[i] = -Ymax + i*delta, last pinned to +Ymax
    values = np.concatenate([-ymax + np.arange(nq_levels - 1) * delta, [ymax]])
    k = jnp.sum(
        x[..., None] > jnp.asarray(thresholds, x.dtype), axis=-1
    )
    return jnp.asarray(values, x.dtype)[k]
