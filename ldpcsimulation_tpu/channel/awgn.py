"""BPSK + AWGN channel, exactly in the reference's conventions.

Reference semantics captured here (ereiss123/LDPCsimulation):
  * Bit mapping: codeword bit '0' -> +1, '1' -> -1
    (``C_implementations/src/decodeBP.cpp:166-176``).
  * Noise parameters: ``N0 = 10^(-SNR/10) / R``, ``sigma = sqrt(N0/2)``
    (``decodeBP.cpp:104-105``) — SNR is Eb/N0 in dB with unit symbol energy.
  * Two AWGN forms exist in the reference:
      - multiplicative: ``y = x * (1 + sigma * n)`` — all C simulators
        (``decodeBP.cpp:184``, ``decodeGDBF.cpp:253``, ``NGDBFhw.cpp:218``).
        For BPSK x ∈ {±1} this is distributionally identical to the additive
        form (x² = 1) but flips the noise sign on -1 symbols.
      - additive: ``y = x + sigma * n`` — the SystemC testbench
        (``SystemC/NGDBF/inc/LDPC_testbench.h:144-149``).
  * LLR conversion (BP only): ``yq = 4*y/N0`` clamped to ±MAXLLR = ±20
    (``decodeBP.cpp:58,188-191``).

RNG: the reference seeds libc ``random()`` with time(0) per process and draws
Box–Muller Gaussians (``inc/rand.h:10-26``).  Here every frame's noise is a
pure function of (root key, frame index) via counter-based `jax.random`
streams — replay of any frame needs no state files (contrast
``newstat.cpp:783-791`` which snapshots GSL RNG state per frame).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "MAXLLR",
    "snr_to_n0",
    "n0_to_sigma",
    "snr_to_sigma",
    "bpsk",
    "awgn",
    "llr_from_channel",
]

MAXLLR = 20.0  # decodeBP.cpp:58


def snr_to_n0(snr_db, rate):
    """N0 = 10^(-SNR/10)/R (decodeBP.cpp:104)."""
    return 10.0 ** (-jnp.asarray(snr_db) / 10.0) / rate


def n0_to_sigma(n0):
    return jnp.sqrt(jnp.asarray(n0) / 2.0)


def snr_to_sigma(snr_db, rate):
    return n0_to_sigma(snr_to_n0(snr_db, rate))


def bpsk(bits):
    """Bits {0,1} -> bipolar {+1,-1} ('0'->+1, decodeBP.cpp:166-176).

    Bits are widened to int32 first (uint8 input would wrap 1-2*1 to 255).
    """
    return 1 - 2 * jnp.asarray(bits, jnp.int32)


def awgn(key, x, sigma, form: str = "multiplicative", dtype=jnp.float32):
    """Apply AWGN to bipolar symbols ``x`` (any shape).

    form="multiplicative": y = x*(1 + sigma*n)   (C simulators)
    form="additive":       y = x + sigma*n       (SystemC testbench)
    """
    x = jnp.asarray(x, dtype)
    n = jax.random.normal(key, x.shape, dtype)
    if form == "multiplicative":
        return x * (1.0 + sigma * n)
    elif form == "additive":
        return x + sigma * n
    raise ValueError(f"unknown AWGN form {form!r}")


def llr_from_channel(y, n0, max_llr: float = MAXLLR):
    """LLR = 4*y/N0, clamped to ±max_llr (decodeBP.cpp:188-191)."""
    q = 4.0 * y / n0
    return jnp.clip(q, -max_llr, max_llr)
