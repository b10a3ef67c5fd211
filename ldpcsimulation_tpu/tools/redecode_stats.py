"""Per-frame redecode statistics: frame-specific error probability Pe(f).

Reference counterpart: ``newstat.cpp`` (binary ``redecodeStatistics``,
``Makefile:39-40``): for NF frames, snapshot the RNG state, decode the same
received frame NR times with fresh decoder noise, and log one row per frame
— ``framenum  outcome[0..NR-1]`` with each outcome the residual error
weight of that attempt (``newstat.cpp:432-436``).  The older
``redecodeStatistics.cpp`` is the same without state files.

TPU-native version: the channel realization of frame f is a pure function
of (seed, f), and the NR redecode attempts use keys folded from (seed, f,
attempt) — no state files, and all NR attempts of a frame run as one
batched decode.
"""

from __future__ import annotations

from typing import Optional, TextIO

import jax
import jax.numpy as jnp
import numpy as np

from ..channel.awgn import awgn, snr_to_sigma
from ..codes.code import Code
from ..decoders.gdbf import GDBFConfig, decode_gdbf

__all__ = ["redecode_statistics"]


def redecode_statistics(
    code: Code,
    cfg: GDBFConfig,
    snr_db: float,
    rate: Optional[float] = None,
    num_frames: int = 200,
    num_redecodes: int = 100,
    seed: int = 0,
    log: Optional[TextIO] = None,
) -> np.ndarray:
    """Returns outcomes [num_frames, num_redecodes]: error weight per
    attempt.  Defaults mirror ``scripts/redecode_statistics_802.3.sh``
    (NR=100, NF=200).  Writes reference-format rows to ``log`` if given.
    """
    rate = code.rate if rate is None else rate
    sigma = float(snr_to_sigma(snr_db, rate))
    root = jax.random.key(seed)

    @jax.jit
    def one_frame(kframe):
        kch, kdec = jax.random.split(kframe)
        y = awgn(kch, jnp.ones((1, code.n), jnp.float32), sigma)
        yb = jnp.broadcast_to(y, (num_redecodes, code.n))
        # each attempt gets its own decoder-noise stream; batch lanes are
        # distinguished by folding the attempt index server-side via the
        # decoder's per-(step) keys — pass a per-run key and let the batch
        # dimension see different noise by drawing [T, N, B] perturbations
        res = decode_gdbf(code, yb, sigma, cfg, key=kdec)
        return jnp.sum(res.hard != 1, axis=1)  # error weight per attempt

    outcomes = np.zeros((num_frames, num_redecodes), np.int64)
    for f in range(num_frames):
        kframe = jax.random.fold_in(root, f)
        outcomes[f] = np.asarray(one_frame(kframe))
        if log is not None:
            log.write(
                str(f) + "\t" + "\t".join(map(str, outcomes[f])) + "\n"
            )
    return outcomes
