"""Monte-Carlo harness for non-binary GF(2^m) simulations.

The reference's NB tool (SystemC/NB-LDPC) never reached a working harness;
its intended loop (README + ``belief_propagation_old.py``) is the same
BER/FER structure as the binary simulators with symbols in place of bits.
This driver mirrors :mod:`.montecarlo` with NB semantics: bit-level
BPSK/AWGN transmission of each symbol's m bits, symbol priors, FFT-QSPA
decoding, and both symbol- and bit-level error statistics.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..channel.awgn import snr_to_n0
from ..channel.nb import symbol_priors, symbols_to_bits
from ..codes.code import Code
from ..decoders.nb_qspa import decode_nb_qspa
from .montecarlo import StopRule, default_min_word_errors

__all__ = ["NBMCStats", "simulate_nb"]


@dataclasses.dataclass
class NBMCStats:
    n: int
    q: int
    symbol_errors: int = 0
    bit_errors: int = 0
    uncoded_symbol_errors: int = 0
    total_symbols: int = 0
    total_bits: int = 0
    total_words: int = 0
    word_errors: int = 0
    total_iterations: int = 0
    wall_seconds: float = 0.0

    @property
    def ser(self) -> float:
        return (
            self.symbol_errors / self.total_symbols if self.total_symbols else 0.0
        )

    @property
    def ber(self) -> float:
        return self.bit_errors / self.total_bits if self.total_bits else 0.0

    @property
    def fer(self) -> float:
        return self.word_errors / self.total_words if self.total_words else 0.0

    @property
    def avg_iterations(self) -> float:
        return (
            self.total_iterations / self.total_words if self.total_words else 0.0
        )


def simulate_nb(
    code: Code,
    snr_db: float,
    num_iterations: int,
    rate: Optional[float] = None,
    stop: Optional[StopRule] = None,
    batch_size: int = 128,
    seed: int = 0,
    early_termination: bool = True,
    dtype=jnp.float32,
    max_batches: int = 100000,
    storage_dtype=None,
) -> NBMCStats:
    """All-zero-codeword NB Monte-Carlo at one operating point.

    The stop rule's bit-error threshold applies to *bit* errors (symbol
    bits), keeping the reference's confidence semantics.
    """
    q = code.q
    if q < 4:
        raise ValueError("simulate_nb expects a GF(q>2) code")
    m = q.bit_length() - 1
    rate = rate if rate is not None else code.rate
    stop = stop or StopRule(min_word_errors=default_min_word_errors(code.n))
    # Eb/N0 accounting: m coded bits per symbol, rate*m info bits
    n0 = float(snr_to_n0(snr_db, rate))
    sigma = float(np.sqrt(n0 / 2.0))
    root = jax.random.key(seed)

    @jax.jit
    def batch_step(key):
        # all-zero symbols -> all-zero bits -> +1 BPSK per bit
        y = 1.0 + sigma * jax.random.normal(
            key, (batch_size, code.n, m), dtype
        )
        pri = symbol_priors(y, n0, q)
        res = decode_nb_qspa(
            code, pri, num_iterations, early_termination=early_termination,
            storage_dtype=storage_dtype,
        )
        sym_errs = jnp.sum(res.symbols != 0, axis=1)
        bits = symbols_to_bits(res.symbols, q)
        bit_errs = jnp.sum(bits != 0, axis=(1, 2))
        uncoded = jnp.sum(jnp.argmax(pri, axis=-1) != 0, axis=1)
        return sym_errs, bit_errs, uncoded, res.iterations

    stats = NBMCStats(n=code.n, q=q)
    t0 = time.perf_counter()
    batch_idx = 0
    while not stop.done(stats.bit_errors, stats.word_errors, stats.total_words):
        if batch_idx >= max_batches:
            break
        b = batch_size
        if stop.max_frames is not None:
            b = min(b, stop.max_frames - stats.total_words)
            if b <= 0:
                break
        sym_errs, bit_errs, uncoded, iters = jax.device_get(
            batch_step(jax.random.fold_in(root, batch_idx))
        )
        sym_errs, bit_errs, uncoded, iters = (
            sym_errs[:b], bit_errs[:b], uncoded[:b], iters[:b],
        )
        stats.total_words += b
        stats.total_symbols += b * code.n
        stats.total_bits += b * code.n * m
        stats.symbol_errors += int(sym_errs.sum())
        stats.bit_errors += int(bit_errs.sum())
        stats.uncoded_symbol_errors += int(uncoded.sum())
        stats.word_errors += int((sym_errs > 0).sum())
        stats.total_iterations += int(iters.sum())
        batch_idx += 1
    stats.wall_seconds = time.perf_counter() - t0
    return stats
