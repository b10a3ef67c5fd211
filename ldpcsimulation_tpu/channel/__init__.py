"""Channel layer: BPSK/AWGN, LLR conversion, quantizers."""

from .awgn import (
    MAXLLR,
    awgn,
    bpsk,
    llr_from_channel,
    n0_to_sigma,
    snr_to_n0,
    snr_to_sigma,
)
from .quantize import (
    quantize_no_zero,
    quantize_round,
    quantize_threshold_table,
    saturate,
)

__all__ = [
    "MAXLLR",
    "awgn",
    "bpsk",
    "llr_from_channel",
    "n0_to_sigma",
    "snr_to_n0",
    "snr_to_sigma",
    "quantize_no_zero",
    "quantize_round",
    "quantize_threshold_table",
    "saturate",
]
