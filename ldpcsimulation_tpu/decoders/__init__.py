"""Decoder algorithms (see each module for reference citations)."""

from .base import DecodeResult, check_satisfied, syndrome_from_hard
from .bp import decode_bp
from .ddbmp import decode_ddbmp, decode_ddbmp_qc
from .gdbf import GDBFConfig, GDBFResult, PRESETS, decode_gdbf, preset
from .minsum import decode_minsum
from .minsum_layered import decode_minsum_layered_qc
from .minsum_qc import decode_minsum_qc
from .nb_qspa import NBDecodeResult, decode_nb_qspa
from .ngdbf_hw import NGDBFHwConfig, NGDBFHwResult, decode_ngdbf_hw
from .ngdbf_systemc import SystemCNGDBFConfig, decode_ngdbf_systemc

__all__ = [
    "DecodeResult",
    "check_satisfied",
    "syndrome_from_hard",
    "decode_bp",
    "decode_ddbmp",
    "decode_ddbmp_qc",
    "GDBFConfig",
    "GDBFResult",
    "PRESETS",
    "decode_gdbf",
    "preset",
    "decode_minsum",
    "decode_minsum_layered_qc",
    "decode_minsum_qc",
    "NBDecodeResult",
    "decode_nb_qspa",
    "NGDBFHwConfig",
    "NGDBFHwResult",
    "decode_ngdbf_hw",
    "SystemCNGDBFConfig",
    "decode_ngdbf_systemc",
    "decode_nb_minsum",
    "decode_bp_layered_qc",
    "decode_bp_qc",
    "decode_minsum_stratified",
]
from .nb_minsum import decode_nb_minsum  # noqa: F401,E402
from .bp_layered import decode_bp_layered_qc  # noqa: F401,E402
from .bp_qc import decode_bp_qc  # noqa: F401,E402
from .minsum_stratified import decode_minsum_stratified  # noqa: F401,E402
from .minsum_layered import decode_minsum_layered_qc  # noqa: F401,E402
