"""Experiment tools: sweep CLI, replay/tracing, error imaging, redecode
statistics — the reference's scripts/ + post-processing layer, native."""

from .errimage import decisions_to_errors, error_count_trace, error_matrix_png
from .redecode_stats import redecode_statistics
from .replay import GDBFTrace, replay_channel, trace_gdbf, write_trace

__all__ = [
    "decisions_to_errors",
    "error_count_trace",
    "error_matrix_png",
    "redecode_statistics",
    "GDBFTrace",
    "replay_channel",
    "trace_gdbf",
    "write_trace",
]
