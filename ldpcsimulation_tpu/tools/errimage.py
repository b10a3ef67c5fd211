"""Error-pattern imaging: matrices of decisions/syndromes -> PNG heatmaps.

Reference counterpart: ``C_implementations/src/errtopng.cpp`` (libpng
renderer of error-pattern matrices, plus per-iteration error-count traces
``:28-110``).  Output here goes through matplotlib; the ``.err``-style
per-iteration error-count trace is reproduced as a text file.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

__all__ = ["error_matrix_png", "error_count_trace", "decisions_to_errors"]


def decisions_to_errors(decisions: np.ndarray, truth: np.ndarray) -> np.ndarray:
    """[T, N] ±1 decision trace + [N] truth -> [T, N] 0/1 error matrix."""
    return (np.asarray(decisions) != np.asarray(truth)[None, :]).astype(
        np.uint8
    )


def error_matrix_png(
    matrix: np.ndarray,
    path: str,
    title: Optional[str] = None,
    scale: int = 1,
) -> None:
    """Render a 0/1 (or integer) matrix as a PNG heatmap.

    Rows = iterations, columns = bit positions (errtopng's layout).
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    m = np.asarray(matrix)
    fig, ax = plt.subplots(
        figsize=(max(4, m.shape[1] / 100), max(2, m.shape[0] / 50))
    )
    ax.imshow(m, aspect="auto", interpolation="nearest", cmap="viridis")
    ax.set_xlabel("bit index")
    ax.set_ylabel("iteration")
    if title:
        ax.set_title(title)
    fig.tight_layout()
    fig.savefig(path, dpi=100 * scale)
    plt.close(fig)


def error_count_trace(matrix: np.ndarray, path: str) -> None:
    """Per-iteration error counts (the ``.err`` trace,
    errtopng.cpp ``countErrorTrace``)."""
    m = np.asarray(matrix)
    with open(path, "w") as f:
        for it, row in enumerate(m):
            f.write(f"{it}\t{int(row.sum())}\n")
