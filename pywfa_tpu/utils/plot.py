"""Wavefront plotting: record band evolution and render a heatmap.

Analog of WFA2-lib's wavefront_plot.c + utils/heatmap.c: tracks, per score
step, which DP-matrix cells the M-wavefront visited, for visual debugging of
band growth and heuristic pruning. Text rendering only (no plotting deps).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np


@dataclass
class WavefrontPlot:
    """Accumulates (score, k, offset) samples of the M-wavefront."""

    pattern_length: int
    text_length: int
    resolution: int = 100  # max grid dimension of the rendered heatmap
    # per-step records: (score, lo, hi, offsets-in-band)
    steps: List[Tuple[int, int, int, np.ndarray]] = field(default_factory=list)

    def record(self, score: int, lo: int, hi: int, offsets: np.ndarray) -> None:
        self.steps.append((score, lo, hi, offsets.copy()))

    def to_grid(self) -> np.ndarray:
        """Dense [v-bins, h-bins] grid of the first score visiting each cell.

        -1 = never visited (the reference heatmap's empty cells).
        """
        ph = max(1, self.pattern_length)
        th = max(1, self.text_length)
        sv = max(1, (ph + self.resolution - 1) // self.resolution)
        sh = max(1, (th + self.resolution - 1) // self.resolution)
        grid = np.full(((ph + sv - 1) // sv, (th + sh - 1) // sh), -1,
                       dtype=np.int64)
        for score, lo, hi, offs in self.steps:
            for i, k in enumerate(range(lo, hi + 1)):
                h = int(offs[i])
                if h < 0:
                    continue
                v = h - k
                if 0 <= v < ph and 0 <= h < th:
                    cell = grid[v // sv, h // sh]
                    if cell < 0:
                        grid[v // sv, h // sh] = score
        return grid

    def to_text(self, width: int = 80) -> str:
        """ASCII heatmap: '.' unvisited, digits/letters = score decile."""
        grid = self.to_grid()
        if grid.size == 0:
            return "(empty)"
        smax = max(1, int(grid.max()))
        chars = "0123456789abcdefghijklmnopqrstuvwxyz"
        rows = []
        for r in range(grid.shape[0]):
            row = []
            for c in range(grid.shape[1]):
                s = grid[r, c]
                if s < 0:
                    row.append(".")
                else:
                    row.append(chars[min(len(chars) - 1,
                                         s * (len(chars) - 1) // smax)])
            rows.append("".join(row))
        return "\n".join(rows)

    def save_tsv(self, path: str) -> None:
        with open(path, "w") as fh:
            fh.write("score\tk\toffset\n")
            for score, lo, hi, offs in self.steps:
                for i, k in enumerate(range(lo, hi + 1)):
                    if offs[i] >= 0:
                        fh.write(f"{score}\t{k}\t{int(offs[i])}\n")


def plot_alignment(pattern: str, text: str, resolution: int = 100,
                   **aligner_kwargs) -> WavefrontPlot:
    """Align with the oracle while recording the wavefront evolution."""
    from ..align import WavefrontAligner
    from ..oracle import OracleAligner

    api = WavefrontAligner(backend="numpy", **aligner_kwargs)
    attr = api._attributes()
    plot = WavefrontPlot(len(pattern), len(text), resolution)
    orc = OracleAligner(attr)
    orc.plot = plot
    orc.align(pattern.upper().encode(), text.upper().encode())
    return plot
