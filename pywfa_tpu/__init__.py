"""pywfa_tpu: TPU-native wavefront sequence alignment.

A from-scratch JAX/Pallas re-design of the capabilities of pywfa/WFA2-lib:
exact gap-affine / dual-affine / linear / edit / indel wavefront alignment
with full-CIGAR traceback, end-to-end and ends-free spans, score-only mode,
and adaptive/X-drop/Z-drop/banded pruning — executed as batched SPMD kernels
over padded diagonal-band tensors.

Public pywfa-parity surface (reference: pywfa/__init__.py:1-6):
    WavefrontAligner, clip_cigartuples, cigartuples_to_str,
    elide_mismatches_from_cigar

TPU-native batched surface:
    pywfa_tpu.batch.BatchWavefrontAligner
"""
from .align import (  # noqa: F401
    AlignmentResult,
    WavefrontAligner,
    clip_cigartuples,
    cigartuples_to_str,
    elide_mismatches_from_cigar,
)

__version__ = "0.1.0"

__all__ = [
    "WavefrontAligner",
    "AlignmentResult",
    "clip_cigartuples",
    "cigartuples_to_str",
    "elide_mismatches_from_cigar",
]
