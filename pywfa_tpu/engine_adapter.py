"""Single-pair adapter onto the batched JAX engine.

Buckets (pattern_len, text_len, config) into padded shapes so repeated
single-pair calls hit the jit compile cache, and exposes the same result
type as the NumPy oracle. Falls back to reporting unavailability until the
JAX engine is importable.
"""
from __future__ import annotations

from typing import Optional

from .attributes import AlignerAttributes


def available() -> bool:
    # The batched JAX engine lands in pywfa_tpu.ops.engine; flip this on
    # once its single-pair path passes the oracle parity suite.
    return False


def align_single(attr: AlignerAttributes, pattern: bytes, text: bytes,
                 wildcard: Optional[int]):
    raise NotImplementedError("JAX engine adapter not wired yet")
