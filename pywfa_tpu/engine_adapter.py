"""Single-pair adapter onto the batched JAX engine.

Buckets (pattern_len, text_len) into padded shapes so repeated single-pair
calls hit the jit compile cache, and returns the same result type as the
NumPy oracle. Rare non-clean outcomes (drops, partials) are delegated to the
oracle inside pywfa_tpu.batch for byte-faithful failure semantics.
"""
from __future__ import annotations

from typing import Optional

from .attributes import AlignerAttributes
from .oracle import OracleResult


def available() -> bool:
    try:
        import jax  # noqa: F401
        return True
    except Exception:
        return False


def _bucket(n: int) -> int:
    """Round a length up to a shape bucket (parallel.bucketing schedule,
    so single-pair calls and batch calls share compile-cache shapes)."""
    from .parallel.bucketing import DEFAULT_SCHEDULE, _bucket_len
    return _bucket_len(n, DEFAULT_SCHEDULE)


def align_single(attr: AlignerAttributes, pattern: bytes, text: bytes,
                 wildcard: Optional[int]) -> OracleResult:
    from .batch import align_pairs
    from .ops.engine import full_config

    plen, tlen = len(pattern), len(text)
    if plen == 0 or text is None:
        # degenerate; oracle handles edge semantics
        from .oracle import OracleAligner
        return OracleAligner(attr, wildcard).align(pattern, text)
    Lp = _bucket(plen)
    Lt = _bucket(tlen)
    from .attributes import validate_alignment
    attr0 = validate_alignment(attr, plen, tlen)
    # caps escalate inside align_pairs; bucketed Lp/Lt keep shapes stable
    res = align_pairs(attr0, [pattern], [text], wildcard=wildcard,
                      Lp=Lp, Lt=Lt)[0]
    return OracleResult(status=res.status, score=res.score, ops=res.ops,
                        end_v=res.end_v, end_h=res.end_h,
                        wf_score=res.wf_score, dropped=res.dropped)
