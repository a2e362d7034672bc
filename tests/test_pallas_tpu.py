"""Fused Pallas kernel parity on REAL TPU hardware (Mosaic lowering).

CI runs CPU-only, where the kernel executes in interpret mode; the actual
Mosaic compilation (per-lane variable shifts, float-exponent ctz, per-level
DMA streaming of choices, W%128 slicing) is only exercised on a TPU. These
tests are skipped on CPU and run by the TPU verify flow:

    JAX_PLATFORMS='' python -m pytest tests/test_pallas_tpu.py -q -p no:cacheprovider

(tests/conftest.py forces jax to CPU for the rest of the suite; this module
re-checks the backend at runtime.)
"""
import dataclasses
import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _tpu_or_skip():
    if jax.default_backend() == "cpu":
        pytest.skip("needs TPU (Mosaic lowering); CPU runs interpret mode")


def _run_both(pairs, span, frees_row=(0, 0, 0, 0), distance="affine",
              heuristic=None):
    from pywfa_tpu.align import WavefrontAligner
    from pywfa_tpu.batch import PATTERN_SENTINEL, TEXT_SENTINEL, encode_batch
    from pywfa_tpu.ops import engine as E
    from pywfa_tpu.ops.pallas import fused_loop

    B = len(pairs)
    maxLp = max(len(p) for p, _ in pairs)
    maxLt = max(len(t) for _, t in pairs)
    api = WavefrontAligner(backend="numpy", span=span, distance=distance)
    attr = api._attributes()
    if heuristic is not None:
        attr = dataclasses.replace(attr, heuristic=heuristic)
    cfg = E.full_config(attr, maxLp, maxLt)
    assert fused_loop.supported(cfg)
    C = cfg.extend_chunk
    pat = jnp.asarray(encode_batch([p.encode() for p, _ in pairs],
                                   cfg.Lp, C, PATTERN_SENTINEL))
    txt = jnp.asarray(encode_batch([t.encode() for _, t in pairs],
                                   cfg.Lt, C, TEXT_SENTINEL))
    plen = jnp.asarray([len(p) for p, _ in pairs], dtype=jnp.int32)
    tlen = jnp.asarray([len(t) for _, t in pairs], dtype=jnp.int32)
    frees = jnp.tile(jnp.asarray([frees_row], dtype=jnp.int32), (B, 1))
    ms = jnp.int32(2**31 - 1)
    ref = E.align_batch(cfg, pat, txt, plen, tlen, frees, ms)
    bits = E.build_eq_bits(cfg, pat, txt)
    out = fused_loop.align_batch_pallas(cfg, B, bits, plen, tlen, frees, ms)
    for key in ("status", "final_s", "end_k", "end_off"):
        np.testing.assert_array_equal(np.asarray(out[key]),
                                      np.asarray(ref[key]), err_msg=key)
    np.testing.assert_array_equal(np.asarray(out["choices"]),
                                  np.asarray(ref["choices"]))


def _pairs(seed, n=8, lo=30, hi=150, sub=0.12, ind=0.08):
    from tests.corpus import random_pairs
    return random_pairs(seed, n, lo, hi, sub, ind)


def test_tpu_affine_end2end():
    _tpu_or_skip()
    _run_both(_pairs(31), "end-to-end")


def test_tpu_affine_endsfree():
    _tpu_or_skip()
    _run_both(_pairs(32), "ends-free", frees_row=(4, 4, 4, 4))


def test_tpu_affine2p():
    _tpu_or_skip()
    _run_both(_pairs(33), "end-to-end", distance="affine2p")


def test_tpu_wfadaptive():
    _tpu_or_skip()
    from pywfa_tpu.attributes import HeuristicParams
    from pywfa_tpu.constants import HeuristicStrategy
    h = HeuristicParams(strategy=HeuristicStrategy.WFADAPTIVE,
                        min_wavefront_length=5, max_distance_threshold=15,
                        steps_between_cutoffs=1)
    _run_both(_pairs(34, sub=0.2, ind=0.15), "end-to-end", heuristic=h)


def test_tpu_full_pipeline_batch():
    """End-to-end through batch.align_pairs on the default (Pallas) path."""
    _tpu_or_skip()
    from pywfa_tpu import batch as B
    from pywfa_tpu.align import WavefrontAligner
    from pywfa_tpu.oracle import OracleAligner
    pairs = _pairs(35, n=48, sub=0.05, ind=0.03, lo=140, hi=150)
    api = WavefrontAligner(backend="numpy")
    attr = api._attributes()
    res = B.align_pairs(attr, [p.encode() for p, _ in pairs],
                        [t.encode() for _, t in pairs])
    orc = OracleAligner(attr)
    for i, (p, t) in enumerate(pairs):
        o = orc.align(p.encode(), t.encode())
        assert (res[i].status, res[i].score, res[i].ops) == \
            (o.status, o.score, o.ops), i


def test_tpu_drops():
    _tpu_or_skip()
    from pywfa_tpu.attributes import HeuristicParams
    from pywfa_tpu.constants import HeuristicStrategy
    hz = HeuristicParams(strategy=HeuristicStrategy.ZDROP, zdrop=12,
                         steps_between_cutoffs=1)
    _run_both(_pairs(36, sub=0.3, ind=0.2), "end-to-end", heuristic=hz)
    hx = HeuristicParams(strategy=HeuristicStrategy.XDROP, xdrop=10,
                         steps_between_cutoffs=1)
    _run_both(_pairs(37, sub=0.3, ind=0.2), "end-to-end", heuristic=hx)


def test_tpu_affine2p_drops():
    """affine2p combined with x-drop/z-drop on hardware (VERDICT r3
    item 5: the 5-component kernel with in-loop drops)."""
    _tpu_or_skip()
    from pywfa_tpu.attributes import HeuristicParams
    from pywfa_tpu.constants import HeuristicStrategy
    hz = HeuristicParams(strategy=HeuristicStrategy.ZDROP, zdrop=12,
                         steps_between_cutoffs=1)
    _run_both(_pairs(38, sub=0.3, ind=0.2), "end-to-end",
              distance="affine2p", heuristic=hz)
    hx = HeuristicParams(strategy=HeuristicStrategy.XDROP, xdrop=10,
                         steps_between_cutoffs=1)
    _run_both(_pairs(39, sub=0.3, ind=0.2), "end-to-end",
              distance="affine2p", heuristic=hx)


def test_tpu_wfmash_banded():
    """wfmash + banded static/adaptive strategies on hardware."""
    _tpu_or_skip()
    from pywfa_tpu.attributes import HeuristicParams
    from pywfa_tpu.constants import HeuristicStrategy
    hm = HeuristicParams(strategy=HeuristicStrategy.WFMASH,
                         min_wavefront_length=5, max_distance_threshold=12,
                         steps_between_cutoffs=1)
    _run_both(_pairs(49, sub=0.25, ind=0.15), "end-to-end", heuristic=hm)
    hs = HeuristicParams(strategy=HeuristicStrategy.BANDED_STATIC,
                         min_k=-12, max_k=12, steps_between_cutoffs=1)
    _run_both(_pairs(50, sub=0.2, ind=0.15), "end-to-end", heuristic=hs)
    ha = HeuristicParams(strategy=HeuristicStrategy.BANDED_ADAPTIVE,
                         min_k=-10, max_k=10, steps_between_cutoffs=2)
    _run_both(_pairs(51, sub=0.25, ind=0.15), "end-to-end", heuristic=ha)


def test_tpu_linear_edit_indel():
    """1-component metrics through the Mosaic-lowered kernel (linear /
    edit / indel compute branches; VERDICT r4 item 3)."""
    _tpu_or_skip()
    _run_both(_pairs(45), "end-to-end", distance="linear")
    _run_both(_pairs(46), "end-to-end", distance="levenshtein")
    _run_both(_pairs(47, sub=0.0, ind=0.2), "end-to-end", distance="indel")


def test_tpu_match_bonus_endsfree():
    """match != 0 ends-free on hardware: per-score boundary seeding
    in-kernel (Mosaic lowering of the ef_seeding path)."""
    _tpu_or_skip()
    from pywfa_tpu.align import WavefrontAligner
    from pywfa_tpu.batch import PATTERN_SENTINEL, TEXT_SENTINEL, encode_batch
    from pywfa_tpu.ops import engine as E
    from pywfa_tpu.ops.pallas import fused_loop

    pairs = _pairs(52)
    maxL = max(max(len(p), len(t)) for p, t in pairs)
    attr = WavefrontAligner(backend="numpy", span="ends-free",
                            pattern_begin_free=5, pattern_end_free=5,
                            text_begin_free=5, text_end_free=5, match=-2,
                            mismatch=5, gap_opening=7,
                            gap_extension=2)._attributes()
    cfg = E.full_config(attr, maxL, maxL)
    assert fused_loop.supported(cfg) and cfg.match != 0
    C = cfg.extend_chunk
    pat = jnp.asarray(encode_batch([p.encode() for p, _ in pairs],
                                   cfg.Lp, C, PATTERN_SENTINEL))
    txt = jnp.asarray(encode_batch([t.encode() for _, t in pairs],
                                   cfg.Lt, C, TEXT_SENTINEL))
    plen = jnp.asarray([len(p) for p, _ in pairs], dtype=jnp.int32)
    tlen = jnp.asarray([len(t) for _, t in pairs], dtype=jnp.int32)
    frees = jnp.tile(jnp.asarray([[5, 5, 5, 5]], jnp.int32),
                     (len(pairs), 1))
    ms = jnp.int32(2**31 - 1)
    ref = E.align_batch(cfg, pat, txt, plen, tlen, frees, ms)
    bits = E.build_eq_bits(cfg, pat, txt)
    out = fused_loop.align_batch_pallas(cfg, len(pairs), bits, plen, tlen,
                                        frees, ms)
    for key in ("status", "final_s", "end_k", "end_off"):
        np.testing.assert_array_equal(np.asarray(out[key]),
                                      np.asarray(ref[key]), err_msg=key)
    np.testing.assert_array_equal(np.asarray(out["choices"]),
                                  np.asarray(ref["choices"]))


def test_tpu_match_bonus():
    """match != 0 end-to-end on hardware (swg_match in-kernel)."""
    _tpu_or_skip()
    from pywfa_tpu.align import WavefrontAligner
    from pywfa_tpu.batch import PATTERN_SENTINEL, TEXT_SENTINEL, encode_batch
    from pywfa_tpu.ops import engine as E
    from pywfa_tpu.ops.pallas import fused_loop

    pairs = _pairs(48)
    maxL = max(max(len(p), len(t)) for p, t in pairs)
    attr = WavefrontAligner(backend="numpy", span="end-to-end", match=-3,
                            mismatch=5, gap_opening=7,
                            gap_extension=2)._attributes()
    cfg = E.full_config(attr, maxL, maxL)
    assert fused_loop.supported(cfg) and cfg.match != 0
    C = cfg.extend_chunk
    pat = jnp.asarray(encode_batch([p.encode() for p, _ in pairs],
                                   cfg.Lp, C, PATTERN_SENTINEL))
    txt = jnp.asarray(encode_batch([t.encode() for _, t in pairs],
                                   cfg.Lt, C, TEXT_SENTINEL))
    plen = jnp.asarray([len(p) for p, _ in pairs], dtype=jnp.int32)
    tlen = jnp.asarray([len(t) for _, t in pairs], dtype=jnp.int32)
    frees = jnp.zeros((len(pairs), 4), jnp.int32)
    ms = jnp.int32(2**31 - 1)
    ref = E.align_batch(cfg, pat, txt, plen, tlen, frees, ms)
    bits = E.build_eq_bits(cfg, pat, txt)
    out = fused_loop.align_batch_pallas(cfg, len(pairs), bits, plen, tlen,
                                        frees, ms)
    for key in ("status", "final_s", "end_k", "end_off"):
        np.testing.assert_array_equal(np.asarray(out[key]),
                                      np.asarray(ref[key]), err_msg=key)
    np.testing.assert_array_equal(np.asarray(out["choices"]),
                                  np.asarray(ref["choices"]))


def test_tpu_1kb_shape():
    """1 kb reads through the kernel (the shape routed per the 1 kb
    measurement in fused_loop.routed_tile; W=256-class band)."""
    _tpu_or_skip()
    _run_both(_pairs(40, n=8, lo=900, hi=1000, sub=0.02, ind=0.01),
              "end-to-end")
