"""Fused Pallas loop kernel vs the XLA engine (interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pywfa_tpu.align import WavefrontAligner
from pywfa_tpu.batch import PATTERN_SENTINEL, TEXT_SENTINEL, encode_batch
from pywfa_tpu.ops import engine as E
from pywfa_tpu.ops.pallas import fused_loop


def _run_both(pairs, span, frees_row=(0, 0, 0, 0), distance="affine",
              heuristic=None, **api_kw):
    import dataclasses
    B = len(pairs)
    maxLp = max(len(p) for p, _ in pairs)
    maxLt = max(len(t) for _, t in pairs)
    api = WavefrontAligner(backend="numpy", span=span, distance=distance,
                           **api_kw)
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


def test_end2end_matches_xla():
    pairs = [
        ("TCTTTACTCGCGCGTTGGAGAAATACAATAGT",
         "TCTATACTGCGCGTTTGGAGAAATAAAATAGT"),
        ("AATTAATTTAAGTCTAGGCTACTTTCGGTACTTTGTTCTT",
         "AATTTAAGTCTAGGCTACTTTCGGTACTTTCTT"),
        ("ACGTACGT", "ACGTACGT"),
        ("AAAACCCC", "TTTTGGGG"),
    ]
    _run_both(pairs, "end-to-end")


def test_endsfree_matches_xla():
    pairs = [
        ("AAAAACCTTTTTAAAAAA", "GGCCAAAAACCAAAAAA"),
        ("GGGGAAAAACC", "AAAAACCGGGG"),
        ("AAAAACC", "CCCCCAAAAACCTTTTT"),
        ("ACGT", "ACGT"),
    ]
    _run_both(pairs, "ends-free")
    _run_both(pairs, "ends-free", frees_row=(2, 2, 2, 2))


def _divergent_pairs(seed, n=6, lo=30, hi=120, sub=0.15, ind=0.1):
    from tests.corpus import random_pairs
    return random_pairs(seed, n, lo, hi, sub, ind)


def test_affine2p_matches_xla():
    """affine2p (5-component ring) in the fused kernel, default 2p
    penalties 24/1 (reference: wavefront_compute_affine2p.c:45-106)."""
    _run_both(_divergent_pairs(21), "end-to-end", distance="affine2p")
    _run_both(_divergent_pairs(22), "ends-free", distance="affine2p",
              frees_row=(3, 3, 3, 3))


def test_linear_matches_xla():
    """Gap-linear (1-component ring) in the fused kernel
    (reference: wavefront_compute_linear.c:44-86)."""
    _run_both(_divergent_pairs(61), "end-to-end", distance="linear")
    _run_both(_divergent_pairs(62), "ends-free", distance="linear",
              frees_row=(3, 3, 3, 3))


def test_edit_indel_match_xla():
    """Edit and indel metrics (1-component, all candidates from s-1)
    (reference: wavefront_compute_edit.c:330-374)."""
    _run_both(_divergent_pairs(63), "end-to-end", distance="levenshtein")
    _run_both(_divergent_pairs(64, sub=0.0, ind=0.2), "end-to-end",
              distance="indel")
    _run_both(_divergent_pairs(65), "ends-free", distance="levenshtein",
              frees_row=(2, 2, 2, 2))


def test_match_bonus_endsfree_matches_xla():
    """match != 0 on ENDS_FREE: the per-score boundary seeding
    (engine._endsfree_seed) runs in-kernel, incl. the phantom null-step
    wavefront and the no-trim seeded band."""
    from pywfa_tpu.attributes import HeuristicParams
    from pywfa_tpu.constants import HeuristicStrategy
    _run_both(_divergent_pairs(68), "ends-free", frees_row=(6, 6, 6, 6),
              match=-2, mismatch=5, gap_opening=7, gap_extension=2)
    _run_both(_divergent_pairs(69, sub=0.25, ind=0.15), "ends-free",
              frees_row=(4, 4, 8, 8), match=-3, mismatch=4,
              gap_opening=6, gap_extension=2, distance="affine2p")
    hz = HeuristicParams(strategy=HeuristicStrategy.ZDROP, zdrop=14,
                         steps_between_cutoffs=1)
    _run_both(_divergent_pairs(70, sub=0.3, ind=0.2), "ends-free",
              frees_row=(5, 5, 5, 5), match=-2, mismatch=5,
              gap_opening=7, gap_extension=2, heuristic=hz)


def test_match_bonus_end2end_matches_xla():
    """match != 0 (Eizenga-transformed penalties) on the END_TO_END span:
    the kernel runs the identical match-0 internal recurrence; only the
    drop heuristics' swg_match constant differs
    (engine._heuristic_cutoff parity)."""
    from pywfa_tpu.attributes import HeuristicParams
    from pywfa_tpu.constants import HeuristicStrategy
    _run_both(_divergent_pairs(66), "end-to-end", match=-3, mismatch=5,
              gap_opening=7, gap_extension=2)
    hz = HeuristicParams(strategy=HeuristicStrategy.ZDROP, zdrop=14,
                         steps_between_cutoffs=1)
    _run_both(_divergent_pairs(67, sub=0.3, ind=0.2), "end-to-end",
              match=-2, mismatch=6, gap_opening=8, gap_extension=2,
              heuristic=hz)


def test_wfadaptive_matches_xla():
    """WF-adaptive band shrink inside the kernel
    (reference: wavefront_heuristic.c:176-293)."""
    from pywfa_tpu.attributes import HeuristicParams
    from pywfa_tpu.constants import HeuristicStrategy
    h = HeuristicParams(strategy=HeuristicStrategy.WFADAPTIVE,
                        min_wavefront_length=5, max_distance_threshold=15,
                        steps_between_cutoffs=1)
    _run_both(_divergent_pairs(23, sub=0.25, ind=0.15), "end-to-end",
              heuristic=h)
    h2 = HeuristicParams(strategy=HeuristicStrategy.WFADAPTIVE,
                         min_wavefront_length=3, max_distance_threshold=10,
                         steps_between_cutoffs=2)
    _run_both(_divergent_pairs(24, sub=0.3, ind=0.2), "end-to-end",
              distance="affine2p", heuristic=h2)


def test_lcp_table_hmajor_matches_xla_builder():
    """The Pallas H-major LCP builder (interpret mode on CPU) must equal
    the XLA skew+cummin builder transposed, incl. wildcards, mixed
    lengths, and the sentinel region."""
    import numpy as np
    import jax.numpy as jnp
    from pywfa_tpu import batch as BT
    from pywfa_tpu.ops import engine as E
    from pywfa_tpu.ops.pallas import lcp_table as LT
    from pywfa_tpu.align import WavefrontAligner
    from pywfa_tpu.attributes import validate_alignment
    import dataclasses

    rng = np.random.default_rng(3)
    al = np.frombuffer(b"ACGTN", np.uint8)
    B, L = 9, 37
    pats = [al[rng.integers(0, 5, rng.integers(5, L + 1))].tobytes()
            for _ in range(B)]
    txts = [al[rng.integers(0, 5, rng.integers(5, L + 1))].tobytes()
            for _ in range(B)]
    attr = validate_alignment(
        WavefrontAligner(backend="numpy", span="end-to-end")._attributes(),
        L, L)
    cfg = E.full_config(attr, L, L, W=64, S_cap=64)
    C = cfg.extend_chunk
    pat = jnp.asarray(BT.encode_batch(pats, cfg.Lp, C, BT.PATTERN_SENTINEL))
    txt = jnp.asarray(BT.encode_batch(txts, cfg.Lt, C, BT.TEXT_SENTINEL))
    for wc in (-1, ord("N")):
        c = dataclasses.replace(cfg, wildcard=wc)
        ref = np.asarray(E._build_lcp_table(c, pat, txt))
        got = np.asarray(LT.build_lcp_table_hmajor(
            c.W, c.kmin, wc, True, pat, txt))
        np.testing.assert_array_equal(got.transpose(1, 2, 0), ref)


def test_lcp_hmajor_gate_rejects_long_reads():
    """Shapes that would overflow int16 runs or VMEM must route to the
    W-major XLA builder (review-found: a 32,800-base match run stored as
    -32736 when the gate let Ltp>=32768 through)."""
    from pywfa_tpu.ops.pallas import lcp_table as LT
    assert not LT.supported(32900, 8, 2)
    assert not LT.supported(4096, 128, 2)
    assert LT.supported(256, 128, 2)
    # a huge pattern row must also be rejected (input block VMEM)
    assert not LT.supported(2048, 64, 2, Lpp=200_000)


def test_lcp_hmajor_cross_block_carry():
    """Runs spanning the 128-position h-block boundary (the scratch carry
    between grid steps)."""
    import numpy as np
    import jax.numpy as jnp
    from pywfa_tpu import batch as BT
    from pywfa_tpu.ops import engine as E
    from pywfa_tpu.ops.pallas import lcp_table as LT
    from pywfa_tpu.align import WavefrontAligner
    from pywfa_tpu.attributes import validate_alignment

    L = 300  # Ltp_pad = 384 -> 3 h-blocks
    seq = (b"ACGT" * 80)[:L]
    attr = validate_alignment(
        WavefrontAligner(backend="numpy", span="end-to-end")._attributes(),
        L, L)
    cfg = E.full_config(attr, L, L, W=64, S_cap=64)
    C = cfg.extend_chunk
    pat = jnp.asarray(BT.encode_batch([seq], cfg.Lp, C, BT.PATTERN_SENTINEL))
    txt = jnp.asarray(BT.encode_batch([seq], cfg.Lt, C, BT.TEXT_SENTINEL))
    ref = np.asarray(E._build_lcp_table(cfg, pat, txt))
    got = np.asarray(LT.build_lcp_table_hmajor(
        cfg.W, cfg.kmin, -1, True, pat, txt))
    np.testing.assert_array_equal(got.transpose(1, 2, 0), ref)
    # the k=0 diagonal run at h=0 must span the full identical sequence
    w0 = -cfg.kmin
    assert ref[0, w0, 0] == L


def test_match_classes_kernel():
    """Class-mask matching through the fused kernel: the eq-bits stream
    already encodes the class-mask compare (engine._build_eq_bits /
    _eq_skew), so IUPAC configs route to and agree with the kernel."""
    import numpy as np
    import jax.numpy as jnp
    pairs = [("ACGTNNACGTRYACGT", "ACGTACACGTAGACGT"),
             ("ACGTACGTACGT", "ACGTNCGTACGT"),
             ("NNNNNNNN", "ACGTACGT"),
             ("ACGTWSKM", "ACGTATGC")]
    attr = WavefrontAligner(backend="numpy", span="end-to-end",
                            match_classes="iupac")._attributes()
    cfg = E.full_config(attr, 16, 16)
    assert fused_loop.supported(cfg) and fused_loop.routed_tile(cfg)
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


def test_wfmash_banded_match_xla():
    """wfmash (length-normalized wf-adaptive) and banded static/adaptive
    inside the kernel (reference: wavefront_heuristic.c:308-335,454-505)."""
    from pywfa_tpu.attributes import HeuristicParams
    from pywfa_tpu.constants import HeuristicStrategy
    hm = HeuristicParams(strategy=HeuristicStrategy.WFMASH,
                         min_wavefront_length=5, max_distance_threshold=12,
                         steps_between_cutoffs=1)
    _run_both(_divergent_pairs(71, sub=0.25, ind=0.15), "end-to-end",
              heuristic=hm)
    hs = HeuristicParams(strategy=HeuristicStrategy.BANDED_STATIC,
                         min_k=-12, max_k=12, steps_between_cutoffs=1)
    _run_both(_divergent_pairs(72, sub=0.2, ind=0.15), "end-to-end",
              heuristic=hs)
    ha = HeuristicParams(strategy=HeuristicStrategy.BANDED_ADAPTIVE,
                         min_k=-10, max_k=10, steps_between_cutoffs=2)
    _run_both(_divergent_pairs(73, sub=0.25, ind=0.15), "end-to-end",
              heuristic=ha)
    # combo: banded static + z-drop through the same cascade
    hc = HeuristicParams(strategy=(HeuristicStrategy.BANDED_STATIC
                                   | HeuristicStrategy.ZDROP),
                         min_k=-10, max_k=10, zdrop=15,
                         steps_between_cutoffs=1)
    _run_both(_divergent_pairs(74, sub=0.3, ind=0.2), "end-to-end",
              heuristic=hc)


def test_drops_match_xla():
    """X-drop pruning and Z-drop abandonment inside the fused kernel
    (reference: wavefront_heuristic.c:338-450), incl. historic-max end
    positions for dropped pairs."""
    from pywfa_tpu.attributes import HeuristicParams
    from pywfa_tpu.constants import HeuristicStrategy
    hz = HeuristicParams(strategy=HeuristicStrategy.ZDROP, zdrop=12,
                         steps_between_cutoffs=1)
    _run_both(_divergent_pairs(41, sub=0.3, ind=0.2), "end-to-end",
              heuristic=hz)
    hx = HeuristicParams(strategy=HeuristicStrategy.XDROP, xdrop=10,
                         steps_between_cutoffs=1)
    _run_both(_divergent_pairs(42, sub=0.3, ind=0.2), "end-to-end",
              heuristic=hx)
    hc = HeuristicParams(strategy=(HeuristicStrategy.WFADAPTIVE
                                   | HeuristicStrategy.ZDROP),
                         min_wavefront_length=5, max_distance_threshold=15,
                         zdrop=15, steps_between_cutoffs=1)
    _run_both(_divergent_pairs(43, sub=0.3, ind=0.2), "end-to-end",
              heuristic=hc)
    hz2 = HeuristicParams(strategy=HeuristicStrategy.ZDROP, zdrop=12,
                          steps_between_cutoffs=2)
    _run_both(_divergent_pairs(44, sub=0.35, ind=0.2), "ends-free",
              frees_row=(5, 5, 5, 5), heuristic=hz2)


def test_score_only_matches_xla():
    """The no-choices kernel variant (scope=score: no traceback record,
    no choice DMAs) must produce identical meta results."""
    import dataclasses
    pairs = _divergent_pairs(51, sub=0.2, ind=0.12)
    maxLp = max(len(p) for p, _ in pairs)
    maxLt = max(len(t) for _, t in pairs)
    attr = WavefrontAligner(backend="numpy", span="end-to-end")._attributes()
    cfg = E.full_config(attr, maxLp, maxLt, record_choices=False)
    assert fused_loop.supported(cfg)
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
    assert "choices" not in out
    for key in ("status", "final_s", "end_k", "end_off"):
        np.testing.assert_array_equal(np.asarray(out[key]),
                                      np.asarray(ref[key]), err_msg=key)
