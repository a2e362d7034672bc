"""Generalized match-equivalence classes (the tensor form of the
reference's lambda match-function mode, wavefront_align.c:150-178 +
wavefront_sequences.c:228-252): engine-vs-oracle byte parity with IUPAC
ambiguity codes and custom class tables."""
import numpy as np
import pytest

from pywfa_tpu.align import WavefrontAligner
from pywfa_tpu.batch import align_pairs
from pywfa_tpu.oracle import OracleAligner


def _mk_iupac_pairs(n, L, seed=0):
    rng = np.random.default_rng(seed)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    amb = np.frombuffer(b"NRYSWKM", dtype=np.uint8)
    ps, ts = [], []
    for _ in range(n):
        p = alpha[rng.integers(0, 4, L)]
        t = p.copy()
        idx = rng.choice(L, max(1, L // 10), replace=False)
        t[idx] = alpha[rng.integers(0, 4, len(idx))]
        # sprinkle ambiguity codes on both sides
        for arr in (p, t):
            j = rng.choice(L, max(1, L // 12), replace=False)
            arr[j] = amb[rng.integers(0, len(amb), len(j))]
        ps.append(p.tobytes())
        ts.append(t.tobytes())
    return ps, ts


def test_iupac_n_matches_all():
    a = WavefrontAligner(pattern="ANGT", match_classes="iupac",
                         span="end-to-end", backend="numpy")
    res = a("ACGT")
    assert res.score == 0
    assert res.cigarstring == "4M"
    # R matches A and G but not C/T
    b = WavefrontAligner(pattern="ARGT", match_classes="iupac",
                         span="end-to-end", backend="numpy")
    assert b("AAGT").score == 0
    assert b("ACGT").score < 0


def test_iupac_engine_vs_oracle_parity():
    ps, ts = _mk_iupac_pairs(24, 90, seed=3)
    attr = WavefrontAligner(backend="numpy", span="end-to-end",
                            match_classes="iupac")._attributes()
    res = align_pairs(attr, ps, ts)
    for i in range(len(ps)):
        o = OracleAligner(attr).align(ps[i], ts[i])
        r = res[i]
        assert (r.status, r.score, r.ops) == (o.status, o.score, o.ops), i


def test_iupac_affine2p_and_endsfree():
    ps, ts = _mk_iupac_pairs(8, 70, seed=5)
    for kwargs in (dict(distance="affine2p", span="end-to-end"),
                   dict(span="ends-free", pattern_begin_free=10,
                        pattern_end_free=10, text_begin_free=10,
                        text_end_free=10)):
        attr = WavefrontAligner(backend="numpy", match_classes="iupac",
                                **kwargs)._attributes()
        res = align_pairs(attr, ps, ts)
        for i in range(len(ps)):
            o = OracleAligner(attr).align(ps[i], ts[i])
            assert (res[i].status, res[i].score, res[i].ops) == \
                (o.status, o.score, o.ops), (kwargs, i)


def test_custom_class_dict():
    # purine/pyrimidine two-class alphabet via a user dict
    classes = {"A": "R", "G": "R", "C": "Y", "T": "Y"}
    a = WavefrontAligner(pattern="AGCT", match_classes=classes,
                         span="end-to-end", backend="numpy")
    assert a("GATC").score == 0  # all same-class
    assert a("CTAG").score < 0   # all cross-class


def test_wildcard_and_classes_exclusive():
    with pytest.raises(ValueError):
        WavefrontAligner(pattern="ACGT", wildcard="N",
                         match_classes="iupac")


def test_classes_with_check_alignment():
    a = WavefrontAligner(pattern="ANGTACGT", match_classes="iupac",
                         span="end-to-end", backend="numpy",
                         check_alignment=True)
    assert a("ACGTACGT").score == 0
