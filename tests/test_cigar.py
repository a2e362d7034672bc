"""CIGAR post-processing unit tests: discover_mismatches, numeric SAM
encoding (reference semantics: alignment/cigar.c:181-243, 346-407)."""
import numpy as np
import pytest

from pywfa_tpu.cigar import (Cigar, cigar_discover_mismatches,
                             cigar_get_sam_u32, cigar_sprint_sam,
                             ops_to_cigarstring)


def test_discover_mismatches_basic():
    # M-run CIGAR from an external source; mismatch at index 2
    c = Cigar(ops="MMMM")
    cigar_discover_mismatches("ACGT", "ACCT", c)
    assert c.ops == "MMXM"


def test_discover_mismatches_with_indels():
    c = Cigar(ops="MMIMM")
    cigar_discover_mismatches("ACGT", "ACTGT", c)
    assert c.ops == "MMIMM"
    c = Cigar(ops="MMDMM")
    cigar_discover_mismatches("ACTGT", "ACGT", c)
    assert c.ops == "MMDMM"


def test_discover_mismatches_pads_tail():
    # cigar shorter than the sequences: leftover pattern -> D, text -> I
    # (reference: cigar.c:404-406)
    c = Cigar(ops="MM")
    cigar_discover_mismatches("ACGT", "ACG", c)
    assert c.ops == "MMDDI"
    # walk stops at sequence exhaustion; remaining ops dropped
    c = Cigar(ops="MMMMM")
    cigar_discover_mismatches("AC", "AC", c)
    assert c.ops == "MM"


def test_discover_mismatches_rejects_x():
    with pytest.raises(ValueError):
        cigar_discover_mismatches("AC", "AC", Cigar(ops="MX"))


def test_sam_u32_fold_x():
    ops = "MMXMMIDD"
    arr = cigar_get_sam_u32(ops, show_mismatches=False)
    # X folds into M: 5M 1I 2D
    assert arr.tolist() == [(5 << 4) | 0, (1 << 4) | 1, (2 << 4) | 2]
    assert arr.dtype == np.uint32
    # string form must agree with the numeric form
    assert cigar_sprint_sam(ops, show_mismatches=False) == "5M1I2D"


def test_sam_u32_show_mismatches():
    arr = cigar_get_sam_u32("MMXMM", show_mismatches=True)
    # '=' runs (code 7), X stays 8
    assert arr.tolist() == [(2 << 4) | 7, (1 << 4) | 8, (2 << 4) | 7]


def test_sam_u32_empty():
    assert cigar_get_sam_u32("").size == 0


def test_discover_then_cigarstring_roundtrip():
    rng = np.random.default_rng(7)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    for _ in range(20):
        n = int(rng.integers(5, 40))
        p = alpha[rng.integers(0, 4, n)]
        t = p.copy()
        idx = rng.choice(n, max(1, n // 8), replace=False)
        t[idx] = alpha[rng.integers(0, 4, len(idx))]
        ps, ts = p.tobytes().decode(), t.tobytes().decode()
        c = Cigar(ops="M" * n)
        cigar_discover_mismatches(ps, ts, c)
        n_x = int((p != t).sum())
        assert c.ops.count("X") == n_x
        assert len(c.ops) == n
        # numeric and string SAM encodings agree
        u32 = cigar_get_sam_u32(c.ops, True)
        s = "".join(f"{v >> 4}{'MIDNSHP=X'[v & 0xF]}" for v in u32)
        rebuilt = ops_to_cigarstring(c.ops).replace("M", "=")
        assert s == rebuilt
