"""Property tests: WFA engine vs an independent Gotoh/DP oracle.

The DP here is a straightforward O(nm) dynamic program written directly from
the penalty model definitions -- an implementation completely unlike the
wavefront method -- so agreement is strong evidence of correctness.
"""
import random

import numpy as np
import pytest

from pywfa_tpu import WavefrontAligner
from pywfa_tpu.attributes import penalties_affine, penalties_affine2p
from pywfa_tpu.cigar import cigar_score, ops_to_cigartuples

INF = 10**9


def dp_affine_score(pattern, text, x, o, e, match=0):
    """Gotoh global-alignment minimum penalty (match score = -match>=0)."""
    n, m = len(pattern), len(text)
    M = np.full((n + 1, m + 1), INF, dtype=np.int64)
    I = np.full((n + 1, m + 1), INF, dtype=np.int64)
    D = np.full((n + 1, m + 1), INF, dtype=np.int64)
    M[0, 0] = 0
    for i in range(1, n + 1):
        D[i, 0] = o + e * i
        M[i, 0] = D[i, 0]
    for j in range(1, m + 1):
        I[0, j] = o + e * j
        M[0, j] = I[0, j]
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            I[i, j] = min(M[i, j - 1] + o + e, I[i, j - 1] + e)
            D[i, j] = min(M[i - 1, j] + o + e, D[i - 1, j] + e)
            sub = match if pattern[i - 1] == text[j - 1] else x
            M[i, j] = min(M[i - 1, j - 1] + sub, I[i, j], D[i, j])
    return int(M[n, m])


def dp_affine2p_score(pattern, text, x, o1, e1, o2, e2):
    n, m = len(pattern), len(text)
    M = np.full((n + 1, m + 1), INF, dtype=np.int64)
    I1 = np.full((n + 1, m + 1), INF, dtype=np.int64)
    D1 = np.full((n + 1, m + 1), INF, dtype=np.int64)
    I2 = np.full((n + 1, m + 1), INF, dtype=np.int64)
    D2 = np.full((n + 1, m + 1), INF, dtype=np.int64)
    M[0, 0] = 0
    for i in range(1, n + 1):
        D1[i, 0] = o1 + e1 * i
        D2[i, 0] = o2 + e2 * i
        M[i, 0] = min(D1[i, 0], D2[i, 0])
    for j in range(1, m + 1):
        I1[0, j] = o1 + e1 * j
        I2[0, j] = o2 + e2 * j
        M[0, j] = min(I1[0, j], I2[0, j])
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            I1[i, j] = min(M[i, j - 1] + o1 + e1, I1[i, j - 1] + e1)
            I2[i, j] = min(M[i, j - 1] + o2 + e2, I2[i, j - 1] + e2)
            D1[i, j] = min(M[i - 1, j] + o1 + e1, D1[i - 1, j] + e1)
            D2[i, j] = min(M[i - 1, j] + o2 + e2, D2[i - 1, j] + e2)
            sub = 0 if pattern[i - 1] == text[j - 1] else x
            M[i, j] = min(M[i - 1, j - 1] + sub,
                          I1[i, j], I2[i, j], D1[i, j], D2[i, j])
    return int(M[n, m])


def dp_edit_score(pattern, text):
    n, m = len(pattern), len(text)
    prev = list(range(m + 1))
    for i in range(1, n + 1):
        cur = [i] + [0] * m
        for j in range(1, m + 1):
            sub = 0 if pattern[i - 1] == text[j - 1] else 1
            cur[j] = min(prev[j - 1] + sub, prev[j] + 1, cur[j - 1] + 1)
        prev = cur
    return prev[m]


def mutate(rng, seq, sub_rate=0.05, indel_rate=0.03):
    out = []
    for c in seq:
        r = rng.random()
        if r < indel_rate / 2:
            continue  # deletion
        if r < indel_rate:
            out.append(rng.choice("ACGT"))  # insertion
        if rng.random() < sub_rate:
            out.append(rng.choice([b for b in "ACGT" if b != c]))
        else:
            out.append(c)
    return "".join(out)


def rand_seq(rng, n):
    return "".join(rng.choice("ACGT") for _ in range(n))


def check_cigar_consistency(res, pattern, text, penalties, end2end=True):
    """The CIGAR must consume exactly the sequences and re-score to `score`."""
    ct = res.cigartuples
    plen = sum(l for op, l in ct if op in (0, 2, 8))
    tlen = sum(l for op, l in ct if op in (0, 1, 8))
    if end2end:
        assert plen == len(pattern), (plen, len(pattern))
        assert tlen == len(text)
    ops = "".join({0: "M", 1: "I", 2: "D", 8: "X"}[op] * l for op, l in ct)
    # verify M runs really match and X runs don't
    pi = ti = 0
    for c in ops:
        if c == "M":
            assert pattern[pi] == text[ti], "M over mismatching bases"
            pi += 1
            ti += 1
        elif c == "X":
            assert pattern[pi] != text[ti], "X over matching bases"
            pi += 1
            ti += 1
        elif c == "I":
            ti += 1
        else:
            pi += 1
    assert -cigar_score(ops, penalties) == -abs(res.score) or \
        cigar_score(ops, penalties) == res.score


@pytest.mark.parametrize("seed", range(8))
def test_affine_vs_dp(seed):
    rng = random.Random(seed)
    n = rng.randint(10, 120)
    pattern = rand_seq(rng, n)
    text = mutate(rng, pattern, 0.1, 0.08)
    x, o, e = rng.choice([(4, 6, 2), (5, 6, 2), (2, 3, 1), (7, 11, 1)])
    a = WavefrontAligner(pattern, span="end-to-end", mismatch=x,
                         gap_opening=o, gap_extension=e, backend="numpy")
    res = a(text)
    expected = -dp_affine_score(pattern, text, x, o, e)
    assert res.score == expected, (res.score, expected)
    check_cigar_consistency(res, pattern, text,
                            penalties_affine(0, x, o, e))


@pytest.mark.parametrize("seed", range(8))
def test_affine_match_score_vs_dp(seed):
    """Negative match scores exercise the Eizenga transform."""
    rng = random.Random(seed + 100)
    n = rng.randint(10, 80)
    pattern = rand_seq(rng, n)
    text = mutate(rng, pattern, 0.1, 0.05)
    match, x, o, e = rng.choice([(-1, 4, 6, 2), (-2, 5, 6, 2), (-3, 2, 3, 1)])
    a = WavefrontAligner(pattern, span="end-to-end", match=match, mismatch=x,
                         gap_opening=o, gap_extension=e, backend="numpy")
    res = a(text)
    # score = -(min total penalty) where matches contribute `match`
    expected = -dp_affine_score(pattern, text, x, o, e, match=match)
    assert res.score == expected, (res.score, expected)


@pytest.mark.parametrize("seed", range(6))
def test_affine2p_vs_dp(seed):
    rng = random.Random(seed + 200)
    n = rng.randint(10, 90)
    pattern = rand_seq(rng, n)
    text = mutate(rng, pattern, 0.08, 0.08)
    a = WavefrontAligner(pattern, distance="affine2p", span="end-to-end",
                         mismatch=5, gap_opening=6, gap_extension=2,
                         gap_opening2=24, gap_extension2=1, backend="numpy")
    res = a(text)
    expected = -dp_affine2p_score(pattern, text, 5, 6, 2, 24, 1)
    assert res.score == expected, (res.score, expected)
    check_cigar_consistency(res, pattern, text,
                            penalties_affine2p(0, 5, 6, 2, 24, 1))


@pytest.mark.parametrize("seed", range(6))
def test_edit_vs_dp(seed):
    rng = random.Random(seed + 300)
    n = rng.randint(5, 100)
    pattern = rand_seq(rng, n)
    text = mutate(rng, pattern, 0.15, 0.1)
    a = WavefrontAligner(pattern, distance="levenshtein", span="end-to-end",
                         backend="numpy")
    res = a(text)
    expected = dp_edit_score(pattern, text)
    assert res.score == expected, (res.score, expected)


@pytest.mark.parametrize("seed", range(6))
def test_linear_vs_dp(seed):
    rng = random.Random(seed + 400)
    n = rng.randint(5, 80)
    pattern = rand_seq(rng, n)
    text = mutate(rng, pattern, 0.1, 0.08)
    # linear = affine with o=0; pywfa maps indel from gap_extension
    a = WavefrontAligner(pattern, distance="linear", span="end-to-end",
                         mismatch=4, gap_extension=2, backend="numpy")
    res = a(text)
    expected = -dp_affine_score(pattern, text, 4, 0, 2)
    assert res.score == expected, (res.score, expected)


@pytest.mark.parametrize("seed", range(4))
def test_indel_vs_dp(seed):
    rng = random.Random(seed + 500)
    n = rng.randint(5, 60)
    pattern = rand_seq(rng, n)
    text = mutate(rng, pattern, 0.1, 0.1)
    a = WavefrontAligner(pattern, distance="indel", span="end-to-end",
                         backend="numpy")
    res = a(text)
    # LCS distance = n + m - 2*LCS
    n_, m_ = len(pattern), len(text)
    L = np.zeros((n_ + 1, m_ + 1), dtype=np.int64)
    for i in range(1, n_ + 1):
        for j in range(1, m_ + 1):
            L[i, j] = (L[i - 1, j - 1] + 1 if pattern[i - 1] == text[j - 1]
                       else max(L[i - 1, j], L[i, j - 1]))
    expected = n_ + m_ - 2 * int(L[n_, m_])
    assert res.score == expected, (res.score, expected)


def test_score_only_matches_full():
    rng = random.Random(7)
    for _ in range(5):
        pattern = rand_seq(rng, rng.randint(20, 100))
        text = mutate(rng, pattern, 0.1, 0.05)
        full = WavefrontAligner(pattern, scope="full", span="end-to-end",
                                backend="numpy")(text)
        score = WavefrontAligner(pattern, scope="score", span="end-to-end",
                                 backend="numpy")(text)
        assert full.score == score.score
        assert score.cigartuples == []


def test_max_steps():
    rng = random.Random(11)
    pattern = rand_seq(rng, 200)
    text = rand_seq(rng, 200)
    a = WavefrontAligner(pattern, span="end-to-end", max_steps=5,
                         backend="numpy")
    a(text)
    assert a.status == -100


def test_wildcard():
    pattern = "ACGTNNNNACGT"
    text = "ACGTTTTTACGT"
    a = WavefrontAligner(pattern, span="end-to-end", wildcard="N",
                         backend="numpy")
    res = a(text)
    assert res.score == 0
    assert a.cigarstring == "12M"
