"""Cross-engine fuzz: the public WavefrontAligner API on both backends.

Seeded random pairs across configs; asserts (score, status, cigarstring)
byte-equality between the batched JAX engine and the scalar oracle through
the full user-facing path (encode -> engine -> CIGAR assembly), complementing
tests/test_engine_vs_oracle.py which tests the engines directly.
"""
import numpy as np
import pytest

from pywfa_tpu import WavefrontAligner

rng = np.random.default_rng(7)
ACGT = np.array(list("ACGT"))


def _seq(n):
    return "".join(rng.choice(ACGT, n))


def _mutate(s, rate):
    out = []
    for c in s:
        r = rng.random()
        if r < rate * 0.5:
            out.append(rng.choice(ACGT))
        elif r < rate * 0.75:
            continue
        elif r < rate:
            out.extend([c, rng.choice(ACGT)])
        else:
            out.append(c)
    return "".join(out)


CONFIGS = [
    dict(),
    dict(distance="affine2p"),
    dict(span="ends-free", pattern_begin_free=20, pattern_end_free=20,
         text_begin_free=20, text_end_free=20),
    dict(distance="levenshtein"),
    dict(scope="score"),
]


@pytest.mark.parametrize("ci", range(len(CONFIGS)))
def test_crosscheck_fuzz(ci):
    kw = CONFIGS[ci]
    for trial in range(6):
        L = int(rng.integers(30, 400))
        p = _seq(L)
        if trial == 5:
            t = _seq(int(rng.integers(30, 400)))  # unrelated, high score
        else:
            t = _mutate(p, rate=float(rng.uniform(0.02, 0.25)))
        a_t = WavefrontAligner(p, backend="jax", **kw)
        a_c = WavefrontAligner(p, backend="numpy", **kw)
        rt, rc = a_t(t), a_c(t)
        assert (rt.score, rt.status, rt.cigarstring) == \
            (rc.score, rc.status, rc.cigarstring), \
            (ci, trial, rt.score, rc.score, rt.status, rc.status,
             rt.cigarstring, rc.cigarstring)
