"""API-level resume of MAX_STEPS-paused alignments.

Contract (reference: wavefront_align.c:245-266 wavefront_align_resume):
a paused alignment retains state; raising max_steps and resuming must
yield a result byte-equal to a fresh run at the raised cap.
"""
import numpy as np
import pytest

from pywfa_tpu.align import WavefrontAligner
from pywfa_tpu.batch import (align_pairs, align_pairs_resumable,
                             align_pairs_resume)
from pywfa_tpu.constants import STATUS_MAX_STEPS_REACHED
from pywfa_tpu.oracle import OracleAligner


def _mk_pairs(n, L, nmut, seed=0):
    rng = np.random.default_rng(seed)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    ps, ts = [], []
    for _ in range(n):
        p = alpha[rng.integers(0, 4, L)]
        t = p.copy()
        idx = rng.choice(L, nmut, replace=False)
        t[idx] = alpha[(rng.integers(1, 4, nmut) + t[idx]) % 4]
        ps.append(p.tobytes())
        ts.append(t.tobytes())
    return ps, ts


def test_oracle_resume_equals_fresh():
    ps, ts = _mk_pairs(1, 80, 12, seed=1)
    api = WavefrontAligner(backend="numpy", span="end-to-end")
    attr_small = WavefrontAligner(backend="numpy", span="end-to-end",
                                  max_steps=8)._attributes()
    orc = OracleAligner(attr_small)
    r = orc.align(ps[0], ts[0])
    assert r.status == STATUS_MAX_STEPS_REACHED
    assert r.score == -8
    r2 = orc.align_resume(10_000)
    fresh = OracleAligner(api._attributes()).align(ps[0], ts[0])
    assert (r2.status, r2.score, r2.ops) == (fresh.status, fresh.score,
                                             fresh.ops)


def test_oracle_resume_chained():
    ps, ts = _mk_pairs(1, 80, 12, seed=2)
    attr_small = WavefrontAligner(backend="numpy", span="end-to-end",
                                  max_steps=5)._attributes()
    orc = OracleAligner(attr_small)
    r = orc.align(ps[0], ts[0])
    assert r.status == STATUS_MAX_STEPS_REACHED
    r = orc.last_run.resume(10)  # still too small
    assert r.status == STATUS_MAX_STEPS_REACHED
    assert r.score == -10
    r = orc.last_run.resume(10_000)
    fresh = OracleAligner(WavefrontAligner(
        backend="numpy", span="end-to-end")._attributes()).align(ps[0], ts[0])
    assert (r.status, r.score, r.ops) == (fresh.status, fresh.score,
                                          fresh.ops)


@pytest.mark.parametrize("backend", ["numpy", "jax"])
def test_aligner_resume(backend):
    ps, ts = _mk_pairs(1, 80, 12, seed=3)
    a = WavefrontAligner(pattern=ps[0].decode(), backend=backend,
                         span="end-to-end", max_steps=8)
    a.wavefront_align(ts[0].decode())
    assert a.status == STATUS_MAX_STEPS_REACHED
    a.max_steps = 10_000  # raise-then-continue (reference setter flow)
    score = a.wavefront_align_resume()
    b = WavefrontAligner(pattern=ps[0].decode(), backend=backend,
                         span="end-to-end")
    b.wavefront_align(ts[0].decode())
    assert (a.status, score, a.cigarstring) == (b.status, b.score,
                                                b.cigarstring)


def test_aligner_resume_requires_pause():
    a = WavefrontAligner(pattern="ACGT", backend="numpy")
    a.wavefront_align("ACGT")
    with pytest.raises(ValueError):
        a.wavefront_align_resume()


def test_batch_resume_equals_fresh():
    # mixed batch: pair 0 trivial (completes), the rest pause at the cap
    ps, ts = _mk_pairs(5, 100, 14, seed=4)
    ps[0] = ts[0]
    attr_small = WavefrontAligner(backend="numpy", span="end-to-end",
                                  max_steps=9)._attributes()
    res, paused = align_pairs_resumable(attr_small, ps, ts)
    assert len(res) == 5
    assert res[0].status == 0
    assert paused is not None
    n_paused = sum(r.status == STATUS_MAX_STEPS_REACHED for r in res)
    assert n_paused >= 3
    assert all(r.score == -9 for r in res
               if r.status == STATUS_MAX_STEPS_REACHED)
    res2, paused2 = align_pairs_resume(paused, 100_000)
    assert paused2 is None
    attr_full = WavefrontAligner(backend="numpy",
                                 span="end-to-end")._attributes()
    fresh = align_pairs(attr_full, ps, ts)
    assert len(res2) == 5
    for r, f in zip(res2, fresh):
        assert (r.status, r.score, r.ops) == (f.status, f.score, f.ops)


def test_batch_resume_chained():
    ps, ts = _mk_pairs(3, 100, 14, seed=5)
    attr_small = WavefrontAligner(backend="numpy", span="end-to-end",
                                  max_steps=7)._attributes()
    res, paused = align_pairs_resumable(attr_small, ps, ts)
    assert paused is not None
    res, paused = align_pairs_resume(paused, 11)  # still paused
    assert paused is not None
    assert any(r.score == -11 for r in res)
    res, paused = align_pairs_resume(paused, 100_000)
    assert paused is None
    attr_full = WavefrontAligner(backend="numpy",
                                 span="end-to-end")._attributes()
    fresh = align_pairs(attr_full, ps, ts)
    for r, f in zip(res, fresh):
        assert (r.status, r.score, r.ops) == (f.status, f.score, f.ops)


def test_resumable_no_pause_returns_none():
    ps, ts = _mk_pairs(3, 60, 3, seed=6)
    attr = WavefrontAligner(backend="numpy", span="end-to-end")._attributes()
    res, paused = align_pairs_resumable(attr, ps, ts)
    assert paused is None
    fresh = align_pairs(attr, ps, ts)
    for r, f in zip(res, fresh):
        assert (r.status, r.score, r.ops) == (f.status, f.score, f.ops)
