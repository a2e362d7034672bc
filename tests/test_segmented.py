"""Segmented execution with rematerialized traceback must match one-shot
results (bounded device AND host memory; see batch._align_pairs_remat)."""
import random

import numpy as np

import pywfa_tpu.batch as batch_mod
from pywfa_tpu.align import WavefrontAligner
from pywfa_tpu.batch import align_pairs
from pywfa_tpu.oracle import OracleAligner


def _pairs(seed, n, lo, hi, sub=0.08, ind=0.06):
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        p = "".join(rng.choice("ACGT") for _ in range(rng.randint(lo, hi)))
        t = []
        for c in p:
            r = rng.random()
            if r < ind / 2:
                continue
            if r < ind:
                t.append(rng.choice("ACGT"))
            t.append(c if rng.random() > sub else rng.choice("ACGT"))
        out.append((p, "".join(t) or "A"))
    return out


def test_segmented_matches_oneshot(monkeypatch):
    pairs = _pairs(3, 8, 60, 160)
    api = WavefrontAligner(backend="numpy", span="end-to-end")
    attr = api._attributes()
    bp = [p.encode() for p, _ in pairs]
    bt = [t.encode() for _, t in pairs]
    ref = align_pairs(attr, bp, bt)
    # force the remat path with tiny budgets (multiple 64-step segments)
    monkeypatch.setattr(batch_mod, "CHOICES_BYTES_CAP", 1)
    monkeypatch.setattr(batch_mod, "REPLAY_CHOICES_BYTES", 1)
    seg = align_pairs(attr, bp, bt)
    for i, (r, s) in enumerate(zip(ref, seg)):
        assert (r.status, r.score, r.ops) == (s.status, s.score, s.ops), i


def test_segmented_matches_oracle_divergent(monkeypatch):
    rng = random.Random(9)
    pairs = [("".join(rng.choice("ACGT") for _ in range(120)),
              "".join(rng.choice("ACGT") for _ in range(100)))
             for _ in range(4)]
    api = WavefrontAligner(backend="numpy", span="end-to-end")
    attr = api._attributes()
    bp = [p.encode() for p, _ in pairs]
    bt = [t.encode() for _, t in pairs]
    monkeypatch.setattr(batch_mod, "CHOICES_BYTES_CAP", 1)
    monkeypatch.setattr(batch_mod, "REPLAY_CHOICES_BYTES", 1)
    seg = align_pairs(attr, bp, bt)
    orc = OracleAligner(attr)
    for i in range(len(pairs)):
        o = orc.align(bp[i], bt[i])
        assert (seg[i].status, seg[i].score, seg[i].ops) == \
            (o.status, o.score, o.ops), i
