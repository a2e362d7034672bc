"""Engine-vs-oracle parity for heuristics beyond pywfa's kwarg surface.

WFA2-lib exposes six strategies (reference: wavefront_heuristic.h:41-49);
pywfa's kwargs only reach adaptive and X-drop. The other four (wfmash,
z-drop, banded static/adaptive) are reachable here via AlignerAttributes.
"""
import dataclasses
import random

import pytest

from pywfa_tpu.align import WavefrontAligner
from pywfa_tpu.attributes import HeuristicParams
from pywfa_tpu.batch import align_pairs
from pywfa_tpu.constants import HeuristicStrategy
from pywfa_tpu.oracle import OracleAligner


def _pairs(seed, n=8, lo=40, hi=140, sub=0.1, ind=0.08):
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


def _compare_with_heuristic(heur: HeuristicParams, pairs, span="end-to-end"):
    api = WavefrontAligner(backend="numpy", span=span)
    attr = dataclasses.replace(api._attributes(), heuristic=heur)
    bp = [p.encode() for p, _ in pairs]
    bt = [t.encode() for _, t in pairs]
    batch = align_pairs(attr, bp, bt)
    orc = OracleAligner(attr)
    for i in range(len(pairs)):
        o = orc.align(bp[i], bt[i])
        b = batch[i]
        assert (b.status, b.score, b.ops) == (o.status, o.score, o.ops), \
            (i, pairs[i], (b.status, b.score), (o.status, o.score))


def test_wfmash():
    h = HeuristicParams(strategy=HeuristicStrategy.WFMASH,
                        min_wavefront_length=5, max_distance_threshold=30,
                        steps_between_cutoffs=1)
    _compare_with_heuristic(h, _pairs(1))


def test_zdrop():
    h = HeuristicParams(strategy=HeuristicStrategy.ZDROP, zdrop=15,
                        steps_between_cutoffs=1)
    _compare_with_heuristic(h, _pairs(2, sub=0.2, ind=0.15))


def test_banded_static():
    h = HeuristicParams(strategy=HeuristicStrategy.BANDED_STATIC,
                        min_k=-12, max_k=12)
    _compare_with_heuristic(h, _pairs(3))


def test_banded_adaptive():
    h = HeuristicParams(strategy=HeuristicStrategy.BANDED_ADAPTIVE,
                        min_k=-10, max_k=10, steps_between_cutoffs=2)
    _compare_with_heuristic(h, _pairs(4, sub=0.15))


def test_combined_adaptive_plus_band():
    h = HeuristicParams(strategy=(HeuristicStrategy.WFADAPTIVE
                                  | HeuristicStrategy.BANDED_STATIC),
                        min_wavefront_length=5, max_distance_threshold=25,
                        steps_between_cutoffs=1, min_k=-20, max_k=20)
    _compare_with_heuristic(h, _pairs(5))
