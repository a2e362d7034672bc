#!/usr/bin/env python
"""On-device parity soak: batched engine vs scalar oracle on the REAL TPU.

Complements tools/fuzz_parity.py (CPU): same byte-contract, but exercised
through the production TPU path (Pallas LCP builder, packed transport,
native match-fill) across distance metrics, spans, penalties with match<0,
heuristics, and indel-bearing pairs up to ~700 bp.

    python tools/soak_tpu.py            # ~90 s on one v5e chip
"""
import sys
sys.path.insert(0, ".")
import time

import numpy as np
from pywfa_tpu.align import WavefrontAligner
from pywfa_tpu import batch as BT
from pywfa_tpu.oracle import OracleAligner

rng = np.random.default_rng(99)
al = np.frombuffer(b"ACGT", np.uint8)

def mk(n, lo, hi, div):
    ps, ts = [], []
    for _ in range(n):
        L = int(rng.integers(lo, hi))
        p = al[rng.integers(0,4,L)]
        t = list(p.tobytes().decode())
        nm = max(1, int(L*div))
        for j in rng.choice(L, size=min(nm, L), replace=False):
            r = rng.random()
            if r < 0.6: t[j] = "ACGT"[int(rng.integers(0,4))]
            elif r < 0.8: t[j] = ""
            else: t[j] = t[j] + "ACGT"[int(rng.integers(0,4))]
        ps.append(p.tobytes()); ts.append("".join(t).encode())
    return ps, ts

configs = [
    dict(span="end-to-end"),
    dict(span="ends-free", pattern_begin_free=30, pattern_end_free=30,
         text_begin_free=30, text_end_free=30),
    dict(distance="affine2p", span="end-to-end"),
    dict(distance="levenshtein", span="end-to-end"),
    dict(distance="indel", span="end-to-end"),
    dict(match=-3, mismatch=5, gap_opening=8, gap_extension=3, span="end-to-end"),
    dict(heuristic="adaptive", span="end-to-end"),
    dict(heuristic="X-drop", xdrop=40, steps_between_cutoffs=2, span="end-to-end"),
]
n_checked = 0
t0 = time.time()
for ci, kw in enumerate(configs):
    for (lo, hi, div) in ((40, 200, 0.04), (200, 700, 0.03)):
        ps, ts = mk(48, lo, hi, div)
        attr = WavefrontAligner(backend="numpy", **kw)._attributes()
        got = BT.align_pairs(attr, ps, ts)
        for i, (p, t) in enumerate(zip(ps, ts)):
            o = OracleAligner(attr).align(p, t)
            g = got[i]
            assert (g.status, g.score, g.ops) == (o.status, o.score, o.ops), (
                ci, lo, i, (g.status, g.score, g.ops[:40]),
                (o.status, o.score, o.ops[:40]))
            n_checked += 1
    print(f"config {ci} ({list(kw)[0] if kw else ''}...): OK cum={n_checked} "
          f"{time.time()-t0:.0f}s", flush=True)
print(f"TPU soak: {n_checked} pairs byte-identical across {len(configs)} configs")
