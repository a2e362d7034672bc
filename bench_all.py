#!/usr/bin/env python
"""Extended benchmark sweep over the BASELINE.json workload configs.

Prints a human-readable table (stderr) and one JSON line per config
(stdout). `bench.py` remains the driver's single-line headline benchmark.

Configs (BASELINE.json):
  1. single 32bp affine pair (latency)
  2. 4096 x 150bp affine full-CIGAR (throughput)
  3. affine2p ends-free + clip post-processing
  4. adaptive + X-drop heuristics on 1kb reads
  5. long reads (10kb), segment-capable path
"""
import json
import sys
import time

import numpy as np


def make_pairs(rng, n, length, sub=0.02, ind=0.01):
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    pats = []
    txts = []
    for _ in range(n):
        p = alpha[rng.integers(0, 4, length)]
        keep = rng.random(length) >= ind / 2
        t = p[keep].copy()
        subs = rng.random(len(t)) < sub
        t[subs] = alpha[rng.integers(0, 4, subs.sum())]
        pats.append(p.tobytes())
        txts.append(t.tobytes())
    return pats, txts


def timed(fn, iters=3):
    fn()
    t0 = time.time()
    for _ in range(iters):
        out = fn()
    return (time.time() - t0) / iters, out


def report(name, seconds, n_pairs, cells, extra=""):
    rec = {
        "metric": name,
        "value": round(cells / seconds, 1),
        "unit": "cells/s",
        "pairs_per_s": round(n_pairs / seconds, 1),
        "ms": round(seconds * 1e3, 2),
    }
    print(json.dumps(rec))
    print(f"{name:42s} {seconds*1e3:9.2f} ms  {n_pairs/seconds:12.0f} pair/s"
          f"  {cells/seconds/1e6:10.1f} Mcell/s  {extra}", file=sys.stderr)


def main():
    from pywfa_tpu import WavefrontAligner
    from pywfa_tpu.batch import align_pairs

    rng = np.random.default_rng(0)

    # 1. single-pair latency (README 32bp golden)
    pattern = "TCTTTACTCGCGCGTTGGAGAAATACAATAGT"
    text = "TCTATACTGCGCGTTTGGAGAAATAAAATAGT"
    a = WavefrontAligner(pattern, backend="jax")
    a.wavefront_align(text)
    assert a.cigarstring == "3M1X4M1D7M1I9M1X6M" and a.score == -24

    def single():
        a.wavefront_align(text)
        return a.score
    dt, _ = timed(single, iters=20)
    report("single_32bp_affine_latency", dt, 1, 32 * 32)

    # 2. 4096 x 150bp affine full CIGAR (device portion, as bench.py)
    attr = WavefrontAligner(backend="numpy", span="end-to-end")._attributes()
    pats, txts = make_pairs(rng, 4096, 150)
    def big():
        return align_pairs(attr, pats, txts, W=128, S_cap=96)
    dt, res = timed(big, iters=2)
    assert all(r.status == 0 for r in res)
    report("batch4096_150bp_affine_fullcigar_e2e", dt, 4096,
           4096 * 150 * 150, "(incl. host CIGAR build)")

    # 2b. same workload, pipelined stream (the production throughput path:
    # host CIGAR assembly of batch N overlaps device compute of N+1..N+3)
    from pywfa_tpu.batch import align_pairs_stream
    NB = 8
    stream_batches = [make_pairs(np.random.default_rng(s), 4096, 150)
                      for s in range(NB)]

    def streamed():
        n = 0
        for rs in align_pairs_stream(attr, iter(stream_batches), depth=3,
                                     W=128, S_cap=96):
            n += sum(1 for r in rs if r.status == 0)
        return n
    n_ok = streamed()  # warm
    t0 = time.time()
    n_ok = streamed()
    dt = (time.time() - t0) / NB
    assert n_ok == NB * 4096, n_ok
    report("stream8x4096_150bp_affine_fullcigar", dt, 4096,
           4096 * 150 * 150, "(pipelined, incl. host CIGAR build)")

    # 3. affine2p ends-free + clip
    attr2p = WavefrontAligner(backend="numpy", distance="affine2p",
                              span="ends-free")._attributes()
    pats3, txts3 = make_pairs(rng, 1024, 150, sub=0.03, ind=0.02)
    def cfg3():
        return align_pairs(attr2p, pats3, txts3)
    dt, res = timed(cfg3, iters=2)
    report("batch1024_150bp_affine2p_endsfree", dt, 1024, 1024 * 150 * 150)

    # 4. heuristics on 1kb reads
    attr_h = WavefrontAligner(backend="numpy", heuristic="adaptive",
                              span="end-to-end")._attributes()
    pats4, txts4 = make_pairs(rng, 256, 1000, sub=0.05, ind=0.03)
    def cfg4():
        return align_pairs(attr_h, pats4, txts4)
    dt, res = timed(cfg4, iters=2)
    ok = sum(1 for r in res if r.status == 0)
    report("batch256_1kb_adaptive_heuristic", dt, 256, 256 * 1000 * 1000,
           f"({ok}/256 complete)")

    # 5. long reads 10kb
    attr_l = WavefrontAligner(backend="numpy", span="end-to-end")._attributes()
    pats5, txts5 = make_pairs(rng, 4, 10000, sub=0.03, ind=0.02)
    def cfg5():
        return align_pairs(attr_l, pats5, txts5)
    dt, res = timed(cfg5, iters=1)
    assert all(r.status == 0 for r in res)
    report("batch4_10kb_affine_fullcigar", dt, 4, 4 * 10000 * 10000)


if __name__ == "__main__":
    main()
