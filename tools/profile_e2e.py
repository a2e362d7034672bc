#!/usr/bin/env python
"""End-to-end pipeline profile at the headline shape.

Runs align_pairs (blocking) and align_pairs_stream through the public API
with PYWFA_PROF=1 stage accumulation, printing a per-stage breakdown of
where wall time goes (host encode, push, device, pull, native fill,
assembly) -- the measurement driving the round-4 end-to-end push.

Usage: [BENCH_B=4096 BENCH_L=150 BENCH_DIV=0.02] python tools/profile_e2e.py
"""
import os
import sys
import time

os.environ.setdefault("PYWFA_PROF", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

B = int(os.environ.get("BENCH_B", 4096))
L = int(os.environ.get("BENCH_L", 150))
DIV = float(os.environ.get("BENCH_DIV", 0.02))
NB = int(os.environ.get("BENCH_NB", 6))


def main():
    import jax
    from pywfa_tpu.align import WavefrontAligner
    from pywfa_tpu import batch as BT
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench_sweep import make_pairs

    attr = WavefrontAligner(backend="numpy", span="end-to-end")._attributes()
    batches = [make_pairs(np.random.default_rng(s + 1), B, L,
                          sub=DIV * 2 / 3, ind=DIV / 3) for s in range(NB)]
    print(f"device={jax.devices()[0]} B={B} L={L} div={DIV}", file=sys.stderr)

    # blocking path
    res = BT.align_pairs(attr, *batches[0])  # warm/compile
    BT.prof_report()
    t0 = time.time()
    for i in range(3):
        res = BT.align_pairs(attr, *batches[i % NB])
    dt = (time.time() - t0) / 3
    print(f"\n== blocking align_pairs: {dt*1e3:.1f} ms/batch "
          f"= {B/dt:,.0f} pairs/s ==")
    print(BT.prof_report())

    # streamed path
    for workers in (0, 2, 4):
        list(BT.align_pairs_stream(attr, iter(batches[:2]), depth=3,
                                   workers=workers))  # warm
        BT.prof_report()
        t0 = time.time()
        n = 0
        for rs in BT.align_pairs_stream(attr, iter(batches), depth=3,
                                        workers=workers):
            n += len(rs)
        dt = (time.time() - t0) / NB
        assert n == NB * B
        print(f"\n== stream workers={workers}: {dt*1e3:.1f} ms/batch "
              f"= {B/dt:,.0f} pairs/s ==")
        print(BT.prof_report())


if __name__ == "__main__":
    main()
