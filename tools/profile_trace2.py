#!/usr/bin/env python
"""Trace align_batch_full; report device busy time vs wall, and track gaps."""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(os.environ.get("BENCH_B", 4096))
L = int(os.environ.get("BENCH_L", 150))


def main():
    import jax
    import jax.numpy as jnp
    from pywfa_tpu.align import WavefrontAligner
    from pywfa_tpu.batch import PATTERN_SENTINEL, TEXT_SENTINEL, encode_batch
    from pywfa_tpu.ops import engine as E

    import bench
    rng = np.random.default_rng(0)
    pats, txts = bench.make_pairs(rng, B, L, 0.02)
    api = WavefrontAligner(backend="numpy", span="end-to-end")
    attr = api._attributes()
    cfg = E.full_config(attr, L, L, W=128, S_cap=96)
    C = cfg.extend_chunk
    pat = jnp.asarray(encode_batch(pats, cfg.Lp, C, PATTERN_SENTINEL))
    txt = jnp.asarray(encode_batch(txts, cfg.Lt, C, TEXT_SENTINEL))
    plen = jnp.full((B,), L, dtype=jnp.int32)
    tlen = jnp.full((B,), L, dtype=jnp.int32)
    frees = jnp.zeros((B, 4), dtype=jnp.int32)
    ms = jnp.int32(2**31 - 1)

    def run():
        return E.align_batch_full(cfg, pat, txt, plen, tlen, frees, ms)

    jax.block_until_ready(run())
    t0 = time.time()
    N = 8
    for _ in range(N):
        o = run()
    jax.block_until_ready(o)
    wall = (time.time() - t0) / N
    print(f"wall per call: {wall*1e3:.2f} ms")

    d = "/tmp/jaxtrace2"
    os.system(f"rm -rf {d}")
    with jax.profiler.trace(d):
        for _ in range(N):
            o = run()
        jax.block_until_ready(o)

    files = glob.glob(f"{d}/**/*.trace.json.gz", recursive=True)
    with gzip.open(files[0], "rt") as f:
        tr = json.load(f)
    evs = [e for e in tr.get("traceEvents", []) if e.get("ph") == "X"]
    # find the device program executions (jit_align_batch_full)
    prog = sorted((e["ts"], e["dur"]) for e in evs
                  if e.get("name", "").startswith("jit_align_batch_full"))
    if prog:
        total_dev = sum(d for _, d in prog) / 1e3 / len(prog)
        gaps = [(prog[i + 1][0] - (prog[i][0] + prog[i][1])) / 1e3
                for i in range(len(prog) - 1)]
        print(f"programs: {len(prog)}, device time each: {total_dev:.2f} ms")
        print("inter-program gaps (ms):",
              [f"{g:.2f}" for g in gaps])
    # top host-side events
    host = defaultdict(float)
    cnt = defaultdict(int)
    for e in evs:
        n = e.get("name", "")
        host[n] += e.get("dur", 0) / 1e3
        cnt[n] += 1
    print("\ntop events:")
    for n, v in sorted(host.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{v:10.2f} ms x{cnt[n]:4d}  {n[:100]}")


if __name__ == "__main__":
    main()
