#!/usr/bin/env python
"""Capture a device trace of align_batch + walk and summarize op costs."""
import glob
import gzip
import json
import os
import sys
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
        out = E.align_batch(cfg, pat, txt, plen, tlen, frees, ms)
        ok = out["status"] == E.ST_END_REACHED
        w = E.traceback_walk(cfg, out["choices"], out["final_s"],
                             out["end_k"], ok)
        return w[0]

    jax.block_until_ready(run())  # warm

    d = "/tmp/jaxtrace"
    os.system(f"rm -rf {d}")
    with jax.profiler.trace(d):
        for _ in range(3):
            o = run()
        jax.block_until_ready(o)

    files = glob.glob(f"{d}/**/*.trace.json.gz", recursive=True)
    print("trace files:", files)
    if not files:
        print("NO TRACE — profiler unsupported on this backend?")
        return
    with gzip.open(files[0], "rt") as f:
        tr = json.load(f)
    # sum durations by event name on device tracks
    by_name = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        name = ev.get("name", "")
        pid = ev.get("pid", 0)
        dur = ev.get("dur", 0) / 1e3  # ms
        args = ev.get("args", {})
        if "run_id" in args or "program_id" in args or True:
            by_name[name] += dur
            cnt[name] += 1
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{dur:10.3f} ms  x{cnt[name]:5d}  {name[:110]}")


if __name__ == "__main__":
    main()
