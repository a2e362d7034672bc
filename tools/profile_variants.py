#!/usr/bin/env python
"""Isolate per-step loop costs by timing align_batch config variants."""
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(os.environ.get("BENCH_B", 4096))
L = int(os.environ.get("BENCH_L", 150))
ITERS = int(os.environ.get("BENCH_ITERS", 10))


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
    cfg0 = E.full_config(attr, L, L, W=128, S_cap=96)
    C = cfg0.extend_chunk
    pat = jnp.asarray(encode_batch(pats, cfg0.Lp, C, PATTERN_SENTINEL))
    txt = jnp.asarray(encode_batch(txts, cfg0.Lt, C, TEXT_SENTINEL))
    plen = jnp.full((B,), L, dtype=jnp.int32)
    tlen = jnp.full((B,), L, dtype=jnp.int32)
    frees = jnp.zeros((B, 4), dtype=jnp.int32)
    ms = jnp.int32(2**31 - 1)

    def timev(name, cfg):
        out = E.align_batch(cfg, pat, txt, plen, tlen, frees, ms)
        jax.block_until_ready(out["final_s"])
        t0 = time.time()
        for _ in range(ITERS):
            out = E.align_batch(cfg, pat, txt, plen, tlen, frees, ms)
        jax.block_until_ready(out["final_s"])
        dt = (time.time() - t0) / ITERS
        smax = int(np.asarray(out["final_s"]).max())
        print(f"{name:44s} {dt*1e3:8.2f} ms  (s_max={smax})")
        return dt

    print(f"device={jax.devices()[0]} B={B} L={L}")
    timev("baseline W=128 S=96 lcp=1 choices=1", cfg0)
    timev("W=64", dataclasses.replace(cfg0, W=64))
    timev("no choices", dataclasses.replace(cfg0, record_choices=False))
    timev("no lcp table (chunked compare)",
          dataclasses.replace(cfg0, use_lcp_table=False))
    timev("S_cap=32", dataclasses.replace(cfg0, S_cap=32))
    timev("W=64 + no choices",
          dataclasses.replace(cfg0, W=64, record_choices=False))


if __name__ == "__main__":
    main()
