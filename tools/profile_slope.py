#!/usr/bin/env python
"""Slope-method breakdown of the XLA align_batch_full pipeline.

Separates: score loop (with/without choices recording), traceback walk +
packing, and the extension formulation, at the headline shape.
"""
import dataclasses
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(os.environ.get("BENCH_B", 4096))
L = int(os.environ.get("BENCH_L", 150))
ITERS = int(os.environ.get("BENCH_ITERS", 5))


def slope(run, iters=ITERS):
    def timed(n):
        t0 = time.time()
        o = None
        for _ in range(n):
            o = run()
        np.asarray(o).reshape(-1)[:4]
        return time.time() - t0
    t_low = min(timed(1), timed(1))
    t_high = min(timed(iters + 1), timed(iters + 1))
    return max((t_high - t_low) / iters, 1e-9)


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
    W = int(os.environ.get("BENCH_W", 128))
    S_cap = int(os.environ.get("BENCH_SCAP", 96))
    cfg0 = E.full_config(attr, L, L, W=W, S_cap=S_cap)
    C = cfg0.extend_chunk
    pat = jnp.asarray(encode_batch(pats, cfg0.Lp, C, PATTERN_SENTINEL))
    txt = jnp.asarray(encode_batch(txts, cfg0.Lt, C, TEXT_SENTINEL))
    plen = jnp.full((B,), L, dtype=jnp.int32)
    tlen = jnp.full((B,), L, dtype=jnp.int32)
    frees = jnp.zeros((B, 4), dtype=jnp.int32)
    ms = jnp.int32(2**31 - 1)

    @functools.partial(jax.jit, static_argnums=(0,))
    def loop_meta(cfg, pat, txt, plen, tlen, frees, ms):
        return E._pack_meta(E._align_core(cfg, pat, txt, plen, tlen,
                                          frees, ms))

    print(f"device={jax.devices()[0]} B={B} L={L} W={W} S_cap={S_cap}")
    out = np.asarray(E.align_batch(cfg0, pat, txt, plen, tlen, frees,
                                   ms)["final_s"])
    print(f"s_max={out.max()} s_mean={out.mean():.1f}")

    def t(name, run):
        dt = slope(run)
        print(f"{name:46s} {dt*1e3:8.2f} ms/batch")
        return dt

    cfgs = {
        "onehot": cfg0,
        "bits": dataclasses.replace(cfg0, extend_force="bits"),
    }
    for nm, cfg in cfgs.items():
        t(f"[{nm}] full (loop+choices+walk+pack)",
          lambda cfg=cfg: E.align_batch_full(cfg, pat, txt, plen, tlen,
                                             frees, ms))
        t(f"[{nm}] loop+choices, meta out (no walk)",
          lambda cfg=cfg: loop_meta(cfg, pat, txt, plen, tlen, frees, ms))
        c2 = dataclasses.replace(cfg, record_choices=False)
        t(f"[{nm}] loop only (no choices, no walk)",
          lambda cfg=c2: loop_meta(cfg, pat, txt, plen, tlen, frees, ms))


if __name__ == "__main__":
    main()
