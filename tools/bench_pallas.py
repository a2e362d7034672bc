#!/usr/bin/env python
"""A/B the fused Pallas loop kernel vs the XLA engine on the headline shape.

Times the complete production pipeline for both paths (score loop +
traceback walk + packed single-pull output) with the slope method from
bench.py. Also asserts result parity on the device.
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(os.environ.get("BENCH_B", 4096))
L = int(os.environ.get("BENCH_L", 150))
ITERS = int(os.environ.get("BENCH_ITERS", 5))


def slope(run, iters):
    def timed(n):
        t0 = time.time()
        o = None
        for _ in range(n):
            o = run()
        np.asarray(o[:4])
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
    from pywfa_tpu.ops.pallas import fused_loop

    import bench
    rng = np.random.default_rng(0)
    pats, txts = bench.make_pairs(rng, B, L, 0.02)

    dist = os.environ.get("BENCH_DIST", "affine")
    span = os.environ.get("BENCH_SPAN", "end-to-end")
    free = int(os.environ.get("BENCH_FREE", 20))
    kw = {}
    if span == "ends-free":
        kw = dict(pattern_begin_free=free, pattern_end_free=free,
                  text_begin_free=free, text_end_free=free)
    api = WavefrontAligner(backend="numpy", span=span, distance=dist, **kw)
    attr = api._attributes()
    heur = os.environ.get("BENCH_HEUR")
    if heur:
        import dataclasses
        from pywfa_tpu.attributes import HeuristicParams
        from pywfa_tpu.constants import HeuristicStrategy
        hp = {
            "adaptive": HeuristicParams(
                strategy=HeuristicStrategy.WFADAPTIVE,
                min_wavefront_length=10, max_distance_threshold=50,
                steps_between_cutoffs=1),
            "wfmash": HeuristicParams(
                strategy=HeuristicStrategy.WFMASH,
                min_wavefront_length=10, max_distance_threshold=50,
                steps_between_cutoffs=1),
            "banded-static": HeuristicParams(
                strategy=HeuristicStrategy.BANDED_STATIC,
                min_k=-40, max_k=40, steps_between_cutoffs=1),
            "banded-adaptive": HeuristicParams(
                strategy=HeuristicStrategy.BANDED_ADAPTIVE,
                min_k=-40, max_k=40, steps_between_cutoffs=1),
        }[heur]
        attr = dataclasses.replace(attr, heuristic=hp)
    W = int(os.environ.get("BENCH_W", 128))
    S_cap = int(os.environ.get("BENCH_SCAP", 96))
    cfg = E.full_config(attr, L, L, W=W, S_cap=S_cap)
    C = cfg.extend_chunk
    pat = jnp.asarray(encode_batch(pats, cfg.Lp, C, PATTERN_SENTINEL))
    txt = jnp.asarray(encode_batch(txts, cfg.Lt, C, TEXT_SENTINEL))
    plen = jnp.full((B,), L, dtype=jnp.int32)
    tlen = jnp.full((B,), L, dtype=jnp.int32)
    from pywfa_tpu.batch import _build_frees
    frees_np = _build_frees(attr, B, np.full(B, L), np.full(B, L))
    frees = jnp.asarray(frees_np)
    ms = jnp.int32(2**31 - 1)

    print(f"device={jax.devices()[0]} B={B} L={L} W={W} S_cap={S_cap} "
          f"dist={dist} span={span} "
          f"heur={os.environ.get('BENCH_HEUR', '-')}")

    # --- XLA path ---
    def run_xla():
        return E.align_batch_full(cfg, pat, txt, plen, tlen, frees, ms)

    ref = np.asarray(run_xla())
    dt = slope(run_xla, ITERS)
    print(f"xla align_batch_full           {dt*1e3:8.2f} ms/batch "
          f"({B*L*L/dt/1e9:.1f} GCUPS)")

    # --- Pallas path (bits build + fused loop + walk + pack, one call) ---
    @functools.partial(jax.jit, static_argnums=(0, 1))
    def pallas_full(cfg, TB, pat, txt, plen, tlen, frees, ms):
        bits = E._build_eq_bits(cfg, pat, txt)
        out = fused_loop.align_batch_pallas(cfg, TB, bits, plen, tlen,
                                            frees, ms)
        return E._pack_full(cfg, out)

    for TB in (8, 16, 32, 64, 128, 256, 512):
        if fused_loop.n_comp(cfg) * cfg.scope * TB * cfg.W * 4 > 10 * 2**20:
            continue
        def run_p():
            return pallas_full(cfg, TB, pat, txt, plen, tlen, frees, ms)
        try:
            got = np.asarray(run_p())
        except Exception as e:  # noqa: BLE001
            print(f"pallas TB={TB:<4d} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}")
            continue
        match = "OK" if np.array_equal(got, ref) else "MISMATCH"
        dt = slope(run_p, ITERS)
        print(f"pallas fused TB={TB:<4d} [{match}]   {dt*1e3:8.2f} ms/batch "
              f"({B*L*L/dt/1e9:.1f} GCUPS)")


if __name__ == "__main__":
    main()
