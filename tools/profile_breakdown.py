#!/usr/bin/env python
"""Stage-by-stage timing of the headline bench workload on the live device.

Times, separately: LCP table build, the score loop (align_batch with the
table reused), traceback walk, and the whole fused call — to show where the
10ms/batch goes and guide optimization.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(os.environ.get("BENCH_B", 4096))
L = int(os.environ.get("BENCH_L", 150))
ITERS = int(os.environ.get("BENCH_ITERS", 10))


def timeit(name, fn, *args):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(ITERS):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / ITERS
    print(f"{name:34s} {dt*1e3:8.2f} ms")
    return out, dt


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
    cfg = E.full_config(attr, L, L, W=W, S_cap=S_cap)
    C = cfg.extend_chunk

    pat = jnp.asarray(encode_batch(pats, cfg.Lp, C, PATTERN_SENTINEL))
    txt = jnp.asarray(encode_batch(txts, cfg.Lt, C, TEXT_SENTINEL))
    plen = jnp.full((B,), L, dtype=jnp.int32)
    tlen = jnp.full((B,), L, dtype=jnp.int32)
    frees = jnp.zeros((B, 4), dtype=jnp.int32)
    max_steps = jnp.int32(2**31 - 1)

    print(f"device={jax.devices()[0]} B={B} L={L} W={W} S_cap={S_cap}")

    # 1. LCP table build alone (the h-major Pallas builder used on device)
    from pywfa_tpu.ops.pallas import lcp_table as LT
    build_h = jax.jit(lambda p, t: LT.build_lcp_table_hmajor(
        cfg.W, cfg.kmin, cfg.wildcard, False, p, t))
    lcp_h, t_build = timeit("lcp table build (pallas h-major)", build_h, pat, txt)
    print(f"  table: {lcp_h.shape} {lcp_h.dtype} = "
          f"{lcp_h.size * lcp_h.dtype.itemsize / 1e6:.1f} MB")

    # 2. full align_batch (table build + loop)
    ab = jax.jit(lambda *a: E.align_batch(cfg, *a), static_argnums=())
    out, t_align = timeit("align_batch (build + loop)",
                          lambda *a: E.align_batch(cfg, *a),
                          pat, txt, plen, tlen, frees, max_steps)
    print(f"  final_s max={int(np.asarray(out['final_s']).max())} "
          f"steps-loop bound; choices {out['choices'].shape} "
          f"{out['choices'].dtype}")

    # 3. traceback walk alone
    ok = out["status"] == E.ST_END_REACHED
    wk = lambda ch, fs, ek, ok: E.traceback_walk(cfg, ch, fs, ek, ok)
    _, t_walk = timeit("traceback walk", wk,
                       out["choices"], out["final_s"], out["end_k"], ok)

    # 4. extension lookup cost probe: loop only (reusing a dummy table) is
    #    not separable without refactor; estimate = align - build
    print(f"{'(loop alone = align - build)':34s} {(t_align-t_build)*1e3:8.2f} ms")
    print(f"{'TOTAL (align + walk)':34s} {(t_align+t_walk)*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
