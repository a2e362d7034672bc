#!/usr/bin/env python
"""Measure per-while_loop-iteration overhead on the live backend."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    print("device:", jax.devices()[0])

    def timeit(name, fn, *args, iters=20):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / iters
        print(f"{name:46s} {dt*1e3:8.3f} ms")
        return dt

    x = jnp.zeros((4096, 128), jnp.int32)

    # 1. trivial while loop, N iterations, 1 op per iter
    for n in (13, 100):
        @jax.jit
        def loop1(x, n=n):
            def body(c):
                i, x = c
                return i + 1, x + 1
            return jax.lax.while_loop(lambda c: c[0] < n, body, (0, x))[1]
        timeit(f"while_loop {n} iters, 1 op on [4096,128]", loop1, x)

    # 2. same but ~40 distinct ops per iter (kernel-count probe)
    for n in (13,):
        @jax.jit
        def loop40(x, n=n):
            def body(c):
                i, x = c
                for j in range(40):
                    x = jnp.roll(x, 1, axis=1) + j  # roll defeats fusion
                return i + 1, x
            return jax.lax.while_loop(lambda c: c[0] < n, body, (0, x))[1]
        timeit(f"while_loop {n} iters, 40 rolls on [4096,128]", loop40, x)

    # 3. batch-size scaling of the real engine step cost
    import bench
    from pywfa_tpu.align import WavefrontAligner
    from pywfa_tpu.batch import PATTERN_SENTINEL, TEXT_SENTINEL, encode_batch
    from pywfa_tpu.ops import engine as E
    rng = np.random.default_rng(0)
    api = WavefrontAligner(backend="numpy", span="end-to-end")
    attr = api._attributes()
    for B in (256, 4096):
        pats, txts = bench.make_pairs(rng, B, 150, 0.02)
        cfg = E.full_config(attr, 150, 150, W=128, S_cap=96)
        C = cfg.extend_chunk
        pat = jnp.asarray(encode_batch(pats, cfg.Lp, C, PATTERN_SENTINEL))
        txt = jnp.asarray(encode_batch(txts, cfg.Lt, C, TEXT_SENTINEL))
        plen = jnp.full((B,), 150, dtype=jnp.int32)
        tlen = jnp.full((B,), 150, dtype=jnp.int32)
        frees = jnp.zeros((B, 4), dtype=jnp.int32)
        ms = jnp.int32(2**31 - 1)
        timeit(f"align_batch B={B}",
               lambda *a: E.align_batch(cfg, *a)["final_s"],
               pat, txt, plen, tlen, frees, ms)


if __name__ == "__main__":
    main()
