"""Fused whole-alignment Pallas kernel (gap-affine, no heuristics).

One kernel instance per batch tile runs the *entire* WFA score loop with all
state resident in VMEM:

- the wavefront ring `offsets[3, scope, TB, W]` (the reference's modular
  memory, wavefront_components.c:92-93) lives in VMEM scratch,
- per-diagonal equality bits (32 h-positions per uint32 word, the VMEM
  analog of the reference's 64-bit blockwise compare kernel,
  wavefront_extend_kernels.c:64-88) stream HBM->VMEM once; every extension
  step is a find-first-mismatch over NQ = ceil(Ltp/32) words -- O(NQ) VPU
  ops per cell instead of the O(Ltp) one-hot run-length lookup,
- choice bytes accumulate in a VMEM output block and are written back once,
- each tile exits its loop as soon as its own pairs finish (the XLA
  while_loop runs to the global max).

Covers the production hot path: gap-affine penalties, end-to-end and
ends-free spans, full-CIGAR recording. Other metrics/heuristics use the XLA
engine (identical results either way -- enforced by tests).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...constants import AlignmentSpan, DistanceMetric, OFFSET_NULL

NULL = OFFSET_NULL  # python int: pallas kernels must not capture jax constants
NULL_THRESHOLD = OFFSET_NULL // 2

# must match ops.engine
ST_RUNNING = 0
ST_END_REACHED = 1
ST_END_UNREACHABLE = 2
ST_MAX_STEPS = 3
ST_OVERFLOW_S = 5
MSRC_NONE, MSRC_X, MSRC_I1, MSRC_D1 = 0, 1, 2, 3

M, I1, D1 = 0, 1, 2


def supported(cfg) -> bool:
    return (cfg.metric == DistanceMetric.GAP_AFFINE
            and cfg.strategy == 0
            and cfg.match == 0
            and cfg.use_lcp_table
            and cfg.record_choices
            # the choices HBM-stream DMA slices [TB, W] out of
            # [S_cap, B, W]; Mosaic requires the lane dim 128-aligned
            and cfg.W % 128 == 0)


def _ctz32(m):
    """Count trailing zeros of each uint32 lane (m != 0 assumed; the caller
    masks m == 0 lanes out).

    Isolate the lowest set bit, convert to float32 (exact: single bit), and
    read the exponent -- three VPU ops, no gather/popcount needed. Works
    for bit 31 too: the sign bit is shifted out before the 0xFF mask.
    """
    mi = m.astype(jnp.int32)
    lsb = mi & -mi
    f = jax.lax.convert_element_type(lsb, jnp.float32)
    e = (jax.lax.bitcast_convert_type(f, jnp.int32) >> 23) & 0xFF
    return e - 127


def _kernel(cfg, TB,
            plen_ref, tlen_ref, frees_ref, msteps_ref, bits_ref,
            choices_ref, res_ref,
            off_ref, lohi_ref, ch_scratch, ch_sem):
    """One tile's full score loop.

    plen/tlen: [TB, 1] i32; frees: [TB, 4] i32; msteps: [1, 1] SMEM
    bits: [NQ, TB, W] u32 packed equality words (engine._build_eq_bits);
    choices out: [S_cap, TB, W] u8 resident in HBM (each level is written
    once by an async copy from `ch_scratch`, so VMEM never holds the
    whole traceback record -- this is what lets TB grow to 256+)
    res out: [TB, 8] i32 (status, final_s, end_k, end_off)
    scratch off: [3 * scope, TB, W] i32; lohi: [3 * scope, TB, 2] i32
    """
    W = cfg.W
    scope = cfg.scope
    S_cap = cfg.S_cap
    kmin = cfg.kmin
    x = cfg.mismatch
    o1e1 = cfg.gap_opening1 + cfg.gap_extension1
    e1 = cfg.gap_extension1
    end2end = cfg.span == AlignmentSpan.END_TO_END
    NQ = bits_ref.shape[0]

    karr = jax.lax.broadcasted_iota(jnp.int32, (TB, W), 1) + kmin
    plen = plen_ref[:, :]  # [TB, 1]
    tlen = tlen_ref[:, :]
    msteps = msteps_ref[0, 0]

    # this tile's slice of the HBM-resident choices output
    tile0 = pl.program_id(0) * TB

    def ch_store(lvl):
        return pltpu.make_async_copy(
            ch_scratch, choices_ref.at[lvl, pl.ds(tile0, TB), :], ch_sem)

    # zero-fill all choice levels (byte parity with the XLA engine's
    # zero-initialized tensor; live levels are overwritten below)
    ch_scratch[:, :] = jnp.zeros((TB, W), jnp.uint8)

    def zfill(lvl, _):
        cp = ch_store(lvl)
        cp.start()
        cp.wait()
        return 0
    jax.lax.fori_loop(0, S_cap, zfill, 0)

    # --- WF0 (reference: wavefront_aligner.c:251-310) ---
    if cfg.span == AlignmentSpan.ENDS_FREE and cfg.match == 0:
        pbf = frees_ref[:, 0:1]
        tbf = frees_ref[:, 2:3]
        wf0_lo = -pbf
        wf0_hi = tbf
        off0 = jnp.where((karr >= 0) & (karr <= wf0_hi),
                         jnp.maximum(karr, 0),
                         jnp.where((karr < 0) & (karr >= wf0_lo), 0, NULL))
    else:
        wf0_lo = jnp.zeros((TB, 1), jnp.int32)
        wf0_hi = jnp.zeros((TB, 1), jnp.int32)
        off0 = jnp.where(karr == 0, 0, NULL)
    for c in range(3):
        for sl in range(scope):
            off_ref[c * scope + sl] = jnp.full((TB, W), NULL, jnp.int32)
            lohi_ref[c * scope + sl] = jnp.concatenate(
                [jnp.ones((TB, 1), jnp.int32), -jnp.ones((TB, 1), jnp.int32)],
                axis=1)
    off_ref[M * scope + 0] = off0.astype(jnp.int32)
    lohi_ref[M * scope + 0] = jnp.concatenate([wf0_lo, wf0_hi], axis=1)

    def band_mask(lo, hi):
        return (karr >= lo) & (karr <= hi)

    def read_wf(comp, score):
        """(off [TB,W], lo [TB,1], hi [TB,1], null [TB,1]) for a score."""
        valid = score >= 0
        slot = jax.lax.rem(jnp.maximum(score, 0), scope)
        o = off_ref[comp * scope + slot]
        lh = lohi_ref[comp * scope + slot]
        lo = lh[:, 0:1]
        hi = lh[:, 1:2]
        o = jnp.where(valid, o, NULL)
        lo = jnp.where(valid, lo, 1)
        hi = jnp.where(valid, hi, -1)
        return o, lo, hi, (~valid) | (lo > hi)

    def shift(a, dk):
        # a[:, i+dk] at i, NULL-padded; dk in {-1, +1}
        pad = jnp.full((TB, 1), NULL, jnp.int32)
        if dk > 0:
            return jnp.concatenate([a[:, 1:], pad], axis=1)
        return jnp.concatenate([pad, a[:, :-1]], axis=1)

    def pack(value, prio):
        return jnp.where(value >= 0, (value << 3) | prio, jnp.int32(-2**30))

    def trim(arr, lo, hi):
        band = band_mask(lo, hi)
        v = arr - karr
        h = arr
        inb = band & (h >= 0) & (h <= tlen) & (v >= 0) & (v <= plen)
        iota = jax.lax.broadcasted_iota(jnp.int32, (TB, W), 1)
        first = jnp.min(jnp.where(inb, iota, W), axis=1, keepdims=True) + kmin
        last = jnp.max(jnp.where(inb, iota, -1), axis=1, keepdims=True) + kmin
        any_ok = inb.any(axis=1, keepdims=True)
        nlo = jnp.where(any_ok, first, 1)
        nhi = jnp.where(any_ok, last, -1)
        return jnp.where(band_mask(nlo, nhi), arr, NULL), nlo, nhi

    def body(carry):
        s, done_i, status, final_s, end_k, end_off, nnull = carry
        done = done_i != 0
        active = ~done
        slot = jax.lax.rem(s, scope)
        m_off, m_lo, m_hi, m_null = read_wf(M, s)
        # m_exists: the M ring slot was written for this score; encode as
        # lo<=hi OR a real-null marker -- we track "exists" via nnull bookkeeping:
        # a slot never written for score s holds lo>hi (null); pointer-null
        # (no wavefront at all) is the same observable here except for the
        # feasibility probe, which uses nnull directly.
        # feasibility probe: only reachable through a run of null steps, so
        # slot-null here is equivalent to the reference's pointer-null check
        # (reference: wavefront_extend.c:100-106)
        dead = active & m_null & (nnull > scope)
        status = jnp.where(dead, ST_END_UNREACHABLE, status)
        final_s = jnp.where(dead, s, final_s)
        done = done | dead
        active = active & ~dead

        # --- extension: find-first-mismatch over VMEM equality words ---
        # (the same formulation as engine._extend_band_bits, with the word
        # stream resident in VMEM: mask word q0 below bit (off & 31), ctz
        # per word, min-reduce over the static NQ-word unroll)
        band = band_mask(m_lo, m_hi) & active & ~m_null
        valid = band & (m_off >= 0) & (m_off <= tlen)
        big = jnp.int32(NQ * 32)
        full32 = jnp.uint32(0xFFFFFFFF)
        idx = jnp.clip(m_off, 0, NQ * 32 - 1)
        q0 = idx >> 5
        r = (idx & 31).astype(jnp.uint32)
        # Mosaic lowers per-lane variable shifts natively (unlike XLA:TPU,
        # which expands them to select chains); float->uint casts are the
        # unsupported thing here, so keep the plain shift
        head = full32 << r
        fm = jnp.full((TB, W), NQ * 32, jnp.int32)
        for q in range(NQ):
            sel = jnp.where(q0 == q, head,
                            jnp.where(q0 < q, full32, jnp.uint32(0)))
            mq = ~bits_ref[q] & sel
            cand = q * 32 + _ctz32(mq)
            fm = jnp.minimum(fm, jnp.where(mq != 0, cand, big))
        # sentinel padding guarantees a mismatch bit before the row end,
        # so fm < NQ*32 whenever idx <= tlen
        m_off = jnp.where(valid, m_off + (fm - idx), m_off)
        off_ref[M * scope + slot] = m_off

        # --- termination ---
        if end2end:
            ak = tlen - plen
            cell = jnp.sum(jnp.where(karr == ak, m_off, 0), axis=1,
                           keepdims=True)
            on_band = (m_lo <= ak) & (ak <= m_hi)
            hit_t = active & (~m_null) & on_band & (cell >= tlen)
            t_k = ak
            t_off = tlen
        else:
            v = m_off - karr
            h = m_off
            cellv = band_mask(m_lo, m_hi) & (m_off > NULL_THRESHOLD)
            pef = frees_ref[:, 1:2]
            tef = frees_ref[:, 3:4]
            done_h = cellv & (h >= tlen) & ((plen - v) <= pef)
            done_v = cellv & (v >= plen) & ((tlen - h) <= tef)
            dmask = done_h | done_v
            iota = jax.lax.broadcasted_iota(jnp.int32, (TB, W), 1)
            firsti = jnp.min(jnp.where(dmask, iota, W), axis=1, keepdims=True)
            hit_t = active & (~m_null) & dmask.any(axis=1, keepdims=True)
            t_k = firsti + kmin
            sel = iota == firsti
            t_off = jnp.sum(jnp.where(sel, m_off, 0), axis=1, keepdims=True)
        status = jnp.where(hit_t, ST_END_REACHED, status)
        final_s = jnp.where(hit_t, s, final_s)
        end_k = jnp.where(hit_t, t_k, end_k)
        end_off = jnp.where(hit_t, t_off, end_off)
        done = done | hit_t
        active = active & ~hit_t

        # --- compute s+1 (reference: wavefront_compute_affine.c) ---
        s1 = s + 1
        slot1 = jax.lax.rem(s1, scope)
        mm_off, mm_lo, mm_hi, mm_null = read_wf(M, s1 - x)
        op_off, op_lo, op_hi, op_null = read_wf(M, s1 - o1e1)
        i1_off, i1_lo, i1_hi, i1_null = read_wf(I1, s1 - e1)
        d1_off, d1_lo, d1_hi, d1_null = read_wf(D1, s1 - e1)
        all_null = mm_null & op_null & i1_null & d1_null
        nnull = jnp.where(active & all_null, nnull + 1,
                          jnp.where(active, 0, nnull))
        big = jnp.int32(2**30)

        def lim(lo_, hi_, nul, widen):
            return (jnp.where(nul, big, lo_ - widen),
                    jnp.where(nul, -big, hi_ + widen))

        l1, h1 = lim(mm_lo, mm_hi, mm_null, 0)
        l2, h2 = lim(op_lo, op_hi, op_null, 1)
        l3, h3 = lim(i1_lo, i1_hi, i1_null, 1)
        l4, h4 = lim(d1_lo, d1_hi, d1_null, 1)
        lo_n = jnp.minimum(jnp.minimum(l1, l2), jnp.minimum(l3, l4))
        hi_n = jnp.maximum(jnp.maximum(h1, h2), jnp.maximum(h3, h4))
        lo_n = jnp.clip(lo_n, kmin + 2, kmin + W - 3)
        hi_n = jnp.clip(hi_n, kmin + 2, kmin + W - 3)

        i1o = pack(shift(op_off, -1) + 1, 0)
        i1e = pack(shift(i1_off, -1) + 1, 1)
        i1p = jnp.maximum(i1o, i1e)
        ins1 = jnp.where(i1p < 0,
                         shift(jnp.maximum(op_off, i1_off), -1) + 1, i1p >> 3)
        i1_ext = (i1p >= 0) & ((i1p & 7) == 1)
        d1o = pack(shift(op_off, +1), 0)
        d1e = pack(shift(d1_off, +1), 1)
        d1p = jnp.maximum(d1o, d1e)
        del1 = jnp.where(d1p < 0,
                         shift(jnp.maximum(op_off, d1_off), +1), d1p >> 3)
        d1_ext = (d1p >= 0) & ((d1p & 7) == 1)
        mis = mm_off + 1
        pm = jnp.maximum(pack(mis, 5), jnp.maximum(pack(del1, 3),
                                                   pack(ins1, 1)))
        raw = jnp.maximum(mis, jnp.maximum(del1, ins1))
        mvals = jnp.where(pm < 0, raw, pm >> 3)
        pr = pm & 7
        msrc = jnp.where(pm < 0, MSRC_NONE,
                         jnp.where(pr == 5, MSRC_X,
                                   jnp.where(pr == 3, MSRC_D1, MSRC_I1)))
        h_ = mvals
        v_ = mvals - karr
        bad = (h_ < 0) | (h_ > tlen) | (v_ < 0) | (v_ > plen)
        mvals = jnp.where(bad, NULL, mvals)
        choice = (msrc | (i1_ext.astype(jnp.int32) << 3)
                  | (d1_ext.astype(jnp.int32) << 4)).astype(jnp.uint8)

        write = active & ~all_null
        band_n = band_mask(lo_n, hi_n) & write
        m_arr = jnp.where(band_n, mvals, NULL)
        m_arr, m_tlo, m_thi = trim(m_arr, lo_n, hi_n)
        m_tlo = jnp.where(write, m_tlo, 1)
        m_thi = jnp.where(write, m_thi, -1)
        off_ref[M * scope + slot1] = m_arr
        lohi_ref[M * scope + slot1] = jnp.concatenate([m_tlo, m_thi], axis=1)

        i1_prod = write & ~(op_null & i1_null)
        i_arr = jnp.where(band_n & i1_prod, ins1, NULL)
        i_arr, i_tlo, i_thi = trim(i_arr, lo_n, hi_n)
        i_tlo = jnp.where(i1_prod, i_tlo, 1)
        i_thi = jnp.where(i1_prod, i_thi, -1)
        off_ref[I1 * scope + slot1] = i_arr
        lohi_ref[I1 * scope + slot1] = jnp.concatenate([i_tlo, i_thi], axis=1)

        d1_prod = write & ~(op_null & d1_null)
        d_arr = jnp.where(band_n & d1_prod, del1, NULL)
        d_arr, d_tlo, d_thi = trim(d_arr, lo_n, hi_n)
        d_tlo = jnp.where(d1_prod, d_tlo, 1)
        d_thi = jnp.where(d1_prod, d_thi, -1)
        off_ref[D1 * scope + slot1] = d_arr
        lohi_ref[D1 * scope + slot1] = jnp.concatenate([d_tlo, d_thi], axis=1)

        ch_scratch[:, :] = jnp.where(band_mask(lo_n, hi_n) & write, choice,
                                     jnp.uint8(0))
        cp = ch_store(s1)
        cp.start()
        cp.wait()

        hit_max = active & (s1 >= msteps)
        status = jnp.where(hit_max, ST_MAX_STEPS, status)
        final_s = jnp.where(hit_max, s1, final_s)
        done = done | hit_max
        return (s1, done.astype(jnp.int32), status, final_s, end_k, end_off,
                nnull)

    def cond(carry):
        s, done_i, *_ = carry
        return (jnp.sum(1 - done_i) > 0) & (s < S_cap - 1)

    init = (
        jnp.int32(0),
        jnp.zeros((TB, 1), jnp.int32),
        jnp.zeros((TB, 1), jnp.int32),
        jnp.zeros((TB, 1), jnp.int32),
        jnp.zeros((TB, 1), jnp.int32),
        jnp.full((TB, 1), NULL, jnp.int32),
        jnp.zeros((TB, 1), jnp.int32),
    )
    s, done_i, status, final_s, end_k, end_off, nnull = jax.lax.while_loop(
        cond, body, init)
    running = done_i == 0
    status = jnp.where(running, ST_OVERFLOW_S, status)
    final_s = jnp.where(running, s, final_s)
    res = jnp.concatenate([
        status, final_s, end_k, end_off,
        jnp.zeros((TB, 4), jnp.int32)], axis=1)
    res_ref[:, :] = res


@functools.partial(jax.jit, static_argnums=(0, 1))
def align_batch_pallas(cfg, TB, bits, plen, tlen, frees, max_steps):
    """Run the fused loop kernel over B pairs in tiles of TB.

    bits: [NQ, B, W] uint32 (engine.build_eq_bits); plen/tlen: [B] int32;
    frees: [B, 4] int32.
    Returns dict(status, final_s, end_k, end_off, choices, steps).
    """
    NQ, B = bits.shape[0], bits.shape[1]
    assert B % TB == 0, (B, TB)
    grid = (B // TB,)
    W, S_cap, scope = cfg.W, cfg.S_cap, cfg.scope
    interpret = jax.default_backend() == "cpu"

    kernel = functools.partial(_kernel, cfg, TB)
    out_shapes = (
        jax.ShapeDtypeStruct((S_cap, B, W), jnp.uint8),
        jax.ShapeDtypeStruct((B, 8), jnp.int32),
    )
    choices, res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TB, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((NQ, TB, W), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((TB, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((3 * scope, TB, W), jnp.int32),
            pltpu.VMEM((3 * scope, TB, 2), jnp.int32),
            pltpu.VMEM((TB, W), jnp.uint8),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(plen[:, None].astype(jnp.int32), tlen[:, None].astype(jnp.int32),
      frees.astype(jnp.int32), max_steps.reshape(1, 1), bits)
    return dict(
        status=res[:, 0], final_s=res[:, 1], end_k=res[:, 2],
        end_off=res[:, 3], choices=choices,
        steps=jnp.max(res[:, 1]),
    )
