"""Fused whole-alignment Pallas kernel (gap-affine + affine2p,
optionally with the WF-adaptive, X-drop and Z-drop heuristics).

One kernel instance per batch tile runs the *entire* WFA score loop with all
state resident in VMEM:

- the wavefront ring `offsets[n_comp, scope, TB, W]` (the reference's
  modular memory, wavefront_components.c:92-93) lives in VMEM scratch
  (n_comp = 3 for gap-affine, 5 for affine2p),
- per-diagonal equality bits (32 h-positions per uint32 word, the VMEM
  analog of the reference's 64-bit blockwise compare kernel,
  wavefront_extend_kernels.c:64-88) stream HBM->VMEM once; every extension
  step is a find-first-mismatch over NQ = ceil(Ltp/32) words -- O(NQ) VPU
  ops per cell instead of the O(Ltp) one-hot run-length lookup,
- choice bytes accumulate in a VMEM output block and are written back once,
- the heuristic cascade (WF-adaptive band-shrink, X-drop pruning, Z-drop
  abandonment with historic-max bookkeeping; reference:
  wavefront_heuristic.c:176-450) runs in-loop over the same VMEM rows,
- each tile exits its loop as soon as its own pairs finish (the XLA
  while_loop runs to the global max).

Covers every distance metric: gap-affine and affine2p (3/5-component
rings), and the 1-component gap-linear / edit / indel recurrences
(reference: wavefront_compute_linear.c:44-86, wavefront_compute_edit.c:
330-374); end-to-end and ends-free spans (plus match!=0 on end-to-end --
the Eizenga-internal recurrence is match-0 there, only the drop
heuristics' swg_match constant differs); full-CIGAR recording; and the COMPLETE
heuristic family in-loop -- wfadaptive, wfmash (length-normalized
distance), x-drop, z-drop, banded static/adaptive, and their cascade
combos (reference: wavefront_heuristic.c:176-505). Class-mask matching
works through the kernel too: the eq-bits stream is built by
engine._build_eq_bits with the class-mask compare baked in, so the
kernel never touches raw characters (tests/test_pallas_kernel.py::
test_match_classes_kernel). match != 0 is covered on both spans --
END_TO_END runs the identical match-0 internal recurrence, ENDS_FREE
adds the per-score boundary seeding in-kernel (ef_seeding; reference:
wavefront_compute.c:124-254) -- so the kernel covers the engine's
entire metric x span x strategy x matching space; per-shape routing
between it and the XLA engine is measured (routed_tile), and results
are identical either way (enforced by tests).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...constants import (AlignmentSpan, DistanceMetric, HeuristicStrategy,
                          OFFSET_NULL)

NULL = OFFSET_NULL  # python int: pallas kernels must not capture jax constants
NULL_THRESHOLD = OFFSET_NULL // 2

# must match ops.engine
ST_RUNNING = 0
ST_END_REACHED = 1
ST_END_UNREACHABLE = 2
ST_MAX_STEPS = 3
ST_OVERFLOW_S = 5
MSRC_NONE, MSRC_X, MSRC_I1, MSRC_D1, MSRC_I2, MSRC_D2 = 0, 1, 2, 3, 4, 5
MSRC_SEED = 7

M, I1, D1, I2, D2 = 0, 1, 2, 3, 4


_KERNEL_STRATEGIES = int(HeuristicStrategy.WFADAPTIVE
                         | HeuristicStrategy.WFMASH
                         | HeuristicStrategy.XDROP
                         | HeuristicStrategy.ZDROP
                         | HeuristicStrategy.BANDED_STATIC
                         | HeuristicStrategy.BANDED_ADAPTIVE)


_ONE_COMP = (DistanceMetric.GAP_LINEAR, DistanceMetric.EDIT,
             DistanceMetric.INDEL)


def supported(cfg) -> bool:
    return ((cfg.strategy & ~_KERNEL_STRATEGIES) == 0
            # match != 0: END_TO_END runs the identical match-0 internal
            # recurrence over the Eizenga penalties the config carries;
            # ENDS_FREE adds the per-score boundary seeding, which runs
            # in-kernel (ef_seeding); the drop heuristics' swg_match
            # constant is in-kernel for both
            and cfg.use_lcp_table
            # the choices HBM-stream DMA slices [TB, W] out of
            # [S_cap, B, W]; Mosaic requires the lane dim 128-aligned
            and cfg.W % 128 == 0)


def n_comp(cfg) -> int:
    if cfg.metric in _ONE_COMP:
        return 1
    return 5 if cfg.metric == DistanceMetric.GAP_AFFINE_2P else 3


def vmem_estimate(cfg, TB: int) -> int:
    """VMEM bytes one kernel tile allocates, derived from the SAME shapes
    align_batch_pallas passes to pallas_call (in_specs/scratch_shapes
    below) so the routing predicate in batch.pallas_plan cannot
    desynchronize from the kernel's real scratch layout. Excludes the
    per-step register-like temporaries, which the caller budgets as
    headroom against the ~16 MB/core VMEM."""
    NQ = -(-(cfg.Lt + cfg.extend_chunk) // 32)
    W, scope = cfg.W, cfg.scope
    return (NQ * TB * W * 4                      # eq-bits tile
            + n_comp(cfg) * scope * TB * W * 4   # offsets ring scratch
            + n_comp(cfg) * scope * TB * 2 * 4   # lo/hi ring scratch
            + 2 * TB * W                         # choices stream scratch
            + TB * (1 + 1 + 4 + 8) * 4)          # plen/tlen/frees/result


def routed_tile(cfg):
    """Measured routing: batch-tile size when the fused kernel beats the
    XLA engine for this config, else None (XLA is faster).

    v5e slope-timed ms/batch (tools/bench_pallas.py):

    4096 x 150bp, W=128/S_cap=96: affine 5.6 pallas vs 6.7 XLA (TB=32);
    ends-free affine 5.5 vs 6.8 (TB=32); affine + wfadaptive 6.3 vs 7.6
    (TB=64); affine2p + wfadaptive 6.6 vs 31.0 (TB=64, the XLA heuristic
    path pays per-component equates); plain affine2p 7.4 vs 5.7 -- the
    5-component arithmetic chain is issue-bound at kernel tile sizes
    while XLA amortizes over the full batch, so that config routes to
    XLA.

    512 x 1kb, W=256/S_cap=192 (the production 1 kb rung): affine 5.9
    pallas vs 32.8 XLA (TB=32); plain affine2p 7.0 vs 32.9 (TB=16 --
    the wider band feeds the VPU enough that the kernel wins affine2p
    too); affine + wfadaptive 7.3 vs 33.2 (TB=64). Losing shape on
    record: plain affine2p at W<=128 only.

    1-component metrics (tools/bench_pallas.py, v5e, this round):

    4096 x 150bp, W=128/S_cap=96: XLA wins every one -- linear 3.3 XLA
    vs 3.6 pallas (best TB=32), edit 2.4 vs 3.2 (TB=128), indel 3.2 vs
    3.8 (TB=32); the single-component XLA step is cheap enough that the
    kernel's tile-granular loop exit cannot pay for itself -> route to
    XLA at W <= 128.

    512 x 1kb, W=256/S_cap=192: the kernel wins every one -- linear 5.1
    pallas (TB=64) vs 31.9 XLA (6.3x, 100 GCUPS), edit 3.5 (TB=64) vs
    9.7 (2.8x, 145 GCUPS), indel 4.7 (TB=64) vs 16.9 (3.6x) -> route
    W >= 256 to the kernel at TB=64.

    match != 0 (END_TO_END) runs the identical match-0 recurrence over
    the Eizenga-internal penalties (only the drop heuristics' swg_match
    constant differs), so each metric's measured routing above applies
    unchanged.

    Remaining strategies, 4096 x 150bp W=128/S_cap=96 (this round):
    wfmash 6.2 pallas (TB=64) vs 7.9 XLA -> kernel; banded-static 5.4
    (TB=64) vs 5.2 XLA and banded-adaptive 7.3 (TB=32/128) vs 6.7 XLA ->
    pure-banded configs route to XLA at W <= 128 (the band clamp is one
    cheap vector op XLA fuses well); banded combos with drops keep the
    drop cascade's measured kernel win.
    """
    if not supported(cfg):
        return None
    if cfg.metric in _ONE_COMP:
        # measured: XLA faster at W<=128, kernel 2.8-6.3x faster at
        # W>=256 (docstring table)
        return 64 if cfg.W >= 256 else None
    _BANDED = int(HeuristicStrategy.BANDED_STATIC
                  | HeuristicStrategy.BANDED_ADAPTIVE)
    if cfg.strategy and (cfg.strategy & ~_BANDED) == 0:
        # pure banded: measured XLA win at W<=128 (docstring)
        return 64 if cfg.W >= 256 else None
    if cfg.strategy:
        return 64
    if cfg.metric == DistanceMetric.GAP_AFFINE_2P:
        # crossover measured between W=128 (XLA wins) and W=256 (kernel
        # wins 4.7x); route wider-band 2p shapes to the kernel
        return 16 if cfg.W >= 256 else None
    return 32


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
            plen_ref, tlen_ref, frees_ref, msteps_ref, bits_ref, *refs):
    """One tile's full score loop.

    plen/tlen: [TB, 1] i32; frees: [TB, 4] i32; msteps: [1, 1] SMEM
    bits: [NQ, TB, W] u32 packed equality words (engine._build_eq_bits);
    choices out: [S_cap, TB, W] u8 resident in HBM (each level is written
    once by an async copy from `ch_scratch`, so VMEM never holds the
    whole traceback record -- this is what lets TB grow to 256+)
    res out: [TB, 8] i32 (status, final_s, end_k, end_off)
    scratch off: [NC * scope, TB, W] i32; lohi: [NC * scope, TB, 2] i32
    """
    record = cfg.record_choices
    if record:
        (zeros_ref, choices_ref, res_ref, off_ref, lohi_ref, ch_scratch,
         ch_sem) = refs
    else:
        res_ref, off_ref, lohi_ref = refs
    W = cfg.W
    scope = cfg.scope
    S_cap = cfg.S_cap
    kmin = cfg.kmin
    x = cfg.mismatch
    o1e1 = cfg.gap_opening1 + cfg.gap_extension1
    e1 = cfg.gap_extension1
    o2e2 = cfg.gap_opening2 + cfg.gap_extension2
    e2 = cfg.gap_extension2
    affine2p = cfg.metric == DistanceMetric.GAP_AFFINE_2P
    edit_like = cfg.metric in (DistanceMetric.EDIT, DistanceMetric.INDEL)
    linear = cfg.metric == DistanceMetric.GAP_LINEAR
    one_comp = edit_like or linear
    # SW score units for the drop heuristics (engine._heuristic_cutoff)
    swg_match = -cfg.match if cfg.match != 0 else 1
    NC = n_comp(cfg)
    wfadaptive = bool(cfg.strategy & (HeuristicStrategy.WFADAPTIVE
                                      | HeuristicStrategy.WFMASH))
    wfmash = bool(cfg.strategy & HeuristicStrategy.WFMASH)
    xdrop = bool(cfg.strategy & HeuristicStrategy.XDROP)
    zdrop = (not xdrop) and bool(cfg.strategy & HeuristicStrategy.ZDROP)
    banded_static = bool(cfg.strategy & HeuristicStrategy.BANDED_STATIC)
    banded_adaptive = (not banded_static) and bool(
        cfg.strategy & HeuristicStrategy.BANDED_ADAPTIVE)
    use_heuristic = cfg.strategy != 0
    # ends-free match != 0: per-score boundary seeding at every
    # match-multiple score (engine._endsfree_seed; reference:
    # wavefront_compute.c:124-254). Edit/indel have no match weight.
    ef_seeding = (cfg.span == AlignmentSpan.ENDS_FREE and cfg.match != 0
                  and not edit_like)
    end2end = cfg.span == AlignmentSpan.END_TO_END
    NQ = bits_ref.shape[0]

    karr = jax.lax.broadcasted_iota(jnp.int32, (TB, W), 1) + kmin
    plen = plen_ref[:, :]  # [TB, 1]
    tlen = tlen_ref[:, :]
    msteps = msteps_ref[0, 0]

    if record:
        # this tile's slice of the HBM-resident choices output
        tile0 = pl.program_id(0) * TB

        def ch_store(par, lvl):
            return pltpu.make_async_copy(
                ch_scratch.at[par], choices_ref.at[lvl, pl.ds(tile0, TB), :],
                ch_sem.at[par])

        # choice levels arrive pre-zeroed: the output buffer is aliased
        # to a zeros input (byte parity with the XLA engine's
        # zero-initialized tensor); live levels are overwritten below. An
        # in-kernel DMA zero-fill is NOT safe here -- queueing S_cap copy
        # starts before any wait exceeds the DMA queue depth past ~100
        # levels and deadlocks the device (observed at S_cap=192).
        del zeros_ref  # aliased storage; never read in-kernel

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
    for c in range(NC):
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

    def body(carry):
        (s, done_i, status, final_s, end_k, end_off, nnull, h_wait,
         hm_sw, hm_k, hm_off, hm_wfs, hm_valid) = carry
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

        # --- heuristic cascade (reference: wavefront_heuristic.c:509-567):
        # wf-adaptive -> x-drop|z-drop, each stage re-checking steps_wait
        # at entry; band-shrink of slot s before compute reads it,
        # mirroring engine._heuristic_cutoff byte-for-byte ---
        if use_heuristic:
            eligible = active & ~m_null
            h_wait = jnp.where(eligible, h_wait - 1, h_wait)
            cur_lo, cur_hi = m_lo, m_hi
            iota_h = jax.lax.broadcasted_iota(jnp.int32, (TB, W), 1)
        if wfadaptive:
            ready = eligible & (h_wait <= 0)
            do_h = ready & ((cur_hi - cur_lo + 1) >= cfg.min_wavefront_length)
            hband = band_mask(cur_lo, cur_hi)
            v_h = m_off - karr
            if wfmash:
                # length-normalized distance (engine._heuristic_cutoff
                # wfmash branch; reference: wavefront_heuristic.c:308-335)
                mfactor = (plen + tlen).astype(jnp.float32) / 2
                lv = ((plen - v_h).astype(jnp.float32)
                      / plen.astype(jnp.float32) * mfactor).astype(jnp.int32)
                lh = ((tlen - m_off).astype(jnp.float32)
                      / tlen.astype(jnp.float32) * mfactor).astype(jnp.int32)
                dist = jnp.maximum(lv, lh)
            else:
                dist = jnp.maximum(plen - v_h, tlen - m_off)
            dist = jnp.where(m_off >= 0, dist, jnp.int32(-NULL))
            mind = jnp.min(jnp.where(hband, dist, jnp.maximum(plen, tlen)),
                           axis=1, keepdims=True)
            keep = (dist - mind) <= cfg.max_distance_threshold
            ak_h = tlen - plen
            # reduce from bottom over [lo, min(ak, hi))
            top_limit = jnp.minimum(ak_h, cur_hi)
            stop_bot = hband & (karr < top_limit) & keep
            any_bot = stop_bot.any(axis=1, keepdims=True)
            first_keep = jnp.min(jnp.where(stop_bot, iota_h, W), axis=1,
                                 keepdims=True) + kmin
            lo_red = jnp.where(any_bot, first_keep,
                               jnp.maximum(top_limit, cur_lo))
            new_lo = jnp.where(do_h, jnp.maximum(lo_red, cur_lo), cur_lo)
            # reduce from top over (max(ak, new_lo), hi]
            bot_limit = jnp.maximum(ak_h, new_lo)
            stop_top = hband & (karr > bot_limit) & keep
            any_top = stop_top.any(axis=1, keepdims=True)
            last_keep = jnp.max(jnp.where(stop_top, iota_h, -1), axis=1,
                                keepdims=True) + kmin
            hi_red = jnp.where(any_top, last_keep,
                               jnp.minimum(bot_limit, cur_hi))
            new_hi = jnp.where(do_h, jnp.minimum(hi_red, cur_hi), cur_hi)
            h_wait = jnp.where(do_h, cfg.steps_between_cutoffs, h_wait)
            cur_lo, cur_hi = new_lo, new_hi
        if xdrop or zdrop:
            # (reference: wavefront_heuristic.c:338-450; engine parity
            # incl. the re-checked steps_wait entry guard)
            do_d = eligible & (h_wait <= 0)
            dband = band_mask(cur_lo, cur_hi)
            v_d = m_off - karr
            num = swg_match * (v_d + m_off) - s
            sw = jnp.where(num >= 0, num >> 1, -((-num) >> 1))
            validc = dband & (m_off >= 0)
            neg_big = jnp.int32(-2**30)
            swm = jnp.where(validc, sw, neg_big)
            cmax = jnp.max(swm, axis=1, keepdims=True)
            # first lane attaining the max (engine argmax semantics)
            cidx = jnp.min(jnp.where(swm == cmax, iota_h, W), axis=1,
                           keepdims=True)
            cmax_k = cidx + kmin
            sel_c = iota_h == cidx
            cmax_off = jnp.sum(jnp.where(sel_c, m_off, 0), axis=1,
                               keepdims=True)
            have_hist = hm_valid != 0
            if xdrop:
                prune = do_d & have_hist
                keepx = validc & ((hm_sw - sw) < cfg.xdrop)
                any_keep = keepx.any(axis=1, keepdims=True)
                firstx = jnp.min(jnp.where(keepx, iota_h, W), axis=1,
                                 keepdims=True) + kmin
                lastx = jnp.max(jnp.where(keepx, iota_h, -1), axis=1,
                                keepdims=True) + kmin
                cur_lo = jnp.where(prune, jnp.where(any_keep, firstx,
                                                    cur_hi + 1), cur_lo)
                cur_hi = jnp.where(prune, jnp.where(any_keep, lastx,
                                                    cur_lo - 1), cur_hi)
                upd = do_d & ((~have_hist) | (cmax > hm_sw))
                hm_sw = jnp.where(upd, cmax, hm_sw)
                hm_k = jnp.where(upd, cmax_k, hm_k)
                hm_valid = jnp.where(do_d, 1, hm_valid)
                h_wait = jnp.where(do_d, cfg.steps_between_cutoffs, h_wait)
            else:  # zdrop
                improved = cmax > hm_sw
                zdropped = do_d & have_hist & (~improved) & (
                    (hm_sw - cmax) > cfg.zdrop)
                upd = do_d & ((~have_hist) | improved)
                hm_sw = jnp.where(upd, cmax, hm_sw)
                hm_wfs = jnp.where(upd, s, hm_wfs)
                hm_k = jnp.where(upd, cmax_k, hm_k)
                hm_off = jnp.where(upd, cmax_off, hm_off)
                hm_valid = jnp.where(do_d, 1, hm_valid)
                h_wait = jnp.where(do_d & ~zdropped,
                                   cfg.steps_between_cutoffs, h_wait)
                status = jnp.where(zdropped, ST_END_UNREACHABLE, status)
                final_s = jnp.where(zdropped, s, final_s)
                end_k = jnp.where(zdropped, hm_k, end_k)
                end_off = jnp.where(zdropped, hm_off, end_off)
                done = done | zdropped
                active = active & ~zdropped
        if banded_static:
            # (engine._heuristic_cutoff banded-static; reference:
            # wavefront_heuristic.c:454-470) -- no steps_wait gate
            cur_lo = jnp.where(eligible,
                               jnp.maximum(cur_lo, cfg.band_min_k), cur_lo)
            cur_hi = jnp.where(eligible,
                               jnp.minimum(cur_hi, cfg.band_max_k), cur_hi)
        elif banded_adaptive:
            # (engine parity; reference: wavefront_heuristic.c:472-505)
            wf_len = cur_hi - cur_lo + 1
            max_len = cfg.band_max_k - cfg.band_min_k + 1
            ticked = eligible & (h_wait <= 0) & (wf_len >= 4)
            do_b = ticked & (wf_len > max_len)

            def dist_at(kq):
                # one-hot band read (kq always within the clipped band)
                sel_q = karr == kq
                o = jnp.sum(jnp.where(sel_q, m_off, 0), axis=1,
                            keepdims=True)
                d = jnp.maximum(plen - (o - kq), tlen - o)
                return jnp.where(o >= 0, d, jnp.int32(-NULL))

            leeway = (wf_len - max_len) // 2
            quarter = wf_len // 4
            d0 = dist_at(cur_lo)
            d1 = dist_at(cur_lo + quarter)
            d2 = dist_at(cur_lo + 2 * quarter)
            d3 = dist_at(cur_hi)
            new_lo0 = (cur_lo + jnp.where(d0 > d3, leeway, 0)
                       + jnp.where(d1 > d2, leeway, 0))
            nlo = jnp.maximum(new_lo0, cur_lo)
            nhi = jnp.minimum(new_lo0 + max_len - 1, cur_hi)
            cur_lo = jnp.where(do_b, nlo, cur_lo)
            cur_hi = jnp.where(do_b, nhi, cur_hi)
            h_wait = jnp.where(ticked, cfg.steps_between_cutoffs, h_wait)
        if use_heuristic:
            # install the pruned M band + equate I/D once per cascade
            # (reference: heuristic.c:554-565)
            changed = eligible & ((cur_lo != m_lo) | (cur_hi != m_hi))
            m_off = jnp.where(changed & ~band_mask(cur_lo, cur_hi), NULL,
                              m_off)
            off_ref[M * scope + slot] = m_off
            lohi_ref[M * scope + slot] = jnp.concatenate(
                [jnp.where(changed, cur_lo, m_lo),
                 jnp.where(changed, cur_hi, m_hi)], axis=1)
            for comp in range(1, NC):
                clh = lohi_ref[comp * scope + slot]
                clo = clh[:, 0:1]
                chi = clh[:, 1:2]
                nlo = jnp.where(changed, jnp.maximum(clo, cur_lo), clo)
                nhi = jnp.where(changed, jnp.minimum(chi, cur_hi), chi)
                coff = off_ref[comp * scope + slot]
                coff = jnp.where(changed & ~band_mask(nlo, nhi), NULL, coff)
                off_ref[comp * scope + slot] = coff
                lohi_ref[comp * scope + slot] = jnp.concatenate([nlo, nhi],
                                                                axis=1)

        # --- compute s+1 (reference: wavefront_compute_affine.c /
        # _linear.c:44-86 / _edit.c:330-374) ---
        s1 = s + 1
        slot1 = jax.lax.rem(s1, scope)
        big = jnp.int32(2**30)

        def lim(lo_, hi_, nul, widen):
            return (jnp.where(nul, big, lo_ - widen),
                    jnp.where(nul, -big, hi_ + widen))

        if edit_like:
            # all three candidates read the single previous wavefront
            # (engine._step_compute_edit byte-for-byte)
            p_off, p_lo, p_hi, p_null = read_wf(M, s1 - 1)
            lo_n = p_lo - 1
            hi_n = p_hi + 1
            all_null = p_null
            cand_i = pack(shift(p_off, -1) + 1, 1)
            cand_d = pack(shift(p_off, +1), 3)
            if cfg.metric == DistanceMetric.EDIT:
                pm = jnp.maximum(pack(p_off + 1, 5),
                                 jnp.maximum(cand_d, cand_i))
            else:  # INDEL: no mismatch candidate
                pm = jnp.maximum(cand_d, cand_i)
            raw = pm >> 3  # engine edit: null-ish, bounds-check nulls it
            pr = pm & 7
            msrc = jnp.where(pr == 5, MSRC_X,
                             jnp.where(pr == 3, MSRC_D1,
                                       jnp.where(pr == 1, MSRC_I1,
                                                 MSRC_NONE)))
            choice = msrc.astype(jnp.uint8)
        elif linear:
            # (engine._step_compute linear branch byte-for-byte)
            mm_off, mm_lo, mm_hi, mm_null = read_wf(M, s1 - x)
            op_off, op_lo, op_hi, op_null = read_wf(
                M, s1 - cfg.gap_opening1)
            l1, h1 = lim(mm_lo, mm_hi, mm_null, 0)
            l2, h2 = lim(op_lo, op_hi, op_null, 1)
            lo_n = jnp.minimum(l1, l2)
            hi_n = jnp.maximum(h1, h2)
            all_null = mm_null & op_null
            pm = jnp.maximum(pack(mm_off + 1, 5),
                             jnp.maximum(pack(shift(op_off, +1), 3),
                                         pack(shift(op_off, -1) + 1, 1)))
            raw = jnp.where(pm < 0, jnp.int32(NULL), pm >> 3)
            pr = pm & 7
            msrc = jnp.where(pr == 5, MSRC_X,
                             jnp.where(pr == 3, MSRC_D1,
                                       jnp.where(pr == 1, MSRC_I1,
                                                 MSRC_NONE)))
            choice = msrc.astype(jnp.uint8)
        else:
            mm_off, mm_lo, mm_hi, mm_null = read_wf(M, s1 - x)
            op_off, op_lo, op_hi, op_null = read_wf(M, s1 - o1e1)
            i1_off, i1_lo, i1_hi, i1_null = read_wf(I1, s1 - e1)
            d1_off, d1_lo, d1_hi, d1_null = read_wf(D1, s1 - e1)
            l1, h1 = lim(mm_lo, mm_hi, mm_null, 0)
            l2, h2 = lim(op_lo, op_hi, op_null, 1)
            l3, h3 = lim(i1_lo, i1_hi, i1_null, 1)
            l4, h4 = lim(d1_lo, d1_hi, d1_null, 1)
            lo_n = jnp.minimum(jnp.minimum(l1, l2), jnp.minimum(l3, l4))
            hi_n = jnp.maximum(jnp.maximum(h1, h2), jnp.maximum(h3, h4))
            all_null = mm_null & op_null & i1_null & d1_null

        if not one_comp:
            i1o = pack(shift(op_off, -1) + 1, 0)
            i1e = pack(shift(i1_off, -1) + 1, 1)
            i1p = jnp.maximum(i1o, i1e)
            ins1 = jnp.where(i1p < 0,
                             shift(jnp.maximum(op_off, i1_off), -1) + 1,
                             i1p >> 3)
            i1_ext = (i1p >= 0) & ((i1p & 7) == 1)
            d1o = pack(shift(op_off, +1), 0)
            d1e = pack(shift(d1_off, +1), 1)
            d1p = jnp.maximum(d1o, d1e)
            del1 = jnp.where(d1p < 0,
                             shift(jnp.maximum(op_off, d1_off), +1),
                             d1p >> 3)
            d1_ext = (d1p >= 0) & ((d1p & 7) == 1)
            mis = mm_off + 1

            if affine2p:
                op2_off, op2_lo, op2_hi, op2_null = read_wf(M, s1 - o2e2)
                i2_off, i2_lo, i2_hi, i2_null = read_wf(I2, s1 - e2)
                d2_off, d2_lo, d2_hi, d2_null = read_wf(D2, s1 - e2)
                l5, h5 = lim(op2_lo, op2_hi, op2_null, 1)
                l6, h6 = lim(i2_lo, i2_hi, i2_null, 1)
                l7, h7 = lim(d2_lo, d2_hi, d2_null, 1)
                lo_n = jnp.minimum(lo_n,
                                   jnp.minimum(l5, jnp.minimum(l6, l7)))
                hi_n = jnp.maximum(hi_n,
                                   jnp.maximum(h5, jnp.maximum(h6, h7)))
                all_null = all_null & op2_null & i2_null & d2_null

                i2o = pack(shift(op2_off, -1) + 1, 0)
                i2e = pack(shift(i2_off, -1) + 1, 1)
                i2p = jnp.maximum(i2o, i2e)
                ins2 = jnp.where(i2p < 0,
                                 shift(jnp.maximum(op2_off, i2_off), -1) + 1,
                                 i2p >> 3)
                i2_ext = (i2p >= 0) & ((i2p & 7) == 1)
                d2o = pack(shift(op2_off, +1), 0)
                d2e = pack(shift(d2_off, +1), 1)
                d2p = jnp.maximum(d2o, d2e)
                del2 = jnp.where(d2p < 0,
                                 shift(jnp.maximum(op2_off, d2_off), +1),
                                 d2p >> 3)
                d2_ext = (d2p >= 0) & ((d2p & 7) == 1)
                # global priority X(5) > D2(4) > D1(3) > I2(2) > I1(1)
                pm = jnp.maximum(
                    jnp.maximum(pack(mis, 5), pack(del2, 4)),
                    jnp.maximum(pack(del1, 3),
                                jnp.maximum(pack(ins2, 2), pack(ins1, 1))))
                raw = jnp.maximum(jnp.maximum(mis, del2),
                                  jnp.maximum(del1, jnp.maximum(ins2, ins1)))
                pr = pm & 7
                msrc = jnp.where(
                    pm < 0, MSRC_NONE,
                    jnp.where(pr == 5, MSRC_X,
                              jnp.where(pr == 4, MSRC_D2,
                                        jnp.where(pr == 3, MSRC_D1,
                                                  jnp.where(pr == 2, MSRC_I2,
                                                            MSRC_I1)))))
                choice = (msrc | (i1_ext.astype(jnp.int32) << 3)
                          | (d1_ext.astype(jnp.int32) << 4)
                          | (i2_ext.astype(jnp.int32) << 5)
                          | (d2_ext.astype(jnp.int32) << 6)
                          ).astype(jnp.uint8)
            else:
                pm = jnp.maximum(pack(mis, 5), jnp.maximum(pack(del1, 3),
                                                           pack(ins1, 1)))
                raw = jnp.maximum(mis, jnp.maximum(del1, ins1))
                pr = pm & 7
                msrc = jnp.where(
                    pm < 0, MSRC_NONE,
                    jnp.where(pr == 5, MSRC_X,
                              jnp.where(pr == 3, MSRC_D1, MSRC_I1)))
                choice = (msrc | (i1_ext.astype(jnp.int32) << 3)
                          | (d1_ext.astype(jnp.int32) << 4)
                          ).astype(jnp.uint8)

        if edit_like:
            # a null current wavefront is immediately infeasible
            # (engine._step_compute_edit num_null_steps = 2**30,
            # reference: compute_edit.c:366); applied after trim below
            pass
        else:
            nnull = jnp.where(active & all_null, nnull + 1,
                              jnp.where(active, 0, nnull))

        if one_comp:
            mvals = raw
        else:
            mvals = jnp.where(pm < 0, raw, pm >> 3)
        h_ = mvals
        v_ = mvals - karr
        bad = (h_ < 0) | (h_ > tlen) | (v_ < 0) | (v_ > plen)
        mvals = jnp.where(bad, NULL, mvals)

        null_step = all_null
        seeded_null = None
        if ef_seeding:
            # (engine._endsfree_seed byte-for-byte; reference:
            # wavefront_compute.c:124-254 incl. the phantom null-step
            # wavefront that keeps the heuristic cadence ticking)
            need_s = jax.lax.rem(s1, -cfg.match) == 0
            ek = s1 // (-cfg.match)
            pbf_s = frees_ref[:, 0:1]
            tbf_s = frees_ref[:, 2:3]
            need = need_s & ((pbf_s > 0) | (tbf_s > 0))
            seed_t = need & (tbf_s >= ek)
            seed_p = need & (pbf_s >= ek)
            at_pk = karr == ek
            at_nk = karr == -ek
            do_t = seed_t & at_pk & (mvals <= ek)
            do_p = seed_p & at_nk & (mvals <= 0)
            mvals = jnp.where(do_t, ek, mvals)
            mvals = jnp.where(do_p, 0, mvals)
            choice = jnp.where(do_t | do_p, jnp.uint8(MSRC_SEED), choice)
            ns_lo = jnp.where(seed_p, -ek, jnp.where(seed_t, ek, 0))
            ns_hi = jnp.where(seed_t, ek, jnp.where(seed_p, -ek, 0))
            lo_n = jnp.where(seed_p, jnp.minimum(lo_n, -ek), lo_n)
            hi_n = jnp.where(seed_t, jnp.maximum(hi_n, ek), hi_n)
            lo_n = jnp.where(null_step & need, ns_lo, lo_n)
            hi_n = jnp.where(null_step & need, ns_hi, hi_n)
            seeded_null = null_step & need
            null_step = null_step & ~need

        lo_n = jnp.clip(lo_n, kmin + 2, kmin + W - 3)
        hi_n = jnp.clip(hi_n, kmin + 2, kmin + W - 3)

        write = active & ~null_step
        band_n = band_mask(lo_n, hi_n) & write

        # stacked component store: one trim (two reductions) over a
        # [NC, TB, W] stack instead of NC sequential passes -- the kernel
        # analog of the engine's stacked ring writes (engine.py comps
        # stacking); per-step cost is reduction-bound at 5 components
        if one_comp:
            vals = [mvals]
            prods = [write]
        else:
            vals = [mvals, ins1, del1]
            prods = [write, write & ~(op_null & i1_null),
                     write & ~(op_null & d1_null)]
            if affine2p:
                vals += [ins2, del2]
                prods += [write & ~(op2_null & i2_null),
                          write & ~(op2_null & d2_null)]
        arr3 = jnp.stack(vals)                    # [NC, TB, W]
        prod3 = jnp.stack(prods)                  # [NC, TB, 1]
        arr3 = jnp.where(band_n[None] & prod3, arr3, NULL)
        karr3 = karr[None]
        v3 = arr3 - karr3
        inb3 = (band_mask(lo_n, hi_n)[None] & (arr3 >= 0) & (arr3 <= tlen)
                & (v3 >= 0) & (v3 <= plen))
        iota3 = jax.lax.broadcasted_iota(jnp.int32, (NC, TB, W), 2)
        first3 = jnp.min(jnp.where(inb3, iota3, W), axis=2,
                         keepdims=True) + kmin
        last3 = jnp.max(jnp.where(inb3, iota3, -1), axis=2,
                        keepdims=True) + kmin
        any3 = inb3.any(axis=2, keepdims=True)
        tlo3 = jnp.where(prod3 & any3, first3, 1)
        thi3 = jnp.where(prod3 & any3, last3, -1)
        if ef_seeding:
            # the null-step seeding path performs no end-trim on M
            # (engine parity: tlo/thi forced to the seeded band)
            m_tlo = jnp.where(seeded_null, lo_n, tlo3[0])
            m_thi = jnp.where(seeded_null, hi_n, thi3[0])
            tlo3 = jnp.concatenate([m_tlo[None], tlo3[1:]], axis=0)
            thi3 = jnp.concatenate([m_thi[None], thi3[1:]], axis=0)
        arr3 = jnp.where((karr3 >= tlo3) & (karr3 <= thi3), arr3, NULL)
        for c in range(NC):
            off_ref[c * scope + slot1] = arr3[c]
            lohi_ref[c * scope + slot1] = jnp.concatenate(
                [tlo3[c], thi3[c]], axis=1)
        if edit_like:
            # null current wavefront -> immediately infeasible
            # (engine._step_compute_edit; reference: compute_edit.c:366)
            nnull = jnp.where(active & (tlo3[0] > thi3[0]), big, nnull)

        if record:
            # double-buffered choice store: wait the copy issued two
            # steps ago on this parity, refill the scratch row, start the
            # copy, and keep computing -- the DMA drains during the next
            # step instead of stalling this one
            par = jax.lax.rem(s1, 2)

            @pl.when(s1 >= 3)
            def _wait_prev():
                ch_store(par, s1).wait()  # same shape: waits copy (s1 - 2)

            ch_scratch[par] = jnp.where(band_mask(lo_n, hi_n) & write,
                                        choice, jnp.uint8(0))
            ch_store(par, s1).start()

        hit_max = active & (s1 >= msteps)
        status = jnp.where(hit_max, ST_MAX_STEPS, status)
        final_s = jnp.where(hit_max, s1, final_s)
        done = done | hit_max
        return (s1, done.astype(jnp.int32), status, final_s, end_k, end_off,
                nnull, h_wait, hm_sw, hm_k, hm_off, hm_wfs, hm_valid)

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
        jnp.full((TB, 1), cfg.steps_between_cutoffs, jnp.int32),
        jnp.zeros((TB, 1), jnp.int32),            # hm_sw
        jnp.zeros((TB, 1), jnp.int32),            # hm_k
        jnp.full((TB, 1), NULL, jnp.int32),       # hm_off
        jnp.zeros((TB, 1), jnp.int32),            # hm_wfs
        jnp.zeros((TB, 1), jnp.int32),            # hm_valid
    )
    (s, done_i, status, final_s, end_k, end_off, nnull, _h_wait,
     *_hm) = jax.lax.while_loop(cond, body, init)

    if record:
        # drain the (up to two) in-flight double-buffered choice copies:
        # in-loop waits cover copies 1..s-2, leaving s-1 and s outstanding
        @pl.when(s >= 1)
        def _drain_last():
            ch_store(jax.lax.rem(s, 2), 0).wait()

        @pl.when(s >= 2)
        def _drain_prev():
            ch_store(jax.lax.rem(s + 1, 2), 0).wait()

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
    record = cfg.record_choices
    in_specs = [
        pl.BlockSpec((TB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TB, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((NQ, TB, W), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
    ]
    res_spec = pl.BlockSpec((TB, 8), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    res_shape = jax.ShapeDtypeStruct((B, 8), jnp.int32)
    scratch = [
        pltpu.VMEM((n_comp(cfg) * scope, TB, W), jnp.int32),
        pltpu.VMEM((n_comp(cfg) * scope, TB, 2), jnp.int32),
    ]
    args = [plen[:, None].astype(jnp.int32), tlen[:, None].astype(jnp.int32),
            frees.astype(jnp.int32), max_steps.reshape(1, 1), bits]
    if record:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # zeros->choices
        args.append(jnp.zeros((S_cap, B, W), jnp.uint8))
        choices, res = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            input_output_aliases={5: 0},
            out_specs=(pl.BlockSpec(memory_space=pl.ANY), res_spec),
            out_shape=(jax.ShapeDtypeStruct((S_cap, B, W), jnp.uint8),
                       res_shape),
            scratch_shapes=scratch + [
                pltpu.VMEM((2, TB, W), jnp.uint8),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
        )(*args)
        out = dict(status=res[:, 0], final_s=res[:, 1], end_k=res[:, 2],
                   end_off=res[:, 3], choices=choices,
                   steps=jnp.max(res[:, 1]))
        return out
    # score-only scope: no traceback record, no choice DMAs at all
    res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=res_spec,
        out_shape=res_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*args)
    return dict(status=res[:, 0], final_s=res[:, 1], end_k=res[:, 2],
                end_off=res[:, 3], steps=jnp.max(res[:, 1]))
