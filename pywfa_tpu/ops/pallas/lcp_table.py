"""Pallas kernel: per-diagonal LCP run-length table, L-major layout.

R[h, b, w] = number of consecutive matching characters along diagonal
k_w = kmin + w starting at text position h (comparing pattern[h-k_w+j]
vs text[h+j]) -- the same table engine._build_lcp_table produces, laid
out [Ltp, B, W] and built in one VMEM-resident backward scan:

    r(h) = eq(h) ? r(h+1) + 1 : 0

The XLA formulation needs a materialized skewed pattern tensor plus a
reverse cummin over the minor axis (~15 ms at B=4096, W=128, L=150 on
v5e -- reduce_window lowering); this kernel reads the two 2-D sequence
rows and writes the table once (HBM-bound on the 87 MB output).

The per-diagonal pattern window trick: with patrev = flip(patpad),
pattern[h - k_w] = patrev[Np-1-c0-h + w], so each h step needs ONE
lane-shifted window of patrev -- no per-lane gather, no skew tensor.
Mosaic requires 128-aligned dynamic lane offsets, so the scan runs in
128-position blocks (the minor grid dimension, mapped descending so the
run-length carry flows across blocks through scratch); within a block
the window slices are static lane rotations, and each h writes one full
[B-tile, W] row of the output block -- aligned tile stores, no
read-modify-write. (Reference analog: the AVX2 gather kernel,
wavefront_extend_kernels_avx.c:89-165; this is its TPU formulation with
the gather turned into a slide.)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# must match ops.engine
PATTERN_PAD = 1
TEXT_PAD = 2

_HB = 128  # h-block: the TPU lane alignment quantum

# VMEM budget for one grid step's output block [HB, TB, W]
_VMEM_OUT_BYTES = 4 * 2**20


def supported(Ltp: int, W: int, out_bytes: int, Lpp: int = 0) -> bool:
    """Whether the Pallas builder handles this shape.

    - Ltp <= 2048: beyond that the per-step one-hot extension lookup over
      an L-major table is a net loss anyway (the W-major path switches to
      an O(W) gather there, engine._extend_band_lcp), and 2048 also keeps
      every run within int16.
    - one grid step's blocks (patrev row + text row + [HB, TB, W] out +
      scratch) must fit the VMEM budget with >= 8 batch rows per tile.
    - any band width compiles (verified W=64/192/320 on v5e): the window
      slices are static lane rotations and the out block's minor dim
      equals the full array dim.
    """
    if Ltp > 2048:
        return False
    Ltp_pad = -(-Ltp // _HB) * _HB
    TB = _tile_rows(W, out_bytes)
    # patrev row upper bound; input tiles occupy lane-padded VMEM just
    # like the output block, so pad W and the whole row to 128 lanes
    np_bound = _lane_pad(Lpp + _lane_pad(W) + Ltp_pad + 2 * _HB)
    in_bytes = TB * (np_bound + Ltp_pad) + TB * _lane_pad(W) * 4
    return (8 * _HB * _lane_pad(W) * out_bytes <= _VMEM_OUT_BYTES
            and in_bytes <= _VMEM_OUT_BYTES)


def _lane_pad(W: int) -> int:
    """Minor-dim width as stored in VMEM: lanes pad to multiples of 128.

    A W=64 block occupies the same VMEM as W=128 — budgeting with the raw
    W over-sizes TB and blows the 16 MB scoped-vmem limit (seen on v5e)."""
    return -(-W // _HB) * _HB


def _tile_rows(W: int, out_bytes: int) -> int:
    """Power-of-two batch rows per tile within the output VMEM budget."""
    bound = max(8, _VMEM_OUT_BYTES // max(1, _HB * _lane_pad(W) * out_bytes))
    return 1 << (bound.bit_length() - 1)


def _kernel(nb, W, c0, Np, wildcard, out_dt,
            patrev_ref, txt_ref, out_ref, r_ref):
    j = pl.program_id(1)
    blk = nb - 1 - j

    @pl.when(j == 0)
    def _init():
        r_ref[:, :] = jnp.zeros_like(r_ref)

    # base is provably 128-aligned: (Np - c0) % 128 == 0 (wrapper pads)
    base = pl.multiple_of(Np - c0 - _HB - blk * _HB, _HB)
    pwin = patrev_ref[:, pl.ds(base, W + _HB)].astype(jnp.int32)
    twin = txt_ref[:, :].astype(jnp.int32)  # [TB, HB] block
    r = r_ref[:, :]
    for hl in range(_HB - 1, -1, -1):
        pv = jax.lax.slice_in_dim(pwin, _HB - 1 - hl, _HB - 1 - hl + W,
                                  axis=1)
        tc = jax.lax.slice_in_dim(twin, hl, hl + 1, axis=1)
        eq = pv == tc  # [TB, W] via minor-dim broadcast of [TB, 1]
        if wildcard >= 0:
            # wildcard matches real characters but never the sentinels
            # (identical to engine._build_lcp_table's masking)
            eq = (eq | (pv == wildcard) | (tc == wildcard)) \
                & (pv != PATTERN_PAD) & (tc != TEXT_PAD)
        r = jnp.where(eq, r + 1, 0)
        out_ref[hl, :, :] = r.astype(out_dt)
    r_ref[:, :] = r


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def build_lcp_table_hmajor(W: int, kmin: int, wildcard: int, interpret: bool,
                           pat, txt):
    """[Ltp, B, W] run-length table from padded token rows.

    pat: [B, Lpp] int8 (PATTERN_PAD-padded), txt: [B, Ltp] int8
    (TEXT_PAD-padded). Output dtype: uint8 when runs fit, else int16.
    """
    B, Lpp = pat.shape
    Ltp = txt.shape[1]
    Ltp_pad = -(-Ltp // _HB) * _HB
    lead = max(0, kmin + W - 1)
    tail = max(0, Ltp_pad - Lpp - kmin) + 1
    c0 = lead - kmin
    if c0 < W:
        # block 0's window load reaches base + W + HB = Np + (W - c0);
        # grow the lead so every block load stays in bounds
        lead += W - c0
        c0 = lead - kmin
    patpad = jnp.pad(pat, ((0, 0), (lead, tail)),
                     constant_values=np.int8(PATTERN_PAD))
    # enforce (Np - c0) % 128 == 0 so every block load is lane-aligned
    extra = (-(patpad.shape[1] - c0)) % _HB
    if extra:
        patpad = jnp.pad(patpad, ((0, 0), (0, extra)),
                         constant_values=np.int8(PATTERN_PAD))
    Np = patpad.shape[1]
    # window [Np-c0-HB-blk*HB, +W+HB] must stay in bounds for all blocks:
    # start_min = Np - c0 - Ltp_pad >= 0 and start_max + W + HB <= Np
    assert (Np - c0) % _HB == 0 and c0 + Ltp_pad <= Np and c0 >= W, \
        (c0, W, Ltp_pad, Np)
    patrev = jnp.flip(patpad, axis=1)
    txt_p = jnp.pad(txt, ((0, 0), (0, Ltp_pad - Ltp)),
                    constant_values=np.int8(TEXT_PAD)) \
        if Ltp_pad != Ltp else txt

    assert Ltp <= 2048, "use the XLA builder beyond the supported() gate"
    out_dt = jnp.uint8 if Ltp < 250 else jnp.int16
    ob = jnp.dtype(out_dt).itemsize
    # pad B up to a tile multiple (pad rows compute garbage runs that are
    # sliced off); small batches shrink the tile to one padded block
    TB = min(_tile_rows(W, ob), 1 << (B - 1).bit_length()) if B else 1
    padB = (-B) % TB
    if padB:
        patrev = jnp.pad(patrev, ((0, padB), (0, 0)),
                         constant_values=np.int8(PATTERN_PAD))
        txt_p = jnp.pad(txt_p, ((0, padB), (0, 0)),
                        constant_values=np.int8(TEXT_PAD))
    Bp = B + padB
    nb = Ltp_pad // _HB

    kernel = functools.partial(_kernel, nb, W, c0, Np, wildcard, out_dt)
    out = pl.pallas_call(
        kernel,
        # minor grid dim walks h-blocks; index maps reverse it so the scan
        # runs high-h -> low-h with the carry in scratch
        grid=(Bp // TB, nb),
        in_specs=[
            pl.BlockSpec((TB, Np), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, _HB), lambda i, j, nb=nb: (i, nb - 1 - j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_HB, TB, W),
                               lambda i, j, nb=nb: (nb - 1 - j, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Ltp_pad, Bp, W), out_dt),
        scratch_shapes=[pltpu.VMEM((TB, W), jnp.int32)],
        interpret=interpret,
    )(patrev, txt_p)
    if Ltp_pad != Ltp or padB:
        out = out[:Ltp, :B]
    return out
