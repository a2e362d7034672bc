"""Pipelined/streaming batch API + packed-push transport tests.

Covers the dispatch/finish split (batch.align_pairs_dispatch/_finish),
align_pairs_stream ordering and parity with align_pairs, the 2-bit packed
device push (pack_tokens + engine._decode_packed round-trip), and the
fused (unpacked) fallback for non-ACGT input.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from pywfa_tpu import batch as BT
from pywfa_tpu.align import WavefrontAligner
from pywfa_tpu.ops import engine as E


def _attr(**kw):
    return WavefrontAligner(backend="numpy", **kw)._attributes()


def _mk_pairs(n, L, seed=0, mutate=3, alphabet=b"ACGT"):
    rng = np.random.default_rng(seed)
    al = np.frombuffer(alphabet, dtype=np.uint8)
    pats, txts = [], []
    for _ in range(n):
        p = al[rng.integers(0, len(al), L)]
        t = p.copy()
        idx = rng.choice(L, size=min(mutate, L), replace=False)
        t[idx] = al[(t[idx] + 1) % len(al)]
        pats.append(p.tobytes())
        txts.append(t.tobytes())
    return pats, txts


def test_stream_matches_align_pairs():
    attr = _attr(span="end-to-end")
    batches = [_mk_pairs(9, 40, seed=s) for s in range(4)]
    seq = [BT.align_pairs(attr, p, t) for p, t in batches]
    for depth in (1, 2, 8):
        stream = list(BT.align_pairs_stream(attr, iter(batches), depth=depth))
        assert len(stream) == len(seq)
        for a, b in zip(stream, seq):
            assert [(r.status, r.score, r.ops) for r in a] == \
                   [(r.status, r.score, r.ops) for r in b]


def test_stream_per_batch_kwargs_and_empty():
    attr = _attr(span="end-to-end")
    p, t = _mk_pairs(3, 24, seed=7)
    out = list(BT.align_pairs_stream(
        attr, iter([(p, t, dict(Lp=64, Lt=64)), ([], []), (p, t)])))
    assert len(out) == 3 and out[1] == []
    assert [(r.score, r.ops) for r in out[0]] == \
        [(r.score, r.ops) for r in out[2]]
    assert list(BT.align_pairs_stream(attr, iter([]))) == []


def test_pack_tokens_roundtrip_through_engine():
    """Packed push must decode to the exact encode_batch token rows."""
    attr = _attr(span="end-to-end")
    from pywfa_tpu.attributes import validate_alignment
    pats, txts = _mk_pairs(5, 33, seed=3)
    pats[2] = pats[2][:17]  # mixed lengths
    attr0 = validate_alignment(attr, 33, 33)
    cfg = E.full_config(attr0, 33, 33)
    C = cfg.extend_chunk
    plens = np.array([len(p) for p in pats], dtype=np.int32)
    tlens = np.array([len(t) for t in txts], dtype=np.int32)
    pat_np = BT.encode_batch(pats, cfg.Lp, C, BT.PATTERN_SENTINEL)
    txt_np = BT.encode_batch(txts, cfg.Lt, C, BT.TEXT_SENTINEL)
    # production packs only the base region (engine.packed_widths skips
    # the extend_chunk tail; the device regenerates it as sentinel)
    pp = BT.pack_tokens(pat_np, plens, width=cfg.Lp)
    pt = BT.pack_tokens(txt_np, tlens, width=cfg.Lt)
    assert pp is not None and pt is not None
    dec_p, dec_t = E._decode_packed(
        cfg, jnp.asarray(np.concatenate([pp, pt], axis=1)),
        jnp.asarray(plens), jnp.asarray(tlens))
    np.testing.assert_array_equal(np.asarray(dec_p), pat_np)
    np.testing.assert_array_equal(np.asarray(dec_t), txt_np)


def test_pack_tokens_rejects_non_acgt():
    plens = np.array([4], dtype=np.int32)
    mat = BT.encode_batch([b"ACGN"], 4, 4, BT.PATTERN_SENTINEL)
    assert BT.pack_tokens(mat, plens) is None
    # lowercase must also fall back (engine compares are case-sensitive)
    mat = BT.encode_batch([b"acgt"], 4, 4, BT.PATTERN_SENTINEL)
    assert BT.pack_tokens(mat, plens) is None
    # sentinel bytes past the length must not trigger the fallback
    mat = BT.encode_batch([b"ACGT"], 8, 4, BT.PATTERN_SENTINEL)
    assert BT.pack_tokens(mat, np.array([4], np.int32)) is not None


def test_non_acgt_batch_uses_fused_path():
    """Non-ACGT bytes route through the fused (unpacked) push and still
    produce exact results, including wildcards."""
    attr = _attr(span="end-to-end")
    res = BT.align_pairs(attr, [b"ANGT", b"ACGT"], [b"ACGT", b"ACGT"])
    assert [r.score for r in res] == [-4, 0]
    res = BT.align_pairs(attr, [b"ANGT"], [b"ACGT"], wildcard=ord("N"))
    assert res[0].score == 0 and res[0].ops == "MMMM"


def test_encode_batch_vectorized_matches_scalar():
    rng = np.random.default_rng(5)
    seqs = [bytes(rng.integers(60, 90, size=rng.integers(1, 20),
                               dtype=np.uint8)) for _ in range(33)]
    L = max(len(s) for s in seqs)
    got = BT.encode_batch(seqs, L, 8, 7)
    ref = np.full((33, L + 8), 7, dtype=np.int8)
    for i, s in enumerate(seqs):
        ref[i, :len(s)] = np.frombuffer(s, np.uint8).astype(np.int8)
    np.testing.assert_array_equal(got, ref)
    # equal-length fast path
    seqs = [b"AB" * 5 for _ in range(4)]
    got = BT.encode_batch(seqs, 10, 2, 9)
    assert got.shape == (4, 12) and (got[:, :10] != 9).all()


def test_batch_aligner_align_stream():
    ba = BT.BatchWavefrontAligner(span="end-to-end")
    batches = [(["ACGTACGT"], ["ACGTACGT"]), (["AAAA"], ["AATA"])]
    out = [r for rs in ba.align_stream(iter(batches)) for r in rs]
    assert out[0].ops == "M" * 8 and out[1].score == -4


def test_ops_overflow_escalates_byte_equal():
    """A pair whose walk has MORE ops than the rung's compacted pull cap
    (EngineConfig.ops_out) must escalate and still match the oracle: a
    40-base gap under affine2p completes at wf-score ~64 (< the first
    rung's S_cap) but walks ~41 ops (> ops_out=32), exercising the
    ops-overflow ST_OVERFLOW_S re-run."""
    import numpy as np
    from pywfa_tpu.align import WavefrontAligner
    from pywfa_tpu.batch import align_pairs, _oracle_one

    rng = np.random.default_rng(123)
    alpha = np.frombuffer(b"ACGT", np.uint8)
    base = alpha[rng.integers(0, 4, 150)].tobytes()
    pats = [base, base]
    txts = [base[:60] + base[100:],  # 40-base deletion
            base]                     # trivial pair alongside
    attr = WavefrontAligner(backend="numpy", distance="affine2p",
                            span="end-to-end")._attributes()
    res = align_pairs(attr, pats, txts)
    for i in range(2):
        o = _oracle_one(attr, pats[i], txts[i], None)
        assert (res[i].status, res[i].score, res[i].ops) == \
            (o.status, o.score, o.ops), i
    assert "40D" in res[0].cigarstring
