"""Utils: IO, encode, plot, profiler, self-check, verbose API."""
import io
import os
import tempfile

import numpy as np
import pytest

from pywfa_tpu import WavefrontAligner
from pywfa_tpu.utils.check import check_alignment
from pywfa_tpu.utils.encode import pack2bits, unpack2bits
from pywfa_tpu.utils.io import read_fasta, read_fastx, write_fasta
from pywfa_tpu.utils.plot import plot_alignment
from pywfa_tpu.utils.profiler import Counter, Timer


def test_pack_roundtrip():
    for seq in (b"ACGT", b"A", b"ACGTACGTACG", b"TTTTTTT"):
        assert unpack2bits(pack2bits(seq), len(seq)) == seq
    with pytest.raises(ValueError):
        pack2bits(b"ACGN")


def test_packed_batch_align():
    from pywfa_tpu.batch import BatchWavefrontAligner
    pats = [b"ACGTACGTAAACGT", b"TTTTACGT"]
    txts = [b"ACGTACGTAATCGT", b"TTTTACGT"]
    ba = BatchWavefrontAligner(span="end-to-end")
    res = ba.align_packed2bits([pack2bits(p) for p in pats],
                               [len(p) for p in pats],
                               [pack2bits(t) for t in txts],
                               [len(t) for t in txts])
    assert res[0].score == -4 and res[1].score == 0


def test_fasta_io(tmp_path):
    path = str(tmp_path / "x.fa")
    write_fasta(path, [("s1", "ACGT" * 30), ("s2 extra", "TTTT")])
    recs = list(read_fasta(path))
    assert recs[0][1] == "ACGT" * 30
    assert len(recs) == 2


def test_fastq_io(tmp_path):
    path = str(tmp_path / "x.fq")
    with open(path, "w") as fh:
        fh.write("@r1 comment\nACGT\n+\nIIII\n@r2\nTTGG\n+\n!!!!\n")
    recs = list(read_fastx(path))
    assert recs[0].name == "r1" and recs[0].sequence == "ACGT"
    assert recs[0].quality == "IIII"
    assert recs[1].name == "r2"


def test_plot():
    p = plot_alignment("TCTTTACTCGCGCGTTGGAGAAATACAATAGT",
                       "TCTATACTGCGCGTTTGGAGAAATAAAATAGT",
                       span="end-to-end")
    assert len(p.steps) > 5
    txt = p.to_text()
    assert "." in txt or any(c.isdigit() for c in txt)
    grid = p.to_grid()
    assert (grid >= 0).any()


def test_profiler():
    t = Timer()
    with t:
        pass
    assert t.counter.n == 1
    c = Counter()
    for x in (1.0, 2.0, 3.0):
        c.add(x)
    assert c.mean == 2.0 and c.min == 1.0 and c.max == 3.0


def test_check_alignment_rejects_bad():
    check_alignment("MMXM", "ACGT", "ACTT")
    with pytest.raises(AssertionError):
        check_alignment("MMMM", "ACGT", "ACTT")  # M over mismatch
    with pytest.raises(AssertionError):
        check_alignment("MMXM", "ACGT", "ACTT", end_v=3)


def test_verbose_and_check_api(capsys):
    a = WavefrontAligner("ACGTACGTAAACGT", backend="numpy", verbose=1,
                         check_alignment=True)
    a.wavefront_align("ACGTACGTAATCGT")
    err = capsys.readouterr().err
    assert "score=-4" in err and "status=0" in err
