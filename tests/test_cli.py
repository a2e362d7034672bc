"""CLI end-to-end test."""
import os

from pywfa_tpu.cli import main
from pywfa_tpu.utils.io import write_fasta


def test_cli_align_tsv(tmp_path, capsys):
    pfa = str(tmp_path / "p.fa")
    tfa = str(tmp_path / "t.fa")
    write_fasta(pfa, [("p1", "TCTTTACTCGCGCGTTGGAGAAATACAATAGT"),
                      ("p2", "ACGTACGT")])
    write_fasta(tfa, [("t1", "TCTATACTGCGCGTTTGGAGAAATAAAATAGT"),
                      ("t2", "ACGTACGT")])
    out = str(tmp_path / "out.tsv")
    rc = main(["align", "--patterns", pfa, "--texts", tfa,
               "--span", "ends-free", "--out", out])
    assert rc == 0
    lines = open(out).read().splitlines()
    assert len(lines) == 2
    f0 = lines[0].split("\t")
    assert f0[0] == "t1" and f0[2] == "0" and f0[3] == "-24"
    assert f0[4] == "3M1X4M1D7M1I9M1X6M"
    f1 = lines[1].split("\t")
    assert f1[3] == "0" and f1[4] == "8M"


def test_cli_align_paf(tmp_path):
    pfa = str(tmp_path / "p.fa")
    tfa = str(tmp_path / "t.fa")
    write_fasta(pfa, [("p1", "ACGTACGTAAACGT")])
    write_fasta(tfa, [("t1", "ACGTACGTAATCGT")])
    out = str(tmp_path / "out.paf")
    rc = main(["align", "--patterns", pfa, "--texts", tfa,
               "--span", "end-to-end", "--format", "paf", "--out", out])
    assert rc == 0
    f = open(out).read().split("\t")
    assert f[0] == "t1" and "cg:Z:10M1X3M" in "\t".join(f)
