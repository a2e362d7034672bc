"""Parity tests mirroring the reference suite (pywfa/tests/test.py).

Each test reproduces a reference case with its golden assertions
(reference: /root/reference/pywfa/tests/test.py, cited per test). Real-read
fixtures are loaded from the reference checkout when mounted, otherwise those
tests are skipped (synthetic equivalents live in test_properties.py).

Backends are parametrized so the NumPy oracle and the JAX engine must agree.
"""
import os

import pytest

from pywfa_tpu import (
    WavefrontAligner,
    clip_cigartuples,
    cigartuples_to_str,
    elide_mismatches_from_cigar,
)
from pywfa_tpu.utils.io import read_fasta

REF_TESTS = "/root/reference/pywfa/tests"

BACKENDS = ["numpy", "jax"]


@pytest.fixture(params=BACKENDS)
def backend(request):
    return request.param


class TestConstruct:
    def test_affine(self, backend):
        """(reference: tests/test.py:16-52)"""
        pattern = "TCTTTACTCGCGCGTTGGAGAAATACAATAGT"
        text = "TCTATACTGCGCGTTTGGAGAAATAAAATAGT"
        a = WavefrontAligner(pattern, backend=backend)
        score = a.wavefront_align(text)
        assert a.status == 0
        assert a.cigarstring == "3M1X4M1D7M1I9M1X6M"
        assert a.score == -24
        assert a.score == score
        a.cigar_print_pretty(os.devnull)

        a = WavefrontAligner(pattern, backend=backend)
        a(text)
        assert a.status == 0
        assert a.cigarstring == "3M1X4M1D7M1I9M1X6M"
        assert a.score == -24

        a = WavefrontAligner(backend=backend)
        a(text, pattern, clip_cigar=False)
        assert a.status == 0
        assert a.cigarstring == "3M1X4M1D7M1I9M1X6M"
        assert a.score == -24

        pattern = "TCTATACTGCGCGTTTGGAGAAATAAAA"
        text = "TCTCCCCATACTGCGCGTTTGGAGAAATAAAA"
        a = WavefrontAligner(backend=backend)
        a(text, pattern, clip_cigar=False)

    def test_scope(self, backend):
        """(reference: tests/test.py:54-63)"""
        pattern = "TCTTTACTCGCGCGTTGGAGAAATACAATAGT"
        text = "TCTATACTGCGCGTTTGGAGAAATAAAATAGT"
        a = WavefrontAligner(pattern, scope="score", backend=backend)
        a(text)
        assert a.status == 0
        assert a.cigarstring == ""
        assert a.score == -24

    def test_supress_seqs(self, backend):
        """(reference: tests/test.py:65-83)"""
        pattern = "TCTTTACTCGCGCGTTGGAGAAATACAATAGT"
        text = "TCTATACTGCGCGTTTGGAGAAATAAAATAGT"
        a = WavefrontAligner(pattern, scope="score", backend=backend)
        res = a(text, supress_sequences=True)
        assert res.aligned_pattern is None and res.aligned_text is None
        assert a.status == 0
        assert a.cigarstring == ""
        assert a.score == -24

        a = WavefrontAligner(pattern, scope="full", backend=backend)
        res = a(text, supress_sequences=True)
        assert res.aligned_pattern is None and res.aligned_text is None
        assert a.status == 0
        assert a.cigarstring == "3M1X4M1D7M1I9M1X6M"
        assert a.score == -24

    def test_many(self, backend):
        """(reference: tests/test.py:85-92)"""
        pattern = "TCTTTACTCGCGCGTTGGAGAAATACAATAGT"
        text = "TCTATACTGCGCGTTTGGAGAAATAAAATAGT"
        for _ in range(1000):
            a = WavefrontAligner(pattern, backend=backend)
            a.wavefront_align(text)
            assert a.score == -24

    def test_end_to_end(self, backend):
        """(reference: tests/test.py:94-102)"""
        pattern = "AATTAATTTAAGTCTAGGCTACTTTCGGTACTTTGTTCTT"
        text = "AATTTAAGTCTAGGCTACTTTCGGTACTTTCTT"
        a = WavefrontAligner(pattern, span="end-to-end", mismatch=4,
                             gap_opening=6, gap_extension=2, backend=backend)
        res = a(text)
        assert a.cigarstring == "4M4D26M3D3M"
        assert res.score == -26

    def test_ends_free(self, backend):
        """(reference: tests/test.py:104-113)"""
        pattern = "AATTAATTTAAGTCTAGGCTACTTTCGGTACTTTGTTCTT"
        text = "AATTTAAGTCTAGGCTACTTTCGGTACTTTCTT"
        a = WavefrontAligner(pattern, span="ends-free", mismatch=4,
                             gap_opening=6, gap_extension=2, backend=backend)
        res = a(text, clip_cigar=True, elide_mismatches=True,
                min_aligned_bases_left=5, min_aligned_bases_right=5)
        assert res.aligned_pattern == res.aligned_text
        assert a.cigarstring == "4M4D26M3D3M"
        assert res.score == -26

    def test_ends_free2(self, backend):
        """(reference: tests/test.py:115-178)"""
        def A(pattern):
            return WavefrontAligner(pattern, span="ends-free", mismatch=4,
                                    gap_opening=6, gap_extension=2,
                                    backend=backend)

        pattern = "AAAAACCTTTTTAAAAAA"
        text = "GGCCAAAAACCAAAAAA"
        res = A(pattern)(text)
        assert res.text_start == 4 and res.text_end == 17

        pattern = "AAAAACCTTTTTAAAAAA"
        text = "GGCCAAAAACCGGGGGGG"
        res = A(pattern)(text)
        assert res.aligned_pattern == res.aligned_text
        assert res.text_start == 4 and res.text_end == 11

        for pattern, text in [
            ("AAAAACCGGGG", "AAAAACC"),
            ("AAAAACC", "AAAAACCGGGG"),
            ("GGGGAAAAACC", "AAAAACCGGGG"),
            ("AAAAACCGGGG", "GGGGAAAAACC"),
            ("GGGGAAAAACC", "AAAAACC"),
            ("GGGGAAAAACC", "CCCCCAAAAACC"),
            ("GGGGAAAAACCGGGGG", "CCCCCAAAAACCTTTTT"),
            ("AAAAACC", "CCCCCAAAAACCTTTTT"),
        ]:
            res = A(pattern)(text)
            assert res.aligned_pattern == res.aligned_text, (pattern, text)

    def test_heuristic(self, backend):
        """(reference: tests/test.py:180-194)"""
        pattern = "AAAAACCAAAAAA"
        text = "GGCCAAAAACCAAAAAA"
        a = WavefrontAligner(pattern, distance="affine", mismatch=4,
                             gap_opening=6, gap_extension=2,
                             heuristic='X-drop', backend=backend)
        res = a(text)
        if res.status == 0:
            assert res.aligned_pattern == res.aligned_text

        a = WavefrontAligner(pattern, distance="affine", mismatch=4,
                             gap_opening=6, gap_extension=2,
                             heuristic='adaptive', backend=backend)
        res = a(text)
        if res.status == 0:
            assert res.aligned_pattern == res.aligned_text

    # The jax backend compiles one program per shape bucket AND per
    # escalation rung, so the full fixture sweeps cost ~100 s each on
    # the single-pair path; the default tier runs a 1-read jax probe
    # (numpy stays full), and test_fixture_sweeps_full_jax (slow tier)
    # runs every read on jax.
    @staticmethod
    def _subset(backend, pairs):
        return pairs if backend == "numpy" else pairs[:1]

    @pytest.mark.skipif(not os.path.exists(REF_TESTS + "/long.fa"),
                        reason="reference fixtures not mounted")
    def test_long(self, backend):
        """(reference: tests/test.py:196-212)"""
        reads = list(read_fasta(REF_TESTS + "/long.fa"))
        refs = list(read_fasta(REF_TESTS + "/long.reference.fa"))
        for (_, r), (_, p) in self._subset(backend,
                                           list(zip(reads, refs))):
            text = r.upper()
            pattern = p.upper()
            l_text = int(len(text) / 2)
            l_pattern = int(len(pattern) / 2)
            a = WavefrontAligner(distance="affine", mismatch=4,
                                 gap_opening=6, gap_extension=2,
                                 pattern_begin_free=l_pattern,
                                 pattern_end_free=l_pattern,
                                 text_begin_free=l_text,
                                 text_end_free=l_text,
                                 backend=backend)
            a(text, pattern, clip_cigar=True)

    @pytest.mark.skipif(not os.path.exists(REF_TESTS + "/short.fa"),
                        reason="reference fixtures not mounted")
    def test_short(self, backend):
        """(reference: tests/test.py:214-221)"""
        reads = list(read_fasta(REF_TESTS + "/short.fa"))
        refs = list(read_fasta(REF_TESTS + "/short.reference.fa"))
        for (_, r), (_, p) in self._subset(backend,
                                           list(zip(reads, refs))):
            a = WavefrontAligner(mismatch=5, gap_opening=6, gap_extension=2,
                                 backend=backend)
            a(r.upper(), p.upper())

    @pytest.mark.skipif(not os.path.exists(REF_TESTS + "/short.fa"),
                        reason="reference fixtures not mounted")
    def test_short2p(self, backend):
        """(reference: tests/test.py:223-232) incl. the (2, 175) golden."""
        reads = list(read_fasta(REF_TESTS + "/short.fa"))
        refs = list(read_fasta(REF_TESTS + "/short.reference.fa"))
        pairs = list(zip(reads, refs))
        # always keep the golden read in the jax subset
        golden = [pr for pr in pairs if pr[0][0].startswith("read6.")]
        pairs = self._subset(backend, pairs)
        pairs += [pr for pr in golden if pr not in pairs]
        for (name, r), (_, p) in pairs:
            a = WavefrontAligner(distance="affine2p", mismatch=5,
                                 gap_opening=6, gap_extension=2,
                                 backend=backend)
            res = a(r.upper(), p.upper(), clip_cigar=True,
                    elide_mismatches=True)
            if name == "read6.loci:chr1:13,853,852-13,854,838":
                assert res.cigartuples[3] == (2, 175)


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(REF_TESTS + "/short.fa"),
                    reason="reference fixtures not mounted")
def test_fixture_sweeps_full_jax():
    """Slow tier: the FULL reference fixture sweeps on the jax backend
    (the default tier runs a 4-read subset per sweep; numpy always runs
    full)."""
    t = TestConstruct()
    t._subset = staticmethod(lambda backend, pairs: pairs)
    t.test_long("jax")
    t.test_short("jax")
    t.test_short2p("jax")
