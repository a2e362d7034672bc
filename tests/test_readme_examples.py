"""Golden tests for the reference README's documented examples.

(reference: README.rst:30-243 -- these are the published, user-facing
behaviors of pywfa, including clip/elide post-processing outputs.)
"""
import pytest

from pywfa_tpu import WavefrontAligner, cigartuples_to_str

BACKENDS = ["numpy", "jax"]


@pytest.fixture(params=BACKENDS)
def backend(request):
    return request.param


def test_readme_basic(backend):
    """(reference: README.rst:30-42)"""
    pattern = "TCTTTACTCGCGCGTTGGAGAAATACAATAGT"
    text = "TCTATACTGCGCGTTTGGAGAAATAAAATAGT"
    a = WavefrontAligner(pattern, backend=backend)
    score = a.wavefront_align(text)
    assert a.score == score == -24
    assert a.cigarstring == "3M1X4M1D7M1I9M1X6M"


def test_readme_clip(backend):
    """(reference: README.rst:195-209)"""
    pattern = "AAAAACCTTTTTAAAAAA"
    text = "GGCCAAAAACCAAAAAA"
    a = WavefrontAligner(pattern, backend=backend)
    res = a(text, clip_cigar=False)
    assert cigartuples_to_str(res.cigartuples) == "4I7M5D6M"
    res = a(text, clip_cigar=True)
    assert cigartuples_to_str(res.cigartuples) == "4S7M5D6M"


def test_readme_trim_short_matches(backend):
    """(reference: README.rst:213-243)"""
    pattern = "AAAAAAAAAAAACCTTTTAAAAAAGAAAAAAA"
    text = "ACCCCCCCCCCCAAAAACCAAAAAAAAAAAAA"
    a = WavefrontAligner(pattern, backend=backend)

    res = a(text, clip_cigar=False)
    assert res.cigartuples == [(0, 1), (1, 5), (8, 6), (0, 7), (2, 5),
                               (0, 5), (8, 1), (0, 7)]
    assert res.aligned_text == "ACCCCCCCCCCCAAAAACCAAAAAAAAAAAAA"
    assert (res.text_start, res.text_end) == (0, 32)

    res = a(text, clip_cigar=True, min_aligned_bases_left=5,
            min_aligned_bases_right=5)
    assert res.cigartuples == [(4, 12), (0, 7), (2, 5), (0, 5), (8, 1),
                               (0, 7)]
    assert res.aligned_text == "AAAAACCAAAAAAAAAAAAA"
    assert (res.text_start, res.text_end) == (12, 32)

    res = a(text, clip_cigar=True, min_aligned_bases_left=5,
            min_aligned_bases_right=5, elide_mismatches=True)
    assert res.cigartuples == [(4, 12), (0, 7), (2, 5), (0, 13)]
    assert res.aligned_text == "AAAAACCAAAAAAAAAAAAA"
