"""pywfa-compatible Python API.

Drop-in surface for `pywfa.align` (reference: /root/reference/pywfa/align.pyx):
`WavefrontAligner`, `AlignmentResult`, `clip_cigartuples`,
`elide_mismatches_from_cigar`, `cigartuples_to_str` — backed by this package's
TPU-native engines instead of the C library. Single-pair calls route to the
batched JAX engine (shape-bucketed, compile-cached) or the NumPy oracle;
`pywfa_tpu.batch.BatchWavefrontAligner` is the high-throughput entry point.
"""
from __future__ import annotations

import sys
from dataclasses import dataclass
from typing import List, Optional, Tuple

from .attributes import (
    AlignerAttributes,
    AlignmentForm,
    HeuristicParams,
    INT_MAX,
    Penalties,
    SystemParams,
    penalties_affine,
    penalties_affine2p,
    penalties_edit,
    penalties_indel,
    penalties_linear,
)
from .cigar import (
    Cigar,
    cigar_print_pretty_c,
    cigartuples_to_str as _cigartuples_to_str,
    ops_to_cigarstring,
    ops_to_cigartuples,
)
from .constants import (
    AlignmentScope,
    AlignmentSpan,
    DistanceMetric,
    HeuristicStrategy,
    MemoryMode,
)

__all__ = [
    "WavefrontAligner",
    "clip_cigartuples",
    "cigartuples_to_str",
    "elide_mismatches_from_cigar",
]


@dataclass
class AlignmentResult:
    """Holds the result of an alignment (reference: align.pyx:17-180)."""

    pattern_length: int
    text_length: int
    pattern_start: int
    pattern_end: int
    text_start: int
    text_end: int
    cigartuples: object
    score: int
    pattern: str
    text: str
    status: int

    def __init__(self, pl, tl, ps, pe, ts, te, ct, s, p, t, status):
        self.pattern_length = pl
        self.text_length = tl
        self.pattern_start = ps
        self.pattern_end = pe
        self.text_start = ts
        self.text_end = te
        self.cigartuples = ct
        self.score = s
        self.pattern = p
        self.text = t
        self.status = status

    def __repr__(self):
        data = ['score',
                'pattern_start',
                'pattern_end',
                'text_start',
                'text_end',
                'cigartuples',
                'pattern',
                'text']
        d = self.__dict__
        s = ""
        for k in data:
            s += f"    {k}: {d[k]}\n"
        return s

    def __str__(self):
        score = "Score: %d" % self.score
        if self.pattern and self.cigartuples:
            t = self.aligned_text
            p = self.aligned_pattern
            if len(t) > 30:
                t = t[:30] + "..."
                p = p[:30] + "..."
            c = self.cigarstring
            if len(c) > 30:
                c = c[:30]
            length = "Length: %d" % len(t)
            return "\n".join([p, t, c, score, length])
        return score

    @property
    def aligned_pattern(self):
        """Pattern sequence aligned by the cigar; None if suppressed."""
        if self.pattern:
            return self._get_aligned_sequence(
                self.pattern, self.cigartuples,
                self.pattern_start, self.pattern_end, "D")

    @property
    def aligned_text(self):
        """Text sequence aligned by the cigar; None if suppressed."""
        if self.text:
            return self._get_aligned_sequence(
                self.text, self.cigartuples,
                self.text_start, self.text_end, "I")

    @property
    def cigarstring(self):
        return cigartuples_to_str(self.cigartuples)

    @property
    def pretty(self):
        """Pretty format (reference: align.pyx:122-165)."""
        s = f"{self.cigarstring}      ALIGNMENT\n"
        s += (f"{cigartuples_to_str([i for i in self.cigartuples if i[0] != 0 and i[0] != [8]])}"
              "      ALIGNMENT.COMPACT\n")
        p = "      PATTERN    "
        g = "                 "
        t = "      TEXT       "
        pat = self.pattern
        pi = 0
        txt = self.text
        ti = 0
        for opp, l in self.cigartuples:
            if opp in (1, 4, 5):
                t += txt[ti: ti + l]
                ti += l
                p += "-" * l
                g += " " * l
            elif opp in (0, 7):
                t += txt[ti: ti + l]
                ti += l
                p += pat[pi: pi + l]
                pi += l
                g += "|" * l
            elif opp == 2:
                t += "-" * l
                p += pat[pi: pi + l]
                pi += l
                g += " " * l
            elif opp == 8:
                t += txt[ti: ti + l]
                ti += l
                p += pat[pi: pi + l]
                pi += l
                g += "*" * l
            else:
                raise ValueError(
                    f"Cigar operation not available for pretty print - {opp}")
        s += p + "\n" + g + "\n" + t + "\n"
        return s

    def _get_aligned_sequence(self, sequence, tuple_cigar, begin, end,
                              gap_type):
        # NOTE: mirrors align.pyx:168-180, including iterating tuples as
        # (length, mid) -- i.e. comparing the *op code* against the char
        # gap_type never matches, so ops expand from the sliced sequence.
        aligned_sequence = []
        seq = sequence[begin:end]
        index = 0
        for length, mid in tuple_cigar:
            if mid == gap_type:
                aligned_sequence += ['-' * length]
            else:
                aligned_sequence += [seq[index:index + length]]
                index += length
        aligned_sequence += [seq[index:end - begin]]
        return "".join(aligned_sequence)


def clip_cigartuples(align_result, min_aligned_bases_left=5,
                     min_aligned_bases_right=5):
    """Soft-clip sub-threshold flank blocks (reference: align.pyx:183-250)."""
    ct = align_result.cigartuples
    if not ct:
        return align_result
    i = 0
    text_start = 0
    pattern_start = 0
    for i in range(len(ct)):
        if ct[i][0] == 0:
            if ct[i][1] >= min_aligned_bases_left:
                break
            else:
                text_start += ct[i][1]
                pattern_start += ct[i][1]
        elif ct[i][0] == 2:  # deletion
            pattern_start += ct[i][1]
        elif ct[i][0] == 8:  # mismatch
            text_start += ct[i][1]
            pattern_start += ct[i][1]
        elif ct[i][0] == 1:  # insertion
            text_start += ct[i][1]

    text_end = align_result.text_length
    pattern_end = align_result.pattern_length
    j = len(ct) - 1
    for j in range(len(ct) - 1, -1, -1):
        if ct[j][0] == 0:
            if ct[j][1] >= min_aligned_bases_right:
                break
            else:
                text_end -= ct[j][1]
                pattern_end -= ct[j][1]
        elif ct[j][0] == 2:
            pattern_end -= ct[j][1]
        elif ct[j][0] == 8:
            pattern_end -= ct[j][1]
            text_end -= ct[j][1]
        elif ct[j][0] == 1:
            text_end -= ct[j][1]

    modified = []
    if align_result.text_start + text_start > 0:
        modified.append((4, text_start))
    modified += ct[i:j + 1]
    if align_result.text_length - text_end > 0:
        modified.append((4, align_result.text_length - text_end))
    align_result.cigartuples = modified

    align_result.text_start = text_start
    align_result.text_end = text_end

    align_result.pattern_start = pattern_start
    align_result.pattern_end = pattern_end

    return align_result


def elide_mismatches_from_cigar(cigartuples):
    """Merge 'X' runs into 'M' blocks (reference: align.pyx:253-277)."""
    if not cigartuples:
        return []
    modified = []
    block = 0
    for opp, l in cigartuples:
        if opp != 8 and opp != 0:
            if block:
                modified.append((0, block))
                block = 0
            modified.append((opp, l))
        else:
            block += l
    if block:
        modified.append((0, block))
    return modified


def cigartuples_to_str(cigartuples):
    """String format of cigartuples (reference: align.pyx:280-295)."""
    return _cigartuples_to_str(cigartuples)


class WavefrontAligner:
    """Wavefront aligner with pywfa's exact interface.

    If a pattern is supplied, it will be cached for re-use.
    (reference: align.pyx:306-883)

    Extra (non-pywfa) kwarg: `backend` selects the engine —
    "numpy" (scalar oracle), "jax" (batched TPU engine, single-pair
    bucketed), or "auto".
    """

    def __init__(self,
                 pattern=None,
                 distance="affine",
                 memory_mode="high",
                 match=0,
                 mismatch=4,
                 gap_opening=6,
                 gap_extension=2,
                 gap_opening2=24,
                 gap_extension2=1,
                 scope="full",
                 span="ends-free",
                 pattern_begin_free=0,
                 pattern_end_free=0,
                 text_begin_free=0,
                 text_end_free=0,
                 heuristic=None,
                 min_wavefront_length=10,
                 max_distance_threshold=50,
                 steps_between_cutoffs=1,
                 xdrop=20,
                 wildcard=None,
                 max_steps=0,
                 backend="auto",
                 verbose=0,
                 check_alignment=False,
                 extension=False,
                 ):
        self.pattern_len = 0
        self.text_len = 0
        self._pattern = None
        self._text = None
        self._bpattern = b""
        self._backend = backend
        # observability (reference: alignment_system_t.verbose /
        # check_alignment_correct, wavefront_attributes.h:86-93)
        self._verbose = verbose
        self._check_alignment = check_alignment
        from .utils.profiler import Timer
        self.timer = Timer()
        if pattern:
            self._pattern = pattern.upper()
            self._bpattern = self._pattern.encode("ascii")
            self.pattern_len = len(self._bpattern)

        self.wildcard = wildcard

        if distance not in ("indel", "levenshtein", "linear", "affine", "affine2p"):
            raise NotImplementedError(f'{distance} distance not implemented')
        self._distance = distance
        self._match = match
        self._mismatch = mismatch
        self._gap_opening = gap_opening
        self._gap_extension = gap_extension
        self._gap_opening2 = gap_opening2
        self._gap_extension2 = gap_extension2
        # pywfa maps the linear-model indel penalty from gap_extension at
        # construction (align.pyx:355) but from gap_opening/gap_extension
        # property setters afterwards (align.pyx:675,684)
        self._linear_indel = gap_extension
        # validate penalties now (C validates inside wavefront_aligner_new)
        self._build_penalties()

        if scope == "full":
            self._scope = AlignmentScope.COMPUTE_ALIGNMENT
        elif scope == "score":
            self._scope = AlignmentScope.COMPUTE_SCORE
        else:
            raise ValueError(f'{scope} scope not understood')

        if memory_mode == 'high':
            self._memory_mode = MemoryMode.HIGH
        elif memory_mode == 'medium':
            self._memory_mode = MemoryMode.MED
        elif memory_mode == 'low':
            self._memory_mode = MemoryMode.LOW
        elif memory_mode == 'biwfa':
            self._memory_mode = MemoryMode.ULTRALOW
        else:
            raise ValueError(
                "memory_mode must be one of 'high', 'medium', 'low', 'biwfa'")

        # WF-extension mode (reference: alignment_form_t.extension,
        # wavefront_align.c:57-63 autoconfig + maxtrim on terminate)
        self._extension = bool(extension)
        self._pattern_begin_free = pattern_begin_free
        self._pattern_end_free = pattern_end_free
        self._text_begin_free = text_begin_free
        self._text_end_free = text_end_free
        if span == "ends-free":
            self._span = AlignmentSpan.ENDS_FREE
        elif span == "end-to-end":
            self._span = AlignmentSpan.END_TO_END
        else:
            raise NotImplementedError(f'{span} span not implemented')

        self._min_wavefront_length = min_wavefront_length
        self._max_distance_threshold = max_distance_threshold
        self._steps_between_cutoffs = steps_between_cutoffs
        self._xdrop = xdrop
        if heuristic is None:
            self._heuristic_strategy = HeuristicStrategy.NONE
        elif heuristic == "adaptive":
            self._heuristic_strategy = HeuristicStrategy.WFADAPTIVE
        elif heuristic == "X-drop":
            self._heuristic_strategy = HeuristicStrategy.XDROP
        else:
            raise NotImplementedError(f'{heuristic} heuristic not implemented')

        if max_steps <= 0:
            max_steps = INT_MAX
        self._max_steps = max_steps

        # last-alignment state
        self._status = 0
        self._cigar_ops = ""
        self._score = 0
        self._dropped = False

    # -- config assembly ------------------------------------------------
    def _build_penalties(self) -> Penalties:
        d = self._distance
        if d == "indel":
            self._penalties = penalties_indel()
        elif d == "levenshtein":
            self._penalties = penalties_edit()
        elif d == "linear":
            self._penalties = penalties_linear(
                self._match, self._mismatch, self._linear_indel)
        elif d == "affine":
            self._penalties = penalties_affine(
                self._match, self._mismatch,
                self._gap_opening, self._gap_extension)
        else:
            self._penalties = penalties_affine2p(
                self._match, self._mismatch,
                self._gap_opening, self._gap_extension,
                self._gap_opening2, self._gap_extension2)
        return self._penalties

    def _attributes(self) -> AlignerAttributes:
        return AlignerAttributes(
            penalties=self._penalties,
            scope=self._scope,
            form=AlignmentForm(
                span=self._span,
                extension=self._extension,
                pattern_begin_free=self._pattern_begin_free,
                pattern_end_free=self._pattern_end_free,
                text_begin_free=self._text_begin_free,
                text_end_free=self._text_end_free,
            ),
            heuristic=HeuristicParams(
                strategy=self._heuristic_strategy,
                min_wavefront_length=self._min_wavefront_length,
                max_distance_threshold=self._max_distance_threshold,
                steps_between_cutoffs=self._steps_between_cutoffs,
                xdrop=self._xdrop,
            ),
            memory_mode=self._memory_mode,
            system=SystemParams(max_alignment_steps=self._max_steps,
                                verbose=self._verbose),
        )

    # -- alignment ------------------------------------------------------
    def wavefront_align(self, text, pattern=None):
        """Perform wavefront alignment; returns the alignment score.

        (reference: align.pyx:421-443)
        """
        if pattern is not None:
            self._pattern = pattern.upper()
            self._bpattern = self._pattern.encode("ascii")
            self.pattern_len = len(self._bpattern)
        t = text.upper().encode("ascii")
        self._text = text
        self.text_len = len(t)
        wc = None
        if self._wildcard:
            wc = self._bwildcard
        self.timer.start()
        result = self._run_engine(self._bpattern, t, wc)
        elapsed = self.timer.stop()
        self._status = result.status
        self._cigar_ops = result.ops
        self._score = result.score
        self._dropped = result.dropped
        if self._check_alignment and result.ops and result.status == 0:
            # analog of system.check_alignment_correct
            # (reference: wavefront_debug.c:230-241)
            from .utils.check import check_alignment
            check_alignment(result.ops, self._pattern, text.upper(),
                            self._penalties,
                            end_v=result.end_v, end_h=result.end_h)
        if self._verbose >= 1:
            from .utils.profiler import report_alignment
            report_alignment(
                None, score=self._score, status=self._status,
                plen=self.pattern_len, tlen=self.text_len,
                cigar=self.cigarstring, seconds=elapsed,
                pattern=(self._pattern if self._verbose >= 2 else ""),
                text=(text if self._verbose >= 2 else ""),
                config=f"({self._distance},{self.span},{self.scope})")
        return self._score

    def _run_engine(self, bpattern: bytes, btext: bytes, wildcard):
        backend = self._backend
        if backend == "auto":
            backend = "jax" if _jax_engine_available() else "numpy"
        if backend == "jax":
            from .engine_adapter import align_single
            return align_single(self._attributes(), bpattern, btext, wildcard)
        from .oracle import OracleAligner
        return OracleAligner(self._attributes(), wildcard).align(bpattern, btext)

    def cigar_print_pretty(self, file_name=None):
        """(reference: align.pyx:445-459 -> cigar.c:778-863)"""
        pattern = self._bpattern.decode("ascii")
        text = self._text if self._text is not None else ""
        cig = Cigar(ops=self._cigar_ops, score=self._score)
        if file_name:
            with open(file_name, "w") as fh:
                cigar_print_pretty_c(cig, pattern, text, file=fh)
        else:
            cigar_print_pretty_c(cig, pattern, text, file=sys.stdout)

    # -- properties (reference: align.pyx:461-833) ----------------------
    @property
    def status(self):
        return self._status

    @property
    def score(self):
        return self._score

    @property
    def pattern_begin_free(self):
        return self._pattern_begin_free

    @pattern_begin_free.setter
    def pattern_begin_free(self, pattern_begin_free):
        # plain assignment (reference: align.pyx:473-475)
        self._pattern_begin_free = pattern_begin_free

    @property
    def pattern_end_free(self):
        return self._pattern_end_free

    @pattern_end_free.setter
    def pattern_end_free(self, pattern_end_free):
        self._pattern_end_free = pattern_end_free

    @property
    def text_begin_free(self):
        return self._text_begin_free

    @text_begin_free.setter
    def text_begin_free(self, text_begin_free):
        self._text_begin_free = text_begin_free

    @property
    def text_end_free(self):
        return self._text_end_free

    @text_end_free.setter
    def text_end_free(self, text_end_free):
        self._text_end_free = text_end_free

    @property
    def scope(self):
        if self._scope == AlignmentScope.COMPUTE_ALIGNMENT:
            return "full"
        else:
            return "score"

    @scope.setter
    def scope(self, scope):
        if scope == "full":
            self._scope = AlignmentScope.COMPUTE_ALIGNMENT
        elif scope == "score":
            self._scope = AlignmentScope.COMPUTE_SCORE
        else:
            raise ValueError(f'{scope} scope not understood')

    @property
    def span(self):
        if self._span == AlignmentSpan.ENDS_FREE:
            return "ends-free"
        elif self._span == AlignmentSpan.END_TO_END:
            return "end-to-end"

    @span.setter
    def span(self, span):
        if span == "ends-free":
            self._span = AlignmentSpan.ENDS_FREE
        elif span == "end-to-end":
            self._span = AlignmentSpan.END_TO_END
        else:
            raise NotImplementedError(f'{span} span not implemented')

    @property
    def memory_mode(self):
        return {
            MemoryMode.HIGH: "high",
            MemoryMode.MED: "medium",
            MemoryMode.LOW: "low",
            MemoryMode.ULTRALOW: "biwfa",
        }[self._memory_mode]

    @memory_mode.setter
    def memory_mode(self, memory_mode):
        # NOTE: mirrors align.pyx:545-556, which accepts "med" (not "medium")
        # in the setter
        if memory_mode == "high":
            self._memory_mode = MemoryMode.HIGH
        elif memory_mode == "med":
            self._memory_mode = MemoryMode.MED
        elif memory_mode == "low":
            self._memory_mode = MemoryMode.LOW
        elif memory_mode == "biwfa":
            self._memory_mode = MemoryMode.ULTRALOW
        else:
            raise NotImplementedError(f'{memory_mode} memory_mode not implemented')

    @property
    def heuristic(self):
        if self._heuristic_strategy == HeuristicStrategy.NONE:
            return None
        elif self._heuristic_strategy == HeuristicStrategy.WFADAPTIVE:
            return "adaptive"
        elif self._heuristic_strategy == HeuristicStrategy.XDROP:
            return "X-drop"

    @heuristic.setter
    def heuristic(self, heuristic):
        if heuristic is None:
            self._heuristic_strategy = HeuristicStrategy.NONE
        elif heuristic == "adaptive":
            self._heuristic_strategy = HeuristicStrategy.WFADAPTIVE
        elif heuristic == "X-drop":
            self._heuristic_strategy = HeuristicStrategy.XDROP
        else:
            raise NotImplementedError(f'{heuristic} heuristic not implemented')

    @property
    def min_wavefront_length(self):
        return self._min_wavefront_length

    @min_wavefront_length.setter
    def min_wavefront_length(self, length):
        self._min_wavefront_length = length

    @property
    def max_distance_threshold(self):
        return self._max_distance_threshold

    @max_distance_threshold.setter
    def max_distance_threshold(self, thresh):
        self._max_distance_threshold = thresh

    @property
    def steps_between_cutoffs(self):
        return self._steps_between_cutoffs

    @steps_between_cutoffs.setter
    def steps_between_cutoffs(self, steps):
        self._steps_between_cutoffs = steps

    @property
    def xdrop(self):
        return self._xdrop

    @xdrop.setter
    def xdrop(self, xdrop):
        self._xdrop = xdrop

    @property
    def distance(self):
        return {"indel": "indel", "levenshtein": "levenshtein",
                "linear": "linear", "affine": "affine",
                "affine2p": "affine2p"}[self._distance]

    @distance.setter
    def distance(self, distance):
        if distance not in ("indel", "levenshtein", "linear", "affine", "affine2p"):
            raise NotImplementedError(f'{distance} distance not implemented')
        self._distance = distance
        self._build_penalties()

    @property
    def match_score(self):
        return self._penalties.match

    @match_score.setter
    def match_score(self, match):
        self._match = match
        self._build_penalties()

    @property
    def mismatch_penalty(self):
        return self._penalties.mismatch

    @mismatch_penalty.setter
    def mismatch_penalty(self, mismatch):
        self._mismatch = mismatch
        self._build_penalties()

    @property
    def gap_opening_penalty(self):
        return self._penalties.gap_opening1

    @gap_opening_penalty.setter
    def gap_opening_penalty(self, penalty):
        # also writes the linear-model indel (reference: align.pyx:675)
        self._gap_opening = penalty
        self._linear_indel = penalty
        self._build_penalties()

    @property
    def gap_extension_penalty(self):
        return self._penalties.gap_extension1

    @gap_extension_penalty.setter
    def gap_extension_penalty(self, penalty):
        self._gap_extension = penalty
        self._linear_indel = penalty
        self._build_penalties()

    @property
    def gap_opening2_penalty(self):
        return self._penalties.gap_opening2

    @gap_opening2_penalty.setter
    def gap_opening2_penalty(self, penalty):
        self._gap_opening2 = penalty
        self._build_penalties()

    @property
    def gap_extension2_penalty(self):
        return self._penalties.gap_extension2

    @gap_extension2_penalty.setter
    def gap_extension2_penalty(self, penalty):
        self._gap_extension2 = penalty
        self._build_penalties()

    @property
    def wildcard(self):
        return self._wildcard

    @wildcard.setter
    def wildcard(self, wildcard):
        if wildcard is not None:
            if not isinstance(wildcard, str):
                raise TypeError(
                    f"expected wildcard to be a string, but it is {type(wildcard)}")
            if len(wildcard) > 1:
                raise ValueError(
                    f"wildcard must have length 1, but has length {len(wildcard)}")
            self._wildcard = wildcard
            self._bwildcard = wildcard.upper().encode("ascii")[0]
        else:
            self._wildcard = None

    @property
    def max_steps(self):
        return self._max_steps

    @max_steps.setter
    def max_steps(self, steps):
        if steps <= 0:
            steps = INT_MAX
        self._max_steps = steps

    @property
    def cigarstring(self):
        return ops_to_cigarstring(self._cigar_ops)

    @property
    def cigartuples(self):
        return ops_to_cigartuples(self._cigar_ops)

    @property
    def locations(self):
        """(pattern_start, pattern_end, text_start, text_end).

        (reference: align.pyx:788-833)
        """
        if self.scope == "score":
            return [0, 0, 0, 0]
        cigartuples = self.cigartuples
        if not cigartuples or self.text_len == 0 or self.pattern_len == 0:
            return [0, 0, 0, 0]

        ct = cigartuples
        text_start = 0
        pattern_start = 0
        i = 0
        for i in range(len(cigartuples)):
            if ct[i][0] == 0:
                if ct[i][1] >= 1:
                    break
                else:
                    text_start += ct[i][1]
                    pattern_start += ct[i][1]
            elif ct[i][0] == 2:  # deletion
                pattern_start += ct[i][1]
            elif ct[i][0] == 8:  # mismatch
                text_start += ct[i][1]
                pattern_start += ct[i][1]
            elif ct[i][0] == 1:  # insertion
                text_start += ct[i][1]

        text_end = self.text_len
        pattern_end = self.pattern_len
        j = len(ct) - 1
        for j in range(len(ct) - 1, -1, -1):
            if ct[j][0] == 0:
                if ct[j][1] >= 1:
                    break
                else:
                    text_end -= ct[j][1]
                    pattern_end -= ct[j][1]
            elif ct[j][0] == 2:
                pattern_end -= ct[j][1]
            elif ct[j][0] == 8:
                pattern_end -= ct[j][1]
                text_end -= ct[j][1]
            elif ct[j][0] == 1:
                text_end -= ct[j][1]

        return pattern_start, pattern_end, text_start, text_end

    def __call__(self, text, pattern=None, clip_cigar=False,
                 min_aligned_bases_left=1, min_aligned_bases_right=1,
                 elide_mismatches=False, supress_sequences=False):
        """Align `text` to `pattern`; returns AlignmentResult.

        (reference: align.pyx:835-879)
        """
        if pattern is None:
            p = self._pattern
            if not p:
                raise ValueError("pattern is None")
            lp = len(self._pattern)
            score = self.wavefront_align(text)
        else:
            lp = len(pattern)
            p = pattern
            score = self.wavefront_align(text, pattern)

        ct = self.cigartuples
        locs = self.locations
        status = self.status
        if supress_sequences:
            res = AlignmentResult(lp, len(text), locs[0], locs[1], locs[2],
                                  locs[3], ct, score, "", "", status)
        else:
            res = AlignmentResult(lp, len(text), locs[0], locs[1], locs[2],
                                  locs[3], ct, score, p, text, status)
        # NOTE: the reference snapshot reads `if not self.scope == "full"`
        # (align.pyx:874), but that gate contradicts the reference's own
        # README examples (README.rst:219-243, clip with default scope) and
        # makes tests/test.py:231-232's golden unreachable; the working pywfa
        # behavior applies post-processing when scope IS "full", so we do too.
        if self.scope == "full":
            if clip_cigar:
                res = clip_cigartuples(res, min_aligned_bases_left,
                                       min_aligned_bases_right)
            if elide_mismatches:
                res.cigartuples = elide_mismatches_from_cigar(res.cigartuples)
        return res


def _jax_engine_available() -> bool:
    try:
        from . import engine_adapter  # noqa: F401
        return engine_adapter.available()
    except Exception:
        return False
