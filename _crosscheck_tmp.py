import numpy as np
from pywfa_tpu import WavefrontAligner
rng = np.random.default_rng(7)
ACGT = np.array(list("ACGT"))
def seq(n): return "".join(rng.choice(ACGT, n))
def mutate(s, rate):
    out = []
    for c in s:
        r = rng.random()
        if r < rate*0.5: out.append(rng.choice(ACGT))
        elif r < rate*0.75: continue
        elif r < rate: out.extend([c, rng.choice(ACGT)])
        else: out.append(c)
    return "".join(out)

configs = [
    dict(),
    dict(distance="affine2p"),
    dict(span="ends-free", pattern_begin_free=20, pattern_end_free=20,
         text_begin_free=20, text_end_free=20),
    dict(distance="levenshtein"),
    dict(scope="score"),
]
n_checked = 0
for ci, kw in enumerate(configs):
    for trial in range(6):
        L = int(rng.integers(30, 400))
        p = seq(L)
        if trial == 5:
            t = seq(int(rng.integers(30, 400)))  # unrelated, high score
        else:
            t = mutate(p, rate=float(rng.uniform(0.02, 0.25)))
        a_t = WavefrontAligner(p, **kw)
        a_c = WavefrontAligner(p, backend="numpy", **kw)
        rt, rc = a_t(t), a_c(t)
        assert (rt.score, rt.status, rt.cigarstring) == (rc.score, rc.status, rc.cigarstring), \
            (ci, trial, rt.score, rc.score, rt.status, rc.status, rt.cigarstring, rc.cigarstring)
        n_checked += 1
print(f"crosscheck OK: {n_checked} alignments, TPU engine == oracle byte-exact")
