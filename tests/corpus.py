"""Shared random-pair corpus generators for the test suite.

One place for the mutate-a-pattern semantics (substitutions at rate `sub`;
for each base, delete with probability ind/2 or insert a random base with
probability ind/2) so tweaks apply suite-wide.
"""
import random


def mutate(rng: random.Random, p: str, sub: float, ind: float) -> str:
    t = []
    for c in p:
        r = rng.random()
        if r < ind / 2:
            continue
        if r < ind:
            t.append(rng.choice("ACGT"))
        t.append(c if rng.random() > sub else rng.choice("ACGT"))
    return "".join(t) or "A"


def random_pairs(seed, n, lo, hi, sub, ind, unrelated=0.0, as_bytes=False):
    """n (pattern, text) pairs; `unrelated` fraction get a fresh random
    text (forcing drops/escalation)."""
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        p = "".join(rng.choice("ACGT") for _ in range(rng.randint(lo, hi)))
        if unrelated and rng.random() < unrelated:
            t = "".join(rng.choice("ACGT")
                        for _ in range(rng.randint(lo, hi)))
        else:
            t = mutate(rng, p, sub, ind)
        out.append((p.encode(), t.encode()) if as_bytes else (p, t))
    return out
