"""Minimal FASTA reader for test fixtures (no pysam dependency)."""
from __future__ import annotations

from typing import Iterator, Tuple


def read_fasta(path: str) -> Iterator[Tuple[str, str]]:
    name = None
    chunks = []
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            if line.startswith(">"):
                if name is not None:
                    yield name, "".join(chunks)
                name = line[1:].split()[0] if " " not in line[1:] else line[1:]
                name = line[1:]
                chunks = []
            else:
                chunks.append(line)
        if name is not None:
            yield name, "".join(chunks)
