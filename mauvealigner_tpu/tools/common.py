"""Shared helpers for the CLI tools."""

from __future__ import annotations

import sys
from typing import List, Optional, Sequence, TextIO

from mauvealigner_tpu.genome import read_fasta, read_genbank, read_raw
from mauvealigner_tpu.genome.sequence import Genome


def load_genome(path: str) -> Genome:
    """Load by extension: FASTA (default), GenBank (.gbk/.gb), raw (.raw)."""
    low = path.lower()
    if low.endswith((".gbk", ".gb", ".genbank")):
        return read_genbank(path)
    if low.endswith(".raw"):
        return read_raw(path)
    return read_fasta(path)


def load_genomes(paths: Sequence[str]) -> List[Genome]:
    return [load_genome(p) for p in paths]


def open_out(path: Optional[str]) -> TextIO:
    if path in (None, "", "-"):
        return sys.stdout
    return open(path, "w")
