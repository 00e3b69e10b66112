"""Synthetic genome / mpileup generators for differential testing.

Generates format-valid mpileup text (the columns the pipeline consumes:
chrom, pos, and the base string with ^/$/indel/run-length syntax) plus the
matching FASTA+fai, so the reference C++ oracle in /tmp/ref_build and our
implementation can be compared row-for-row.
"""
from __future__ import annotations

import numpy as np

BASES = "ACGT"


def random_genome(rng, contigs):
    """contigs: {name: length} -> {name: sequence str} with soft-masked runs
    and occasional Ns."""
    out = {}
    for name, length in contigs.items():
        arr = rng.choice(list("ACGT"), size=length)
        # soft-masked (lowercase) stretch
        if length > 50:
            s = rng.integers(0, length - 20)
            arr[s: s + 15] = [c.lower() for c in arr[s: s + 15]]
        # a few Ns
        for _ in range(max(1, length // 200)):
            arr[rng.integers(0, length)] = "N"
        out[name] = "".join(arr)
    return out


def _random_base_string(rng, ref_base: str, depth: int, alt_rate: float) -> str:
    """One mpileup bases column. Mix of match/mismatch/indel/* with
    strand case, read starts (^X) and ends ($)."""
    toks = []
    for _ in range(depth):
        fwd = rng.random() < 0.5
        r = rng.random()
        if r < alt_rate:
            kind = rng.integers(0, 4)
            if kind == 0:  # mismatch
                b = BASES[rng.integers(0, 4)]
                tok = b if fwd else b.lower()
            elif kind == 1:  # insertion after a match
                ins_len = int(rng.integers(1, 5)) if rng.random() > 0.02 else 70
                seq = "".join(BASES[i] for i in rng.integers(0, 4, ins_len))
                base = ref_base.upper() if fwd else ref_base.lower()
                if base not in "ACGTacgt":
                    base = "N" if fwd else "n"
                tok = f"{base}+{ins_len}{seq if fwd else seq.lower()}"
            elif kind == 2:  # deletion starting after this base
                del_len = int(rng.integers(1, 4))
                seq = "".join(BASES[i] for i in rng.integers(0, 4, del_len))
                base = ref_base.upper() if fwd else ref_base.lower()
                if base not in "ACGTacgt":
                    base = "N" if fwd else "n"
                tok = f"{base}-{del_len}{seq if fwd else seq.lower()}"
            else:  # deleted base placeholder
                tok = "*" if fwd else "#"
        else:
            if ref_base.upper() in "ACGT":
                tok = ref_base.upper() if fwd else ref_base.lower()
            else:
                tok = "N" if fwd else "n"
        if rng.random() < 0.08:
            mapq = chr(int(rng.integers(33, 94)))
            tok = "^" + mapq + tok
        elif rng.random() < 0.08:
            tok = tok + "$"
        toks.append(tok)
    return "".join(toks) if toks else "*"


def random_mpileup(rng, name: str, seq: str, coverage: int = 20,
                   alt_rate: float = 0.12, gap_rate: float = 0.01,
                   start: int = 1, end: int | None = None):
    """Yield mpileup lines for positions [start, end] with occasional gaps
    and variable depth. 6 columns like samtools mpileup output."""
    end = end or len(seq)
    lines = []
    pos = start
    while pos <= end:
        if rng.random() < gap_rate:
            pos += int(rng.integers(1, 5))  # gap
            continue
        depth = max(0, int(rng.normal(coverage, coverage * 0.3)))
        ref_base = seq[pos - 1]
        bases = _random_base_string(rng, ref_base, depth, alt_rate)
        quals = "".join(chr(int(q)) for q in rng.integers(33, 74, depth))
        lines.append(f"{name}\t{pos}\t{ref_base}\t{depth}\t{bases}\t{quals or '*'}")
        pos += 1
    return lines
