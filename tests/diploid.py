"""Diploid synthetic world: phased haplotypes, haplotagged reads.

Models what the real pipeline sees after whatshap: reads sampled from two
haplotype sequences carrying phased het SNVs (plus hom SNVs on both), with
HP tags on most reads. SNV-only so alignments stay all-M against the
reference coordinates.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Tuple

import numpy as np

from bamgen import Read


@dataclass
class DiploidTruth:
    pos1: int          # 1-based
    ref: str
    alt: str
    hom: bool          # both haplotypes carry alt
    hap: int           # 1 or 2 for het (which haplotype carries alt)


def make_diploid(rng, ref_seq: str, n_het: int, n_hom: int,
                 spacing: int = 40) -> Tuple[List[DiploidTruth], str, str]:
    L = len(ref_seq)
    sites = np.sort(rng.choice(
        np.arange(60, L - 60, spacing), size=min(n_het + n_hom,
                                                 (L - 120) // spacing),
        replace=False))
    truth: List[DiploidTruth] = []
    h1 = list(ref_seq)
    h2 = list(ref_seq)
    is_hom = np.zeros(len(sites), dtype=bool)
    is_hom[: n_hom] = True
    rng.shuffle(is_hom)
    for pos0, hom in zip(sites, is_hom):
        ref_b = ref_seq[pos0].upper()
        if ref_b not in "ACGT":
            continue
        alt = str(rng.choice([b for b in "ACGT" if b != ref_b]))
        if hom:
            h1[pos0] = alt
            h2[pos0] = alt
            truth.append(DiploidTruth(pos0 + 1, ref_b, alt, True, 0))
        else:
            hap = int(rng.integers(1, 3))
            (h1 if hap == 1 else h2)[pos0] = alt
            truth.append(DiploidTruth(pos0 + 1, ref_b, alt, False, hap))
    return truth, "".join(h1), "".join(h2)


def diploid_reads(rng, h1: str, h2: str, ref_id: int, n_reads: int,
                  read_len: int, err: float = 0.05,
                  tag_rate: float = 0.85) -> List[Read]:
    L = len(h1)
    reads = []
    for i in range(n_reads):
        hap = int(rng.integers(1, 3))
        src = h1 if hap == 1 else h2
        start = int(rng.integers(0, max(L - read_len, 1)))
        frag = list(src[start: start + read_len].upper())
        for k in range(len(frag)):
            if rng.random() < err:
                frag[k] = "ACGT"[int(rng.integers(0, 4))]
        quals = [int(q) for q in rng.integers(15, 40, len(frag))]
        reads.append(Read(
            name=f"d{i}",
            ref_id=ref_id,
            start0=start,
            cigar=[("M", len(frag))],
            seq="".join(frag),
            quals=quals,
            mapq=int(rng.integers(30, 60)),
            reverse=bool(rng.random() < 0.5),
            hp=hap if rng.random() < tag_rate else None,
        ))
    reads.sort(key=lambda r: r.start0)
    return reads


def truth_vcf_lines(contig: str, truth: List[DiploidTruth]) -> List[str]:
    hdr = ["##fileformat=VCFv4.3\n",
           "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n"]
    rows = []
    for t in sorted(truth, key=lambda t: t.pos1):
        gt = "1/1" if t.hom else "0/1"
        rows.append(f"{contig}\t{t.pos1}\t.\t{t.ref}\t{t.alt}\t50\tPASS\t.\t"
                    f"GT\t{gt}\n")
    return hdr + rows
