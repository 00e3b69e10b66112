"""Synthetic BAM writer + independent mpileup-text simulator.

Used to differential-test the native BAM engine: the same synthetic read set
goes (a) through this Python mpileup simulator into the text parser, and
(b) into a BGZF/BAM file consumed by the native engine — two fully
independent implementations of the pileup semantics that must agree.
"""
from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

CIGAR_OPS = "MIDNSHP=X"
SEQ16 = "=ACMGRSVTWYHKDBN"
SEQ16_IDX = {c: i for i, c in enumerate(SEQ16)}


@dataclass
class Read:
    name: str
    ref_id: int
    start0: int                       # 0-based leftmost
    cigar: List[Tuple[str, int]]      # [(op, len)]
    seq: str                          # query bases
    quals: List[int]
    mapq: int = 60
    reverse: bool = False
    flag_extra: int = 0               # additional flags (secondary etc.)
    hp: Optional[int] = None          # HP tag
    long_cigar: bool = False          # emit the htslib CG:B,I convention:
                                      # placeholder "<l_seq>S<span>N" CIGAR,
                                      # real ops in a CG aux tag (written by
                                      # samtools/minimap2 when a record has
                                      # >65535 ops — ultra-long ONT reads)

    @property
    def flag(self) -> int:
        return (16 if self.reverse else 0) | self.flag_extra

    def ref_span(self) -> int:
        return sum(l for op, l in self.cigar if op in "MDN=X")


def bgzf_block(payload: bytes) -> bytes:
    comp = zlib.compressobj(6, zlib.DEFLATED, -15)
    data = comp.compress(payload) + comp.flush()
    bsize = len(data) + 25 + 1
    header = struct.pack(
        "<BBBBIBBHBBHH",
        0x1F, 0x8B, 8, 4,   # magic, CM=deflate, FLG=FEXTRA
        0, 0, 0xFF,          # MTIME, XFL, OS
        6,                   # XLEN
        ord("B"), ord("C"), 2, bsize - 1)
    footer = struct.pack("<II", zlib.crc32(payload) & 0xFFFFFFFF,
                         len(payload) & 0xFFFFFFFF)
    return header + data + footer


BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000")


def encode_record(r: Read) -> bytes:
    name = r.name.encode() + b"\0"
    cigar_ops = [(l << 4) | CIGAR_OPS.index(op) for op, l in r.cigar]
    cg_aux = b""
    if r.long_cigar:
        cg_aux = (b"CGBI" + struct.pack("<I", len(cigar_ops))
                  + b"".join(struct.pack("<I", c) for c in cigar_ops))
        cigar_ops = [(len(r.seq) << 4) | CIGAR_OPS.index("S"),
                     (r.ref_span() << 4) | CIGAR_OPS.index("N")]
    cigar = b"".join(struct.pack("<I", c) for c in cigar_ops)
    seq4 = bytearray((len(r.seq) + 1) // 2)
    for i, base in enumerate(r.seq):
        code = SEQ16_IDX.get(base.upper(), 15)
        if i % 2 == 0:
            seq4[i // 2] |= code << 4
        else:
            seq4[i // 2] |= code
    qual = bytes(r.quals)
    aux = b""
    if r.hp is not None:
        aux = b"HP" + b"i" + struct.pack("<i", r.hp)
    aux += cg_aux
    body = struct.pack(
        "<iiBBHHHiiii",
        r.ref_id, r.start0,
        len(name), r.mapq,
        4680,  # bin (unused by our reader)
        len(cigar_ops), r.flag,
        len(r.seq), -1, -1, 0,
    ) + name + cigar + bytes(seq4) + qual + aux
    return struct.pack("<i", len(body)) + body


def write_bam(path: str, refs: List[Tuple[str, int]], reads: List[Read]) -> None:
    """Reads must be position-sorted (BAM order)."""
    header_text = b""
    hdr = b"BAM\1" + struct.pack("<i", len(header_text)) + header_text
    hdr += struct.pack("<i", len(refs))
    for name, length in refs:
        nb = name.encode() + b"\0"
        hdr += struct.pack("<i", len(nb)) + nb + struct.pack("<i", length)
    payload = hdr + b"".join(encode_record(r) for r in reads)
    with open(path, "wb") as f:
        # split into BGZF blocks of <= 60000 bytes
        for i in range(0, len(payload), 60000):
            f.write(bgzf_block(payload[i: i + 60000]))
        f.write(BGZF_EOF)


# ---------------------------------------------------------------------------
# mpileup text simulation (independent reimplementation of samtools
# semantics used by the pipeline: --min-MQ, --excl-flags, --max-depth,
# --reverse-del, no reference)
# ---------------------------------------------------------------------------


def simulate_mpileup(
    refs: Dict[str, str],
    reads_by_contig: Dict[str, List[Read]],
    min_mq: int = 20,
    excl_flags: int = 2316,
    max_depth: int = 144,
) -> List[str]:
    lines = []
    for contig, reads in reads_by_contig.items():
        events: Dict[int, List[str]] = {}   # pos0 -> base-string tokens
        quals: Dict[int, List[str]] = {}
        col_n: Dict[int, int] = {}
        for r in reads:
            if r.flag & excl_flags or r.mapq < min_mq:
                continue
            rpos = r.start0
            qpos = 0
            pending: List[Tuple[int, str, str]] = []  # (pos0, token, qual)
            last_base_tok: Optional[int] = None       # index into pending
            for op, ln in r.cigar:
                if op in "M=X":
                    for k in range(ln):
                        base = r.seq[qpos + k]
                        tok = base.upper() if not r.reverse else base.lower()
                        pending.append((rpos + k,
                                        tok,
                                        chr(33 + r.quals[qpos + k])))
                        last_base_tok = len(pending) - 1
                    rpos += ln
                    qpos += ln
                elif op == "I":
                    ins = r.seq[qpos: qpos + ln]
                    ins = ins.upper() if not r.reverse else ins.lower()
                    if last_base_tok is not None:
                        p, tok, q = pending[last_base_tok]
                        pending[last_base_tok] = (p, tok + f"+{ln}{ins}", q)
                    qpos += ln
                elif op == "D":
                    dseq = "N" * ln  # no -f: deleted seq prints as N
                    dseq = dseq if not r.reverse else dseq.lower()
                    if last_base_tok is not None:
                        p, tok, q = pending[last_base_tok]
                        pending[last_base_tok] = (p, tok + f"-{ln}{dseq}", q)
                    for k in range(ln):
                        pending.append((rpos + k,
                                        "*" if not r.reverse else "#",
                                        "*"))
                    rpos += ln
                elif op == "N":
                    rpos += ln
                elif op == "S":
                    qpos += ln
            for p, tok, q in pending:
                if col_n.get(p, 0) >= max_depth:
                    continue
                col_n[p] = col_n.get(p, 0) + 1
                events.setdefault(p, []).append(tok)
                quals.setdefault(p, []).append(q)
        for p in sorted(events):
            toks = events[p]
            lines.append(
                f"{contig}\t{p + 1}\tN\t{len(toks)}\t{''.join(toks)}\t"
                f"{''.join(quals[p])}")
    return lines


def random_reads(rng, contig_seq: str, ref_id: int, n_reads: int = 60,
                 read_len: int = 120, with_hp: bool = False,
                 mq_range=(0, 60)) -> List[Read]:
    """Random semi-realistic reads: mismatches, insertions, deletions,
    soft clips, reverse strands, low-mapq and flagged reads."""
    L = len(contig_seq)
    reads = []
    for i in range(n_reads):
        start = int(rng.integers(0, max(L - read_len, 1)))
        cigar: List[Tuple[str, int]] = []
        seq = []
        quals: List[int] = []
        if rng.random() < 0.3:
            sc = int(rng.integers(1, 8))
            cigar.append(("S", sc))
            seq.extend(rng.choice(list("ACGT"), sc))
            quals.extend(int(q) for q in rng.integers(5, 40, sc))
        rpos = start
        match_run = 0
        remaining = read_len
        while remaining > 0 and rpos < L:
            rnd = rng.random()
            if rnd < 0.85 or match_run == 0:
                base = contig_seq[rpos]
                if rng.random() < 0.08:
                    base = "ACGT"[int(rng.integers(0, 4))]
                if base.upper() not in "ACGT" or rng.random() < 0.01:
                    base = "N" if rng.random() < 0.5 else base
                seq.append(base.upper())
                quals.append(int(rng.integers(5, 40)))
                if cigar and cigar[-1][0] == "M":
                    cigar[-1] = ("M", cigar[-1][1] + 1)
                else:
                    cigar.append(("M", 1))
                rpos += 1
                match_run += 1
                remaining -= 1
            elif rnd < 0.92:
                ln = int(rng.integers(1, 5))
                cigar.append(("I", ln))
                ins = rng.choice(list("ACGT"), ln)
                seq.extend(ins)
                quals.extend(int(q) for q in rng.integers(5, 40, ln))
                remaining -= ln
                match_run = 0
            else:
                ln = int(rng.integers(1, 4))
                if rpos + ln >= L:
                    break
                cigar.append(("D", ln))
                rpos += ln
                match_run = 0
        if not any(op == "M" for op, _ in cigar):
            continue
        # trailing soft clip sometimes
        if rng.random() < 0.2:
            sc = int(rng.integers(1, 6))
            cigar.append(("S", sc))
            seq.extend(rng.choice(list("ACGT"), sc))
            quals.extend(int(q) for q in rng.integers(5, 40, sc))
        mapq = int(rng.integers(*mq_range))
        flag_extra = 0
        r = rng.random()
        if r < 0.05:
            flag_extra = 256      # secondary
        elif r < 0.08:
            flag_extra = 2048     # supplementary
        reads.append(Read(
            name=f"read{i}",
            ref_id=ref_id,
            start0=start,
            cigar=cigar,
            seq="".join(seq),
            quals=quals,
            mapq=mapq,
            reverse=bool(rng.random() < 0.5),
            flag_extra=flag_extra,
            hp=(int(rng.integers(1, 3)) if with_hp and rng.random() < 0.7
                else None),
        ))
    reads.sort(key=lambda r: r.start0)
    return reads
