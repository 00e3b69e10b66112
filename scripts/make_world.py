"""Chromosome-scale synthetic diploid world generator (vectorized).

tests/bamgen.py builds reads with per-base Python loops (fine for unit
worlds, ~10 kB/s of read bases); perf work needs 100 Mbp x 30x = 3 Gbp of
read bases, so this module synthesizes the whole world with numpy:

  - reference contigs (uint8 arrays) + diploid SNV truth (h1/h2 remain
    coordinate-aligned: truth is SNV-only, like the caller's target);
  - fixed-length reads with substitution errors everywhere and at most one
    real indel event per read (aM kI bM / aM dD bM CIGARs), untagged by
    default so `call --phaser native` runs the production phasing path;
  - BAM records encoded as per-CIGAR-form uint8 matrices scattered into a
    position-sorted blob, BGZF-compressed on a thread pool (zlib releases
    the GIL).

Matches the container format tests/bamgen.py writes (the native engine's
differential oracle), at ~100 MB/s instead of ~10 kB/s.

CLI:  python scripts/make_world.py --out /tmp/world100 \
        --sizes-mbp 100 --coverage 30 [--read-len 3000] [--seed 7]
"""
from __future__ import annotations

import argparse
import os
import struct
import sys
import zlib
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Tuple

import numpy as np

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
SEQ16_NIBBLE = np.zeros(256, np.uint8)
for _b, _c in zip(b"ACGT", (1, 2, 4, 8)):
    SEQ16_NIBBLE[_b] = _c
BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000")


def make_genome(rng, sizes: Dict[str, int]) -> Dict[str, np.ndarray]:
    return {name: BASES[rng.integers(0, 4, size=n)]
            for name, n in sizes.items()}


def make_truth(rng, ref: np.ndarray, het_rate=1 / 1500., hom_rate=1 / 3000.):
    """SNV truth: returns (h1, h2, rows) where rows are
    (pos1, ref_base, alt_base, gt_string)."""
    n = len(ref)
    n_het = int(n * het_rate)
    n_hom = int(n * hom_rate)
    pos = rng.choice(n, size=n_het + n_hom, replace=False)
    pos.sort()
    kinds = np.zeros(len(pos), np.int8)          # 0: het h1, 1: het h2, 2: hom
    kinds[rng.random(len(pos)) < n_hom / max(len(pos), 1)] = 2
    het = np.flatnonzero(kinds != 2)
    kinds[het[rng.random(len(het)) < 0.5]] = 1
    shift = rng.integers(1, 4, size=len(pos)).astype(np.uint8)
    ref_idx = np.searchsorted(BASES, ref[pos])
    alt = BASES[(ref_idx + shift) % 4]
    h1 = ref.copy()
    h2 = ref.copy()
    h1[pos[kinds != 1]] = alt[kinds != 1]
    h2[pos[kinds != 0]] = alt[kinds != 0]
    gt = np.choose(kinds, ["1|0", "0|1", "1|1"])
    rows = list(zip((pos + 1).tolist(),
                    ref[pos].tobytes().decode(),
                    alt.tobytes().decode(), gt.tolist()))
    return h1, h2, rows


def write_fasta_fast(path: str, contigs: Dict[str, np.ndarray],
                     width: int = 70) -> None:
    fai = []
    with open(path, "wb") as f:
        for name, seq in contigs.items():
            f.write(b">" + name.encode() + b"\n")
            offset = f.tell()
            n = len(seq)
            pad = (-n) % width
            mat = np.concatenate([seq, np.zeros(pad, np.uint8)])
            mat = mat.reshape(-1, width)
            out = np.concatenate(
                [mat, np.full((mat.shape[0], 1), ord("\n"), np.uint8)],
                axis=1).ravel()
            if pad:  # drop pad bytes but keep the final newline
                out = np.concatenate(
                    [out[: -(pad + 1)], np.array([ord("\n")], np.uint8)])
            f.write(out.tobytes())
            fai.append(f"{name}\t{n}\t{offset}\t{width}\t{width + 1}")
    with open(path + ".fai", "w") as f:
        f.write("\n".join(fai) + "\n")


def _put(mat: np.ndarray, off: int, vals, dtype) -> None:
    a = np.asarray(vals, dtype=dtype)
    w = a.dtype.itemsize
    mat[:, off: off + w] = (np.broadcast_to(a, (mat.shape[0],))
                            .astype(dtype).reshape(-1, 1)
                            .view(np.uint8).reshape(mat.shape[0], w))


def _bam_header(refs: List[Tuple[str, int]]) -> bytes:
    hdr = b"BAM\1" + struct.pack("<i", 0)
    hdr += struct.pack("<i", len(refs))
    for name, length in refs:
        nb = name.encode() + b"\0"
        hdr += struct.pack("<i", len(nb)) + nb + struct.pack("<i", length)
    return hdr


class BgzfStreamWriter:
    """Position-independent BGZF blocks compressed on a thread pool."""

    def __init__(self, f, workers: int = 0, level: int = 1):
        self.f = f
        self.level = level
        self.pool = ThreadPoolExecutor(workers or (os.cpu_count() or 4))
        self.carry = b""

    def _block(self, payload: bytes) -> bytes:
        comp = zlib.compressobj(self.level, zlib.DEFLATED, -15)
        data = comp.compress(payload) + comp.flush()
        bsize = len(data) + 26
        header = struct.pack("<BBBBIBBHBBHH", 0x1F, 0x8B, 8, 4, 0, 0, 0xFF,
                             6, ord("B"), ord("C"), 2, bsize - 1)
        footer = struct.pack("<II", zlib.crc32(payload) & 0xFFFFFFFF,
                             len(payload) & 0xFFFFFFFF)
        return header + data + footer

    def write(self, payload: bytes) -> None:
        buf = self.carry + payload
        full = len(buf) - len(buf) % 60000
        self.carry = buf[full:]
        if full:
            pieces = [buf[i: i + 60000] for i in range(0, full, 60000)]
            for blk in self.pool.map(self._block, pieces):
                self.f.write(blk)

    def close(self) -> None:
        if self.carry:
            self.f.write(self._block(self.carry))
            self.carry = b""
        self.f.write(BGZF_EOF)
        self.pool.shutdown()


def write_reads_bam(rng, path: str, contigs: Dict[str, np.ndarray],
                    haplos: Dict[str, Tuple[np.ndarray, np.ndarray]],
                    coverage: int = 30, read_len: int = 3000,
                    p_sub: float = 0.05, indel_frac: float = 0.4,
                    max_indel: int = 6, batch: int = 16384,
                    tag_rate: float = 0.0) -> int:
    """Returns the number of reads written."""
    if read_len % 2:
        raise ValueError(f"read_len must be even (nibble-packed seq), "
                         f"got {read_len}")
    span_req = read_len + max_indel
    for n, s in contigs.items():
        if len(s) <= span_req:
            raise ValueError(
                f"contig {n!r} ({len(s)} bp) must exceed "
                f"read_len+max_indel={span_req} — shorten --read-len or "
                f"grow the contig")
    refs = [(n, len(s)) for n, s in contigs.items()]
    total = 0
    with open(path, "wb") as f:
        w = BgzfStreamWriter(f)
        w.write(_bam_header(refs))
        for ref_id, (name, _ref_seq) in enumerate(refs):
            h1, h2 = haplos[name]
            L = len(h1)
            n_reads = max(1, L * coverage // read_len)
            span_max = read_len + max_indel
            starts = np.sort(rng.integers(0, max(L - span_max, 1),
                                          size=n_reads))
            for lo in range(0, n_reads, batch):
                hi = min(lo + batch, n_reads)
                total += _emit_batch(
                    rng, w, ref_id, starts[lo:hi], np.arange(lo, hi), h1, h2,
                    read_len, p_sub, indel_frac, max_indel, tag_rate)
        w.close()
    return total


def _emit_batch(rng, w, ref_id, starts, rids, h1, h2, L, p_sub, indel_frac,
                max_indel, tag_rate) -> int:
    B = len(starts)
    if B == 0:
        return 0
    hap = rng.integers(1, 3, size=B)
    span = L + max_indel
    gather = starts[:, None] + np.arange(span)[None, :]
    frags = np.where((hap == 1)[:, None], h1[gather], h2[gather])

    # substitution errors: E total positions, duplicates harmless
    n_err = rng.binomial(L, p_sub, size=B)
    E = int(n_err.sum())
    err_rows = np.repeat(np.arange(B), n_err)
    err_cols = rng.integers(0, L, size=E)
    frags[err_rows, err_cols] = BASES[rng.integers(0, 4, size=E)]

    # one indel event for a fraction of reads: a M / k I|D / b M
    form = np.zeros(B, np.int8)                  # 0 none, 1 ins, 2 del
    ind = rng.random(B) < indel_frac
    form[ind] = rng.integers(1, 3, size=int(ind.sum()))
    k = np.where(form > 0, rng.integers(1, max_indel + 1, size=B), 0)
    a = np.where(form > 0,
                 rng.integers(1, max(L - max_indel - 1, 2), size=B), 0)

    seqs = frags[:, :L].copy()
    # insertion: random bases at [a, a+k), tail shifts right (truncated)
    ins_rows = np.flatnonzero(form == 1)
    for r in ins_rows:                            # few%, short shifts
        ai, ki = int(a[r]), int(k[r])
        seqs[r, ai + ki:] = frags[r, ai: L - ki]
        seqs[r, ai: ai + ki] = BASES[rng.integers(0, 4, size=ki)]
    del_rows = np.flatnonzero(form == 2)
    for r in del_rows:
        ai, ki = int(a[r]), int(k[r])
        seqs[r, ai:] = frags[r, ai + ki: ai + ki + (L - ai)]

    nib = SEQ16_NIBBLE[seqs]
    seq4 = ((nib[:, 0::2] << 4) | nib[:, 1::2])
    quals = rng.integers(10, 40, size=(B, L), dtype=np.uint8)
    mapq = rng.integers(20, 61, size=B, dtype=np.uint8)
    flag = np.where(rng.random(B) < 0.5, 16, 0).astype(np.uint16)
    hp = np.where(rng.random(B) < tag_rate, hap, 0).astype(np.int32)

    names = np.frombuffer(
        "".join(f"r{int(i):08d}\x00" for i in rids).encode(),
        np.uint8).reshape(B, 10)

    # per-read record size: 32 hdr + 10 name + 4*nops + L/2 + L [+ 7 HP]
    nops = np.where(form > 0, 3, 1)
    base_sz = 32 + 10 + L // 2 + L
    rec_sz = base_sz + 4 * nops + np.where(hp > 0, 7, 0)
    tot_sz = rec_sz + 4                           # + block_size prefix
    off = np.zeros(B + 1, np.int64)
    np.cumsum(tot_sz, out=off[1:])
    blob = np.zeros(off[-1], np.uint8)

    for f_form in (0, 1, 2):
        for f_hp in (0, 1):
            sel = np.flatnonzero((form == f_form)
                                 & ((hp > 0) == bool(f_hp)))
            if not len(sel):
                continue
            n_op = 3 if f_form else 1
            sz = base_sz + 4 * n_op + (7 if f_hp else 0)
            m = np.zeros((len(sel), sz + 4), np.uint8)
            _put(m, 0, sz, "<i4")                      # block_size
            _put(m, 4, ref_id, "<i4")
            _put(m, 8, starts[sel], "<i4")             # pos (0-based)
            m[:, 12] = 10                              # l_read_name
            m[:, 13] = mapq[sel]
            _put(m, 14, 4680, "<u2")                   # bin
            _put(m, 16, n_op, "<u2")
            _put(m, 18, flag[sel], "<u2")
            _put(m, 20, L, "<i4")                      # l_seq
            _put(m, 24, -1, "<i4")                     # next_ref
            _put(m, 28, -1, "<i4")                     # next_pos
            _put(m, 32, 0, "<i4")                      # tlen
            m[:, 36:46] = names[sel]
            co = 46
            if f_form == 0:
                _put(m, co, (L << 4) | 0, "<u4")
                co += 4
            else:
                opc = 1 if f_form == 1 else 2          # I / D
                la = a[sel].astype(np.int64)
                lk = k[sel].astype(np.int64)
                lb = (L - la - (lk if f_form == 1 else 0))
                _put(m, co, (la << 4) | 0, "<u4")
                _put(m, co + 4, (lk << 4) | opc, "<u4")
                _put(m, co + 8, (lb << 4) | 0, "<u4")
                co += 12
            m[:, co: co + L // 2] = seq4[sel]
            co += L // 2
            m[:, co: co + L] = quals[sel]
            co += L
            if f_hp:
                m[:, co] = ord("H")
                m[:, co + 1] = ord("P")
                m[:, co + 2] = ord("i")
                _put(m, co + 3, hp[sel], "<i4")
            target = off[sel][:, None] + np.arange(sz + 4)[None, :]
            blob[target.ravel()] = m.ravel()

    w.write(blob.tobytes())
    return B


def write_truth_vcf(path: str, rows_by_contig) -> None:
    with open(path, "w") as f:
        f.write("##fileformat=VCFv4.2\n"
                "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\n")
        for ctg, rows in rows_by_contig.items():
            for pos1, ref, alt, gt in rows:
                f.write(f"{ctg}\t{pos1}\t.\t{ref}\t{alt}\t50\tPASS\t.\t"
                        f"GT\t{gt}\n")


def make_world(out_dir: str, sizes: Dict[str, int], coverage: int = 30,
               read_len: int = 3000, seed: int = 7, tag_rate: float = 0.0,
               p_sub: float = 0.05) -> Dict[str, str]:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    genome = make_genome(rng, sizes)
    haplos = {}
    truth = {}
    for name, seq in genome.items():
        h1, h2, rows = make_truth(rng, seq)
        haplos[name] = (h1, h2)
        truth[name] = rows
    fasta = os.path.join(out_dir, "ref.fa")
    bam = os.path.join(out_dir, "reads.bam")
    vcf = os.path.join(out_dir, "truth.vcf")
    write_fasta_fast(fasta, genome)
    n = write_reads_bam(rng, bam, genome, haplos, coverage=coverage,
                        read_len=read_len, tag_rate=tag_rate, p_sub=p_sub)
    write_truth_vcf(vcf, truth)
    return {"fasta": fasta, "bam": bam, "truth": vcf, "n_reads": str(n)}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--sizes-mbp", type=float, nargs="+", default=[100.0])
    ap.add_argument("--coverage", type=int, default=30)
    ap.add_argument("--read-len", type=int, default=3000)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--tag-rate", type=float, default=0.0)
    ap.add_argument("--p-sub", type=float, default=0.05)
    args = ap.parse_args(argv)
    sizes = {f"chr{i + 1}": int(m * 1e6)
             for i, m in enumerate(args.sizes_mbp)}
    import time
    t0 = time.time()
    res = make_world(args.out, sizes, coverage=args.coverage,
                     read_len=args.read_len, seed=args.seed,
                     tag_rate=args.tag_rate, p_sub=args.p_sub)
    print(f"world: {res} in {time.time() - t0:.1f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
