"""Concrete pipeline stages (the reference's s1..s6 re-architected).

Data flow (mirrors SURVEY.md §1 stage table):
  s1 pileup features     mpileup(+ref) -> pileup shards (.npz per contig)
  s2 pileup predict      shards -> pileup.vcf            [TPU]
  s3 phasing             pileup.vcf + BAM -> haplotagged BAMs (external
                         whatshap/samtools, subprocess-wrapped)
  s4 haplotype features  pileup.vcf + tagged BAMs -> haplotype shards
  s5 haplotype predict   shards -> haplotype.csv         [TPU]
  s6 merge               pileup.vcf + haplotype.csv -> merge.vcf
"""
from __future__ import annotations

import logging
import os
import threading
import time
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

from .. import constants as C
from ..config import PipelineConfig
from ..decode.merge import merge_calls
from ..decode.pileup_vcf import decode_pileup_calls_fast, write_vcf_header
from ..features.haplotype import (
    build_groups,
    chunk_groups,
    collect_sites,
    haplotype_features,
    ref_position_codes,
    ref_window_codes,
)
from ..features.pileup import (CandidateBatch, assemble_windows,
                               predict_batch, predict_inputs)
from ..io import bins
from ..io.fasta import FastaReference


def split_mpileup_by_contig(mpileup_path: str, out_dir: str,
                            contigs: Optional[Sequence[str]] = None) -> List[str]:
    """Split one mpileup stream into per-contig files (the reference's
    DNA_ExtractChrPileupData, extract_chr_pileup_data/main.cpp:21-80).
    Single pass; contig filter optional."""
    os.makedirs(out_dir, exist_ok=True)
    want = set(contigs) if contigs else None
    written: List[str] = []
    cur_name = None
    cur_f = None
    with open(mpileup_path, "rb", buffering=1 << 20) as f:
        for line in f:
            tab = line.find(b"\t")
            name = line[:tab].decode()
            if name != cur_name:
                if cur_f:
                    cur_f.close()
                cur_name = name
                if want is not None and name not in want:
                    cur_f = None
                else:
                    path = os.path.join(out_dir, f"{name}.mpileup")
                    cur_f = open(path, "wb", buffering=1 << 20)
                    written.append(name)
            if cur_f:
                cur_f.write(line)
    if cur_f:
        cur_f.close()
    return written


def _carry_suffix(lines: List[bytes], overlap_rows: int) -> List[bytes]:
    """Trailing lines containing at least `overlap_rows` PARSEABLE rows
    (>= 6 tab fields, integer position — the native parser's keep
    criteria). Counting raw lines would under-carry when malformed lines
    sit near the boundary, truncating a deferred candidate's left flank;
    junk lines inside the suffix are harmless (the parser drops them)."""
    n_ok = 0
    for i in range(len(lines) - 1, -1, -1):
        fields = lines[i].split(b"\t", 2)
        if len(fields) >= 3 and fields[1].isdigit() \
                and lines[i].count(b"\t") >= 5:
            n_ok += 1
            if n_ok >= overlap_rows:
                return lines[i:]
    return list(lines)


def _iter_mpileup_units(path: str, overlap_rows: int,
                        chunk_bytes: int = 32 << 20):
    """Stream a per-contig mpileup file as (unit_lines, n_carry, is_final)
    triples, where each unit = the previous unit's trailing lines covering
    `overlap_rows` parseable rows + one chunk of new complete lines. The
    overlap re-creates the reference's O(window) ring buffer
    (make_candidate_snp_tensor/main.cpp:126-217): every candidate sees its
    full +-flank row context in exactly one unit."""
    carry: List[bytes] = []
    tail = b""
    pending: Optional[List[bytes]] = None
    with open(path, "rb") as f:
        while True:
            block = f.read(chunk_bytes)
            if not block:
                break
            data = tail + block
            nl = data.rfind(b"\n")
            if nl < 0:
                tail = data
                continue
            tail = data[nl + 1:]
            lines = data[: nl + 1].splitlines(keepends=True)
            if pending is not None:
                yield pending, len(carry), False
                carry = _carry_suffix(pending, overlap_rows)
            pending = carry + lines
    if tail:
        last = [tail if tail.endswith(b"\n") else tail + b"\n"]
        pending = (pending or carry) + last if pending is not None \
            else carry + last
    if pending is not None:
        yield pending, len(carry), True


def stage_pileup_features(
    cfg: PipelineConfig,
    ref: FastaReference,
    chr_mpileup_dir: str,
    out_dir: str,
    contigs: Optional[Sequence[str]] = None,
    chunk_bytes: int = 32 << 20,
) -> Dict:
    """s1: per-contig mpileup -> candidate windows -> pileup shards.

    The text is processed in streaming units (O(chunk) memory, not
    O(contig): chr1 at 30x is tens of GB of mpileup text). A candidate is
    emitted by the first unit that contains its full right flank; the
    position bound dedupes across the unit overlap."""
    from ..io.native import parse_mpileup_native

    os.makedirs(out_dir, exist_ok=True)
    contigs = list(contigs) if contigs else sorted(
        (f[:-len(".mpileup")] for f in os.listdir(chr_mpileup_dir)
         if f.endswith(".mpileup")), key=C.contig_sort_key)
    total_rows = 0
    total_cand = 0
    t0 = time.monotonic()
    fc = cfg.pileup_feature
    flank = fc.flanking_bases
    overlap = 2 * flank + 1
    for ctg in contigs:
        path = os.path.join(chr_mpileup_dir, f"{ctg}.mpileup")
        if not os.path.exists(path):
            continue
        seq = ref.contig(ctg)
        flusher = _ShardFlusher(ctg, out_dir, flank)
        prev_bound = 0
        for unit_lines, n_carry, final in _iter_mpileup_units(
                path, overlap, chunk_bytes):
            text = b"".join(unit_lines)
            pile = parse_mpileup_native(
                text, ctg, seq,
                snp_min_af=fc.snp_min_af, indel_min_af=fc.indel_min_af,
                min_coverage=fc.min_depth, max_indel=fc.max_indel_size,
                n_threads=cfg.threads or 0)
            total_rows += len(unit_lines) - n_carry
            if final:
                bound = None
            else:
                # rows in the last `flank` lines lack their right flank in
                # this unit; they re-appear in the next unit's carry
                bound = int(pile.positions[-(flank + 1)]) \
                    if len(pile.positions) > flank else prev_bound
            sub = assemble_windows(pile, seq, flank,
                                   emit_lo=prev_bound, emit_hi=bound)
            if bound is not None:
                prev_bound = max(prev_bound, bound)
            if len(sub) == 0:
                continue
            fsub = predict_batch(sub)
            if len(fsub) == 0:
                continue
            flusher.add(fsub)
        total_cand += flusher.finish()
    dt = time.monotonic() - t0
    return {"rows": total_rows, "candidates": total_cand,
            "rows_per_s": round(total_rows / dt, 1) if dt else 0}


def _slice_candidates(b: CandidateBatch, lo: int, hi: int) -> CandidateBatch:
    """Candidate-row slice sharing the full column store (unreferenced
    columns are harmless — see predict_batch)."""
    return CandidateBatch(b.chrom, b.positions[lo:hi],
                          ref_seqs=b.ref_seqs[lo:hi],
                          alt_info=b.alt_info[lo:hi], depths=b.depths[lo:hi],
                          columns=b.columns, cand_off=b.cand_off[lo:hi],
                          flank=b.flank)


class _ShardFlusher:
    """Bounded columnar accumulation for one contig's s1 output (r5).

    The whole-contig shard held every candidate column in RAM at once —
    the 250 Mbp soak's 24 GB peak was that materialization plus its npz
    write plus s2's reload. Parts are written every
    NSP_S1_FLUSH_CANDIDATES candidates (default 500k). Every non-final
    part is a multiple of 1000 candidates: the bug-compat decode's
    fallback-alt quirk depends on its 1000-row batch composition
    (reference predict.py batches each contig file from row 0), so
    aligned parts keep every batch window identical to whole-contig
    numbering and the VCF byte-exact. Caps below 1000 (tests) use the
    cap itself as the quantum — alignment, and therefore bug-compat
    byte-parity, then needs bug_compat=False.
    """

    def __init__(self, ctg: str, out_dir: str, flank: int):
        self.ctg, self.out_dir, self.flank = ctg, out_dir, flank
        self.cap = int(os.environ.get("NSP_S1_FLUSH_CANDIDATES", "500000"))
        self.quantum = 1000 if self.cap >= 1000 else max(self.cap, 1)
        self.chunks: List[CandidateBatch] = []
        self.pending = 0
        self.part = 0
        self.total = 0
        # stale parts from a previous run (possibly with a different
        # flush cap) must not survive a rerun
        for f in os.listdir(out_dir):
            if f == f"{ctg}.npz" or (f.startswith(f"{ctg}.part")
                                     and f.endswith(".npz")):
                os.unlink(os.path.join(out_dir, f))

    def add(self, batch: CandidateBatch) -> None:
        self.chunks.append(batch)
        self.pending += len(batch)
        if self.pending >= self.cap:
            self._flush(final=False)

    def finish(self) -> int:
        self._flush(final=True)
        return self.total

    def _flush(self, final: bool) -> None:
        n = self.pending if final else (self.pending
                                        - self.pending % self.quantum)
        if not final and n == 0:
            return
        take: List[CandidateBatch] = []
        rest: List[CandidateBatch] = []
        got = 0
        for b in self.chunks:
            if got >= n:
                rest.append(b)
            elif got + len(b) <= n:
                take.append(b)
                got += len(b)
            else:
                k = n - got
                take.append(_slice_candidates(b, 0, k))
                rest.append(_slice_candidates(b, k, len(b)))
                got = n
        shard = _columnar_shard(self.ctg, take, self.flank)
        if final and self.part == 0:
            name = f"{self.ctg}.npz"
        elif len(shard) or not final:
            name = f"{self.ctg}.part{self.part:04d}.npz"
        else:                       # empty tail after earlier parts
            self.chunks = rest
            self.pending -= n
            return
        bins.save_pileup_shard(os.path.join(self.out_dir, name), shard)
        self.total += len(shard)
        self.chunks = rest
        self.pending -= n
        self.part += 1


def _columnar_shard(ctg: str, chunks: List[CandidateBatch],
                    flank: int) -> bins.PileupShard:
    """Concatenate per-chunk columnar batches into one shard (each chunk's
    cand_off shifts by the columns accumulated before it)."""
    cols_l, offs_l, poss_l, refs_l, alts = [], [], [], [], []
    n_cols = 0
    for b in chunks:
        cols_l.append(b.columns)
        offs_l.append(b.cand_off + n_cols)
        n_cols += len(b.columns)
        poss_l.append(b.positions)
        refs_l.append(b.ref_seqs)
        alts.extend(b.alt_info)
    w = 2 * flank + 1
    return bins.PileupShard(
        contig=ctg,
        positions=(np.concatenate(poss_l) if poss_l
                   else np.zeros(0, np.int64)),
        ref_seqs=(np.concatenate(refs_l).astype(f"S{w}", copy=False)
                  if refs_l else np.zeros(0, dtype=f"S{w}")),
        alt_info=(np.asarray([a.encode() for a in alts], dtype="S")
                  if alts else np.zeros(0, dtype="S")),
        columns=(np.concatenate(cols_l) if cols_l
                 else np.zeros((0, 18), np.int16)),
        cand_off=(np.concatenate(offs_l) if offs_l
                  else np.zeros(0, np.int64)),
        flank=flank,
    )


def stage_pileup_features_from_bam(
    cfg: PipelineConfig,
    ref: FastaReference,
    bam_path: str,
    out_dir: str,
    contigs: Optional[Sequence[str]] = None,
    chunk_size: int = 2_000_000,
) -> Dict:
    """s1 without samtools: direct BAM -> candidate windows -> shards.

    Replaces the reference's mpileup-text round trip (make_predict_data.sh
    steps 1-3) with chunked native pileup; chunks overlap by the window
    flank so candidates near boundaries get full windows, and each
    candidate is emitted by exactly one chunk (center within the chunk)."""
    from ..io.bam import BamFile

    os.makedirs(out_dir, exist_ok=True)
    fc = cfg.pileup_feature
    flank = fc.flanking_bases
    total_rows = 0
    total_cand = 0
    t0 = time.monotonic()
    with BamFile(bam_path) as bam:
        bam_refs = dict(bam.references())
        want = list(contigs) if contigs else sorted(
            (n for n in bam_refs if n in ref.by_name), key=C.contig_sort_key)
        from concurrent.futures import ThreadPoolExecutor

        n_workers = max(cfg.threads or (os.cpu_count() or 4), 1)
        for ctg in want:
            if ctg not in bam_refs or ctg not in ref.by_name:
                continue
            seq = ref.contig(ctg)
            length = len(seq)
            piles_rows = 0
            # O(chunk-group) output (r5): part shards via _ShardFlusher
            # (parts sort after each other, so s2's filename-ordered
            # decode keeps ascending positions)
            flusher = _ShardFlusher(ctg, out_dir, flank)

            def one_chunk(s):
                e = min(s + chunk_size, length)
                # the native region call releases the GIL; the open handle
                # is read-only after indexing, so chunks run in parallel
                pile = bam.pileup_region(
                    ctg, max(s - flank, 0), min(e + flank, length), seq,
                    snp_min_af=fc.snp_min_af, indel_min_af=fc.indel_min_af,
                    min_coverage=fc.min_depth, max_indel=fc.max_indel_size,
                    min_mq=fc.mpileup_min_mq,
                    excl_flags=fc.mpileup_excl_flags,
                    max_depth=fc.mpileup_max_depth,
                    depth_mode=fc.depth_mode)
                rows = int(((pile.positions > s) & (pile.positions <= e)).sum())
                batch = assemble_windows(pile, seq, flank,
                                         emit_lo=s, emit_hi=e)
                if len(batch) == 0:
                    return rows, None
                fsub = predict_batch(batch)
                return rows, (fsub if len(fsub) else None)

            starts = list(range(0, length, chunk_size))
            with ThreadPoolExecutor(max_workers=n_workers) as ex:
                for rows, payload in ex.map(one_chunk, starts):
                    piles_rows += rows
                    if payload is not None:
                        flusher.add(payload)
            total_cand += flusher.finish()
            total_rows += piles_rows
    dt = time.monotonic() - t0
    return {"rows": total_rows, "candidates": total_cand,
            "rows_per_s": round(total_rows / dt, 1) if dt else 0}


def stage_pileup_predict(
    cfg: PipelineConfig,
    ref: FastaReference,
    shard_dir: str,
    output_vcf: str,
    params=None,
    model_path: Optional[str] = None,
) -> Dict:
    """s2: pileup shards -> VCF via the batched TPU predictor."""
    import jax
    import jax.numpy as jnp

    from ..models.convert import load_pileup_checkpoint

    if params is None:
        params = jax.tree.map(jnp.asarray, load_pileup_checkpoint(model_path))
    mcfg = cfg.pileup_model
    predictor = pileup_model_predictor(cfg, params)

    n_sites = 0
    t0 = time.monotonic()
    paths = bins.list_shards(shard_dir)

    # two-level pipeline: one worker keeps the device busy shard-ahead;
    # decode (the host-side cap, ~380k sites/s/thread) fans over a thread
    # pool into per-shard buffers (numpy string kernels release the GIL);
    # the main thread writes buffers in shard order
    import io
    from concurrent.futures import ThreadPoolExecutor

    def infer(path):
        shard = bins.load_pileup_shard(path)
        if len(shard) == 0:
            return None
        if shard.columns is not None:
            # v2 columnar shard: ship the column union once per unit and
            # gather each candidate's 33-wide window ON DEVICE — ~3x less
            # host->device traffic than shipping dense windows (adjacent
            # candidates share columns)
            gt, zy = run_pileup_columnar(cfg, params, shard)
        else:
            # ship the compact int16 counts (values fit +-576; legacy int32
            # shards are narrowed); the jitted program casts to f32 on
            # device -> 2x less host->device traffic than shipping f32
            gt, zy = predictor.run(shard.matrix.astype(np.int16, copy=False))
        return shard, gt, zy

    DECODE_SPLIT = 100_000   # rows per decode task (contig shards are big)

    def decode(res, lo, hi):
        shard, gt, zy = res
        buf = io.StringIO()
        ref_bases = [r.decode()[16] for r in shard.ref_seqs[lo:hi]]
        decode_pileup_calls_fast(
            shard.contig, shard.positions[lo:hi], ref_bases,
            gt[lo:hi], zy[lo:hi],
            shard.center_counts[lo:hi], buf,
            batch_size=1000, bug_compat=cfg.inference.bug_compat)
        return hi - lo, buf.getvalue()

    n_dec = max(min((cfg.threads or (os.cpu_count() or 4)) - 1, 4), 1)
    with open(output_vcf, "w") as out, \
            ThreadPoolExecutor(max_workers=1) as ex_dev, \
            ThreadPoolExecutor(max_workers=n_dec) as ex_dec:
        write_vcf_header(ref.fasta_path + ".fai", out)
        infer_q: List = []
        decode_q: List = []
        idx = 0
        while decode_q or infer_q or idx < len(paths):
            while idx < len(paths) and len(infer_q) < 2:
                infer_q.append(ex_dev.submit(infer, paths[idx]))
                idx += 1
            while infer_q and (infer_q[0].done() or len(decode_q) == 0) \
                    and len(decode_q) < 2 * n_dec + 2:
                res = infer_q.pop(0).result()
                if res is None:
                    continue
                n_rows = len(res[0])
                for lo in range(0, n_rows, DECODE_SPLIT):
                    decode_q.append(ex_dec.submit(
                        decode, res, lo, min(lo + DECODE_SPLIT, n_rows)))
            if not decode_q:
                continue
            n, text = decode_q.pop(0).result()
            out.write(text)
            n_sites += n
    dt = time.monotonic() - t0
    return {"sites": n_sites, "sites_per_s": round(n_sites / dt, 1) if dt else 0}


def _resolve_use_pallas(cfg: PipelineConfig) -> bool:
    v = cfg.inference.use_pallas
    if v == "auto":
        from ..ops.pallas_lstm import pallas_supported

        return pallas_supported()
    return bool(v)


# Signature: (contig, sub_groups [G,11] positions, pileup window flank)
# -> dict with read matrices, or None to skip the chunk.
ReadMatrixExtractor = Callable[[str, np.ndarray, int], Optional[Dict[str, np.ndarray]]]


def stage_haplotype_features(
    cfg: PipelineConfig,
    ref: FastaReference,
    pileup_vcf: str,
    extractor: ReadMatrixExtractor,
    out_dir: str,
) -> Dict:
    """s4: group selection + read-matrix extraction -> haplotype shards.

    The extractor abstracts BAM access (native htslib-free reader, or any
    source of read matrices). Padding/truncation semantics follow
    write_to_bins.py:15-42: pad depth with -2 to the chunk max, truncate to
    the configured caps keeping the first rows after HP-sort.
    """
    from concurrent.futures import ThreadPoolExecutor

    os.makedirs(out_dir, exist_ok=True)
    # clear leftovers from a crashed/partial previous run: shard part
    # counts depend on the flush cap, so stale higher-numbered part files
    # would otherwise survive a rerun and feed s5 duplicate groups
    for old in os.listdir(out_dir):
        if old.endswith(".npz"):
            os.unlink(os.path.join(out_dir, old))
    hf = cfg.haplotype_feature
    with open(pileup_vcf) as f:
        sites = collect_sites(f, hf.low_quality_threshold)
    n_groups = 0
    # one background writer: the per-contig concat+compress+save (~10 s
    # per 20 Mbp contig) overlaps the NEXT contig's extraction
    writer = ThreadPoolExecutor(max_workers=1)
    write_futures = []

    def write_contig(ctg, pools, part):
        n = 0
        for (dpb, dhb), shards in pools.items():
            merged = _concat_haplotype_shards(ctg, shards, dpb, dhb)
            suffix = "" if part == 0 else f"_p{part}"
            bins.save_haplotype_shard(
                os.path.join(out_dir, f"{ctg}_d{dpb}x{dhb}{suffix}.npz"),
                merged)
            n += 1
        return n

    # Cap the groups accumulated in RAM before a flush: the 250 Mbp soak
    # (1.17M groups on one contig) peaked at ~41 GB RSS because a whole
    # contig's chunk shards sat in the pools until the single per-contig
    # write. Mid-contig flushes bound s4's working set AND s5's per-file
    # load; s5 batches within each file, so 256k-group files keep its
    # batches full.
    flush_groups = int(os.environ.get("NSP_S4_FLUSH_GROUPS", 262144))

    for ctg in sorted(sites, key=C.contig_sort_key):
        groups = build_groups(sites[ctg], hf.adjacent_size,
                              hf.low_quality_threshold, hf.hete_support_quality)
        if len(groups) == 0:
            continue
        # consolidate extraction chunks into one shard per (contig,
        # depth-bucket pair): depths pad up to the bucket so chunks with
        # similar depth concatenate, giving s5 large batches instead of
        # one <=100-site file per chunk (reference predict_dev.py:33
        # batches 1000 across a whole bin file; we batch 8k+ across the
        # contig). Chunks extract in parallel (the reference fans a
        # multiprocessing.Pool, make_predict_bins.py:157-164; here threads
        # suffice — the native region fetch and numpy slicing release the
        # GIL); pools keep chunk order via the ordered map().
        from concurrent.futures import ThreadPoolExecutor

        pools: Dict[tuple, List[bins.HaplotypeShard]] = {}
        chunks = chunk_groups(groups)
        n_workers = max(min(cfg.threads or (os.cpu_count() or 4),
                            len(chunks)), 1)

        def extract_one(chunk):
            try:
                mats = extractor(ctg, chunk, hf.pileup_flanking_size,
                                 packed=True)
            except TypeError:   # custom extractor without the packed path
                mats = extractor(ctg, chunk, hf.pileup_flanking_size)
            if mats is None:
                return None
            # the extractor may drop coverage-failed groups; align the
            # position columns with the groups it actually kept
            return _pack_haplotype_shard(ctg, mats.get("groups", chunk),
                                         mats, hf)

        part = 0
        pool_groups = 0
        with ThreadPoolExecutor(max_workers=n_workers) as ex:
            for shard in ex.map(extract_one, chunks):
                if shard is None:
                    continue
                key = (_bucket(shard.pileup["sequences"].shape[1]),
                       _bucket(shard.haplotype["sequences"].shape[1]))
                if key not in pools:
                    _maybe_prewarm_featurizer(cfg, key)
                pools.setdefault(key, []).append(shard)
                n_groups += len(shard)
                pool_groups += len(shard)
                if pool_groups >= flush_groups:
                    # backpressure: each queued flush pins a full pool in
                    # RAM, so an unbounded writer backlog would defeat the
                    # cap — block extraction once >2 flushes are pending
                    while sum(not f.done() for f in write_futures) > 2:
                        write_futures[-2].result()
                    write_futures.append(
                        writer.submit(write_contig, ctg, pools, part))
                    pools = {}
                    pool_groups = 0
                    part += 1
        if pools:
            write_futures.append(writer.submit(write_contig, ctg, pools,
                                               part))
            pools = {}
    n_shards = sum(f.result() for f in write_futures)
    writer.shutdown()
    return {"groups": n_groups, "shards": n_shards}


def _concat_haplotype_shards(ctg: str, shards: List[bins.HaplotypeShard],
                             dp_bucket: int, dh_bucket: int) -> bins.HaplotypeShard:
    """Concatenate chunk shards, padding each view's depth (axis 1) up to
    the shared bucket with the -2 pad value."""
    def cat(view: str, bucket: int) -> Dict[str, np.ndarray]:
        out = {}
        for k in bins._KEYS:
            parts = []
            for s in shards:
                a = getattr(s, view)[k]
                if a.shape[1] < bucket:
                    a = np.pad(a, ((0, 0), (0, bucket - a.shape[1]), (0, 0)),
                               constant_values=C.PAD_VALUE)
                parts.append(a)
            out[k] = np.concatenate(parts)
        return out

    return bins.HaplotypeShard(
        contig=ctg,
        candidate_positions=np.concatenate(
            [s.candidate_positions for s in shards]),
        group_positions=np.concatenate([s.group_positions for s in shards]),
        pileup=cat("pileup", dp_bucket),
        haplotype=cat("haplotype", dh_bucket),
    )


def _pack_haplotype_shard(ctg, groups, mats, hf) -> Optional[bins.HaplotypeShard]:
    """Pad per-site ragged read matrices to the chunk max depth with -2 and
    apply depth caps (first rows kept, as the reference truncates after
    HP-sorting)."""
    if "packed" in mats:
        # extractor already produced depth-padded [G, D, L] arrays; only
        # the per-view depth caps remain
        if len(groups) == 0:
            return None
        pk = mats["packed"]

        def capped(view, cap):
            arrs = pk[view]
            d = arrs["sequences"].shape[1]
            dc = max(min(d, cap) if cap is not None else d, 1)
            return {k: np.ascontiguousarray(a[:, :dc])
                    for k, a in arrs.items()}

        return bins.HaplotypeShard(
            contig=ctg,
            candidate_positions=groups[:, groups.shape[1] // 2].astype(
                np.int64),
            group_positions=groups.astype(np.int64),
            pileup=capped("pileup", hf.max_pileup_depth),
            haplotype=capped("haplotype", hf.max_haplotype_depth),
        )

    def pack(key_prefix, cap):
        arrs = mats[key_prefix]  # list of dicts of [d_i, L] arrays
        if not arrs:
            return None
        maxd = max(a["sequences"].shape[0] for a in arrs)
        if cap is not None:
            maxd = min(maxd, cap) if maxd > 0 else maxd
        packed = {}
        for k in bins._KEYS:
            # pack straight into the compact storage dtype (int8/int16,
            # bins._KEY_DTYPE): downstream concat/save/ship then never
            # touch int32-wide copies
            out = np.full((len(arrs), max(maxd, 1), arrs[0][k].shape[1]),
                          C.PAD_VALUE, dtype=bins._KEY_DTYPE[k])
            for i, a in enumerate(arrs):
                d = min(a[k].shape[0], maxd)
                out[i, :d] = a[k][:d]
            packed[k] = out
        return packed

    pileup = pack("pileup", hf.max_pileup_depth)
    haplotype = pack("haplotype", hf.max_haplotype_depth)
    if pileup is None or haplotype is None:
        return None
    return bins.HaplotypeShard(
        contig=ctg,
        candidate_positions=groups[:, groups.shape[1] // 2].astype(np.int64),
        group_positions=groups.astype(np.int64),
        pileup=pileup,
        haplotype=haplotype,
    )


_HAP_PREDICTORS: Dict[tuple, object] = {}
_HAP_PREDICTOR_LOCK = threading.Lock()


def pileup_model_predictor(cfg: PipelineConfig, params):
    """Process-cached BatchedPredictor for the s2 pileup model program
    (fixed shapes [batch, 33, 18]); see `haplotype_model_predictor` for
    the rationale. `prewarm_pileup_model` overlaps its compile with s1."""
    import jax.numpy as jnp

    from ..models.pileup_model import pileup_predict
    from ..parallel.inference import BatchedPredictor

    mcfg = cfg.pileup_model
    compute_dtype = jnp.bfloat16 if cfg.inference.use_bf16 else jnp.float32
    use_pallas = _resolve_use_pallas(cfg)
    key = ("pileup", cfg.inference.batch_size, repr(mcfg),
           cfg.inference.use_bf16, use_pallas)
    with _HAP_PREDICTOR_LOCK:
        pred = _HAP_PREDICTORS.get(key)
        if pred is None:
            def model_fn(p, x):
                return pileup_predict(p, x.astype(jnp.float32), mcfg,
                                      compute_dtype=compute_dtype,
                                      use_pallas=use_pallas)

            pred = BatchedPredictor(model_fn, params,
                                    batch_size=cfg.inference.batch_size)
            _HAP_PREDICTORS[key] = pred
        else:
            pred.update_params(params)
    return pred


# column-unit buckets for the v2 shard device feed: the column buffer is a
# static-shape jit operand, so unit lengths round up to a bucket (one
# compile per bucket used; tiny worlds touch only the small ones)
_COL_BUCKETS = tuple(1 << k for k in range(16, 23))   # 64k .. 4M columns
_COL_BUCKETS_COMPILED: set = set()   # buckets already built this process


def _col_bucket(m: int) -> int:
    for b in _COL_BUCKETS:
        if m <= b:
            return b
    return _COL_BUCKETS[-1]


def pileup_columnar_fn(cfg: PipelineConfig):
    """Process-cached jit program (params, columns [U,18] int16,
    idx [bs] int32) -> (gt, zy): gathers each candidate's window from the
    column union ON DEVICE, then runs the pileup model. One executable per
    (U bucket, batch) shape pair via the jit cache."""
    import jax
    import jax.numpy as jnp

    from ..models.pileup_model import pileup_predict

    mcfg = cfg.pileup_model
    compute_dtype = jnp.bfloat16 if cfg.inference.use_bf16 else jnp.float32
    use_pallas = _resolve_use_pallas(cfg)
    flank = (mcfg.seq_len - 1) // 2
    key = ("pileup-col", repr(mcfg), cfg.inference.use_bf16, use_pallas)
    with _HAP_PREDICTOR_LOCK:
        fn = _HAP_PREDICTORS.get(key)
        if fn is None:
            def model_fn(p, cols, idx):
                w = cols[idx[:, None]
                         + jnp.arange(-flank, flank + 1)[None, :]]
                return pileup_predict(p, w.astype(jnp.float32), mcfg,
                                      compute_dtype=compute_dtype,
                                      use_pallas=use_pallas)

            fn = jax.jit(model_fn)
            _HAP_PREDICTORS[key] = fn
    return fn


def run_pileup_columnar(cfg: PipelineConfig, params, shard) -> Tuple:
    """s2 device feed for v2 columnar shards.

    Ships the column union in bucketed units (one h2d per unit — ~3x fewer
    bytes than dense windows) and pipelines gather+model batches against
    the resident unit, fetching at most `max_in_flight` behind the
    dispatches."""
    import jax
    import jax.numpy as jnp

    fn = pileup_columnar_fn(cfg)
    bs = cfg.inference.batch_size
    flank = shard.flank
    cand_off = shard.cand_off
    n = len(cand_off)
    # (r4 measured negative: widening the batch 8x for chromosome-scale
    # shards to cut dispatch round-trips made the 100 Mbp s2 SLOWER here
    # — the extra batch shape costs a fresh ~2 min relay compile, more
    # than the ~60 s of RTTs it saves. On non-tunneled hardware both
    # effects are microseconds; keep the single prewarmed shape.)
    unit_cap = _COL_BUCKETS[-1]
    gts: List[np.ndarray] = []
    zys: List[np.ndarray] = []
    pending: List = []

    def drain_one():
        # one host fetch per UNIT, not per batch: the per-batch fetches
        # were ~40 device round-trips per contig; through a relay-tunneled
        # chip each completion costs seconds of RTT (measured on the
        # 100 Mbp world: s2 was RTT-bound at ~2.9 s/batch). The unit's
        # batches are concatenated on device and fetched in one transfer.
        m, res_gt, res_zy = pending.pop(0)
        gts.append(np.asarray(res_gt)[:m])
        zys.append(np.asarray(res_zy)[:m])

    i = 0
    while i < n:
        lo = int(cand_off[i]) - flank
        # largest j with cand_off[j-1] + flank < lo + unit_cap
        j = int(np.searchsorted(cand_off, lo + unit_cap - flank,
                                side="left"))
        j = max(j, i + 1)
        hi = int(cand_off[j - 1]) + flank + 1
        u = _col_bucket(hi - lo)
        # reuse an already-compiled larger bucket rather than compiling a
        # tail-sized program: padded zero bytes cost far less than a fresh
        # executable build through the relay compile service — but cap the
        # padding at 4x the real size so a run of tiny contigs doesn't ship
        # a 4M-column zero buffer per unit
        bigger = [b for b in _COL_BUCKETS_COMPILED if b >= u]
        if bigger and min(bigger) <= 4 * (hi - lo):
            u = min(bigger)
        _COL_BUCKETS_COMPILED.add(u)
        cols = shard.columns[lo:hi]
        if len(cols) < u:
            pad = np.zeros((u, cols.shape[1]), dtype=cols.dtype)
            pad[: len(cols)] = cols
            cols = pad
        cols_dev = jax.device_put(cols)
        idx_all = (cand_off[i:j] - lo).astype(np.int32)
        unit_gt: List = []
        unit_zy: List = []
        for s in range(0, j - i, bs):
            idx = idx_all[s: s + bs]
            m = len(idx)
            if m < bs:
                idx = np.concatenate(
                    [idx, np.full(bs - m, flank, np.int32)])
            gt_d, zy_d = fn(params, cols_dev, jnp.asarray(idx))
            unit_gt.append(gt_d)
            unit_zy.append(zy_d)
        # batches are full-sized except the unit's last (padded): valid
        # rows of the concatenation are exactly the first (j - i)
        pending.append((j - i,
                        unit_gt[0] if len(unit_gt) == 1
                        else jnp.concatenate(unit_gt),
                        unit_zy[0] if len(unit_zy) == 1
                        else jnp.concatenate(unit_zy)))
        while len(pending) > 1:
            drain_one()
        i = j
    while pending:
        drain_one()
    if not gts:
        return (np.zeros((0, cfg.pileup_model.gt_num_class), np.float32),
                np.zeros((0, cfg.pileup_model.zy_num_class), np.float32))
    return np.concatenate(gts), np.concatenate(zys)


def prewarm_pileup_model(cfg: PipelineConfig,
                         model_path: Optional[str]) -> threading.Thread:
    """Compile the s2 program on a daemon thread while s1 parses."""
    def _warm():
        try:
            import jax
            import jax.numpy as jnp

            from ..models.convert import load_pileup_checkpoint

            params = jax.tree.map(jnp.asarray,
                                  load_pileup_checkpoint(model_path))
            # compile the columnar program at the LARGEST bucket: with the
            # bucket-reuse rule every later unit (any size) pads up to it,
            # so the whole run needs exactly this one executable
            fn = pileup_columnar_fn(cfg)
            u = _COL_BUCKETS[-1]
            cols = np.zeros((u, C.NUM_CHANNELS), np.int16)
            idx = np.full(cfg.inference.batch_size, C.FLANKING_BASES,
                          np.int32)
            r = fn(params, jnp.asarray(cols), jnp.asarray(idx))
            jax.block_until_ready(r)
            _COL_BUCKETS_COMPILED.add(u)
        except Exception:  # pragma: no cover - best-effort warm
            logging.getLogger(__name__).warning(
                "pileup model prewarm failed", exc_info=True)

    t = threading.Thread(target=_warm, name="s2-prewarm", daemon=True)
    t.start()
    return _register_prewarm(t)


def haplotype_model_predictor(cfg: PipelineConfig, params):
    """Process-cached BatchedPredictor for the haplotype model program.

    The Pallas dual-BiLSTM is by far the most expensive compile in the
    pipeline (minutes cold on TPU) while its shapes are fixed by config —
    [batch, 33, 105] / [batch, 11, 105] — so one compiled program serves
    every depth bucket, contig, and stage invocation. `prewarm_haplotype_
    model` compiles it in the background while s1–s4 run."""
    import jax.numpy as jnp

    from ..models.haplotype_model import haplotype_predict
    from ..parallel.inference import BatchedPredictor

    hcfg = cfg.haplotype_model
    compute_dtype = jnp.bfloat16 if cfg.inference.use_bf16 else jnp.float32
    use_pallas = _resolve_use_pallas(cfg)
    key = (cfg.inference.batch_size, repr(hcfg),
           cfg.inference.use_bf16, use_pallas)
    with _HAP_PREDICTOR_LOCK:
        pred = _HAP_PREDICTORS.get(key)
        if pred is None:
            def model_fn(p, xp, xh):
                return haplotype_predict(p, xp, xh, hcfg,
                                         compute_dtype=compute_dtype,
                                         use_pallas=use_pallas)

            pred = BatchedPredictor(model_fn, params,
                                    batch_size=cfg.inference.batch_size)
            _HAP_PREDICTORS[key] = pred
        else:
            pred.update_params(params)
    return pred


def haplotype_featurizer(cfg: PipelineConfig, fs: int):
    """Process-cached featurize predictor (no params): [B,D,L] int8/int16
    read matrices -> [B,L,105] compute-dtype stats for both views. Cached
    so s4's bucket-discovery hook can compile it ahead of s5."""
    import jax.numpy as jnp

    from ..parallel.inference import BatchedPredictor

    compute_dtype = jnp.bfloat16 if cfg.inference.use_bf16 else jnp.float32
    key = ("featurize", fs, cfg.inference.use_bf16)
    with _HAP_PREDICTOR_LOCK:
        pred = _HAP_PREDICTORS.get(key)
        if pred is None:
            def featurize_fn(_p, seq_p, bq_p, mq_p, hap_p, ref_p,
                             seq_h, bq_h, mq_h, hap_h, ref_h):
                xp = haplotype_features(seq_p, bq_p, mq_p, hap_p, ref_p)
                xh = haplotype_features(seq_h, bq_h, mq_h, hap_h, ref_h)
                return xp.astype(compute_dtype), xh.astype(compute_dtype)

            pred = BatchedPredictor(featurize_fn, None, batch_size=fs)
            _HAP_PREDICTORS[key] = pred
    return pred


def _featurize_sub_batch(cfg: PipelineConfig, dp_b: int) -> int:
    """Featurize sub-batch size for a depth bucket: halve until activation
    memory is ~ the 128-depth reference point; halving keeps it dividing
    the model batch."""
    fs = cfg.inference.batch_size
    while fs * dp_b > cfg.inference.batch_size * 128 and fs > 512:
        fs //= 2
    return fs


def _device_concat():
    """Process-cached jitted device concatenate (jax.jit caches per input
    structure; one shared callable avoids a fresh jit per stage call)."""
    with _HAP_PREDICTOR_LOCK:
        fn = _HAP_PREDICTORS.get("concat")
        if fn is None:
            import jax
            import jax.numpy as jnp

            fn = jax.jit(lambda xs: jnp.concatenate(xs))
            _HAP_PREDICTORS["concat"] = fn
    return fn


_WARMED_FEATURIZERS: set = set()

# Every prewarm thread registers here; the driver joins them before
# returning. Daemon compile threads still running XLA work at interpreter
# shutdown abort the process (pybind11 "exception not rethrown" -> SIGABRT)
# — seen when a stage finishes with zero sites so nothing ever waited on
# the compiled program.
_PREWARM_THREADS: List[threading.Thread] = []


def _register_prewarm(t: threading.Thread) -> threading.Thread:
    _PREWARM_THREADS.append(t)
    return t


def join_prewarm_threads(timeout: Optional[float] = None) -> None:
    """Wait for outstanding prewarm compiles (driver calls this before
    exit). Compiles are not cancellable, so join rather than abandon."""
    while _PREWARM_THREADS:
        _PREWARM_THREADS.pop().join(timeout)


def _maybe_prewarm_featurizer(cfg: PipelineConfig, key: tuple) -> None:
    """s4 hook: compile the featurizer for a newly-seen bucket pair in the
    background (device backends only — on CPU the compile is cheap and a
    background thread just steals test cores)."""
    try:
        import jax

        if jax.default_backend() == "cpu" or key in _WARMED_FEATURIZERS:
            return
        _WARMED_FEATURIZERS.add(key)
        prewarm_haplotype_featurizer(cfg, key[0], key[1])
    except Exception:  # pragma: no cover
        pass


def prewarm_haplotype_featurizer(cfg: PipelineConfig, dp_b: int,
                                 dh_b: int) -> threading.Thread:
    """Compile the featurize program for one depth-bucket pair on a daemon
    thread. s4 fires this the first time it sees a bucket pair, so by the
    time s5 starts every featurizer it needs is compiled (each cold relay
    compile otherwise serializes in front of s5's first batch)."""
    def _warm():
        try:
            pred = haplotype_featurizer(cfg, _featurize_sub_batch(cfg, dp_b))
            fs = pred.batch_size
            l_p = 2 * cfg.haplotype_feature.pileup_flanking_size + 1
            l_h = 2 * cfg.haplotype_feature.adjacent_size + 1
            args = []
            for db, ll in ((dp_b, l_p), (dh_b, l_h)):
                for k in ("sequences", "baseq", "mapq", "hap"):
                    args.append(np.zeros((fs, db, ll), bins._KEY_DTYPE[k]))
                args.append(np.zeros((fs, ll), np.int8))
            pred.apply(*args)
        except Exception:  # pragma: no cover - best-effort warm
            logging.getLogger(__name__).warning(
                "featurizer prewarm failed", exc_info=True)

    t = threading.Thread(target=_warm, name="s5-feat-prewarm", daemon=True)
    t.start()
    return _register_prewarm(t)


def prewarm_haplotype_model(cfg: PipelineConfig, model_path: str) -> threading.Thread:
    """Compile (or load from the persistent cache) the s5 model program on
    a daemon thread so the cold-compile cost overlaps s1–s4 instead of
    serializing in front of s5 (measured 743 s cold for a 20 Mbp world
    where s1–s4 take ~4 min — the whole compile hides)."""
    def _warm():
        try:
            import jax.numpy as jnp

            from ..train.train_pileup import load_checkpoint

            params, _ = load_checkpoint(model_path)
            pred = haplotype_model_predictor(cfg, params)
            compute_dtype = (jnp.bfloat16 if cfg.inference.use_bf16
                             else jnp.float32)
            l_p = 2 * cfg.haplotype_feature.pileup_flanking_size + 1
            l_h = 2 * cfg.haplotype_feature.adjacent_size + 1
            bs = pred.batch_size
            xp = jnp.zeros((bs, l_p, 105), compute_dtype)
            xh = jnp.zeros((bs, l_h, 105), compute_dtype)
            pred.run(np.asarray(xp), np.asarray(xh))
        except Exception:  # pragma: no cover - best-effort warm
            logging.getLogger(__name__).warning(
                "haplotype model prewarm failed", exc_info=True)

    t = threading.Thread(target=_warm, name="s5-prewarm", daemon=True)
    t.start()
    return _register_prewarm(t)


def stage_haplotype_predict(
    cfg: PipelineConfig,
    ref: FastaReference,
    shard_dir: str,
    output_csv: str,
    params,
) -> Dict:
    """s5: haplotype shards -> featurize on device -> model -> calls CSV
    (rows `ctg\\tpos\\tGT\\tqual`, reference predict_dev.py:43-47)."""
    import jax
    import jax.numpy as jnp

    from ..decode.pileup_vcf import calculate_score

    # Two separately-jitted device programs CHAINED ON DEVICE (round-2
    # findings, in order):
    #   1. fusing featurize+model in one jit recompiled the EXPENSIVE part
    #      (the Pallas dual-BiLSTM, minutes cold) per depth bucket, though
    #      its shapes have no depth in them. Split: featurize (plain XLA
    #      reductions, seconds to compile) jits per bucket; the model
    #      compiles ONCE (`haplotype_model_predictor`, prewarmable).
    #   2. fetching the [B,L,105] features to host to pool them round-trips
    #      ~150 MB/batch over the TPU link (~1.5 GB/s local PCIe is fine;
    #      the axon relay is ~60 MB/s + ~1s/dispatch and it dominated the
    #      whole stage). So pooling happens on the RAW int8 read matrices
    #      on host (the one mandatory H2D direction, 4x smaller than f32),
    #      and featurize output flows straight into the model on device;
    #      only the tiny (gt, zy) probabilities come back.
    # Deep buckets featurize in sub-batches (activation memory ~ B*D) that
    # device-concatenate up to the fixed model batch.
    model_pred = haplotype_model_predictor(cfg, params)
    model_bs = model_pred.batch_size

    def get_featurizer(dp_b: int):
        return haplotype_featurizer(cfg, _featurize_sub_batch(cfg, dp_b))

    concat2 = _device_concat()

    pools: Dict[tuple, Dict] = {}
    results: List[tuple] = []   # ((contig_key, pos), csv_line)
    pending: List[tuple] = []   # (meta_chunk, device (gt, zy))
    n_sites = 0
    t0 = time.monotonic()

    defer_frac = cfg.merge.defer_unphased_frac
    n_deferred = [0]

    def drain_one():
        # deferral already happened at shard-load time (rows filtered
        # before featurize/model batches), so every meta row emits.
        meta, res = pending.pop(0)
        gt = np.asarray(res[0])[: len(meta)]
        gt_arg = gt.argmax(axis=1)
        gt_max = gt.max(axis=1)
        for j, (ctg, pos) in enumerate(meta):
            qual = calculate_score(float(gt_max[j]))
            results.append(((C.contig_sort_key(ctg), pos),
                            f"{ctg}\t{pos}\t{C.GT21_LABELS[gt_arg[j]]}\t{qual}\n"))

    def flush(key, final: bool) -> None:
        pool = pools[key]
        n = len(pool["meta"])
        if n == 0:
            return
        keep = 0 if final else n % model_bs
        run_n = n - keep
        if run_n == 0:
            return
        args = [np.concatenate([c[i] for c in pool["chunks"]])
                for i in range(len(pool["chunks"][0]))]
        feat = get_featurizer(key[0])
        fs = feat.batch_size
        pad_rows = -run_n % fs
        if pad_rows:   # final partial batch: pad raw int8 on host (cheap)
            args_run = [np.concatenate(
                [a[:run_n],
                 np.full((pad_rows,) + a.shape[1:], C.PAD_VALUE, a.dtype)])
                for a in args]
        else:
            args_run = [a[:run_n] for a in args]
        total = run_n + pad_rows
        for start in range(0, total, model_bs):
            end = min(start + model_bs, total)
            parts = [feat.apply(*[a[s:s + fs] for a in args_run])
                     for s in range(start, end, fs)]
            if len(parts) == 1:
                xp, xh = parts[0]
            else:
                xp = concat2([p[0] for p in parts])
                xh = concat2([p[1] for p in parts])
            if xp.shape[0] < model_bs:   # final sub-model_bs remainder
                reps = -(-model_bs // xp.shape[0])
                xp = concat2([xp] * reps)[:model_bs]
                xh = concat2([xh] * reps)[:model_bs]
            res = model_pred.apply(xp, xh)
            pending.append((pool["meta"][start: min(end, run_n)], res))
            while len(pending) > 2:
                drain_one()
        pool["meta"] = pool["meta"][run_n:]
        pool["chunks"] = ([[a[run_n:] for a in args]] if keep else [])

    # contig-grouped iteration: pools + result rows flush and write at
    # every contig boundary, bounding host memory at O(contig) instead of
    # accumulating the whole genome's CSV rows before one global sort
    # (one tail flush per bucket pair per contig is the padding cost)
    paths = bins.list_shards(shard_dir)
    contig_of = {p: str(bins.open_npz(p)["contig"]) for p in paths}
    paths.sort(key=lambda p: (C.contig_sort_key(contig_of[p]), p))
    out_f = open(output_csv, "w")
    cur_contig: List[Optional[str]] = [None]

    def flush_contig():
        for key in list(pools):
            flush(key, final=True)
        while pending:
            drain_one()
        results.sort(key=lambda kv: kv[0])
        for _, line in results:
            out_f.write(line)
        results.clear()
        pools.clear()

    # prefetch depth 1: the npz inflate of a consolidated bucket shard is
    # seconds of single-threaded zlib (the r5b soak's s5 spent more time
    # loading than computing); zlib releases the GIL, so loading shard
    # k+1 overlaps shard k's pad/featurize/drain work. Costs one extra
    # in-RAM shard (bounded by NSP_S4_FLUSH_GROUPS).
    from concurrent.futures import ThreadPoolExecutor

    loader = ThreadPoolExecutor(max_workers=1)

    def _shard_iter():
        fut = (loader.submit(bins.load_haplotype_shard, paths[0])
               if paths else None)
        for i in range(len(paths)):
            cur = fut.result()
            fut = (loader.submit(bins.load_haplotype_shard, paths[i + 1])
                   if i + 1 < len(paths) else None)
            yield cur

    for shard in _shard_iter():
        if len(shard) == 0:
            continue
        if cur_contig[0] is not None and shard.contig != cur_contig[0]:
            flush_contig()
        cur_contig[0] = shard.contig
        # unphased-site deferral (MergeConfig.defer_unphased_frac): filter
        # BEFORE pooling so deferred sites never enter the featurize/model
        # batches — in the sparse regime the gate targets (~70% deferred),
        # this drops most of s5's device compute, not just the CSV rows.
        # No row emitted -> merge keeps the pileup call (absent-site rule).
        # Fraction = phased reads (HP 1/2) over reads covering the
        # candidate column of the haplotype view. Computed on the
        # HP-sorted, depth-capped shard rows, so at over-coverage sites it
        # is biased upward (phased rows sort first and survive the cap);
        # acceptable at the default 0.01 threshold — recompute from
        # uncapped s4 tag counts if the threshold is ever raised.
        if defer_frac > 0.0:
            col = shard.haplotype["hap"][:, :, shard.haplotype["hap"].shape[2] // 2]
            covering = np.maximum((col != C.PAD_VALUE).sum(axis=1), 1)
            fracs = ((col == 1) | (col == 2)).sum(axis=1) / covering
            keep = fracs >= defer_frac
            n_drop = int((~keep).sum())
            if n_drop:
                n_deferred[0] += n_drop
                n_sites += n_drop   # deferred sites still count as seen
                shard = bins.HaplotypeShard(
                    contig=shard.contig,
                    candidate_positions=shard.candidate_positions[keep],
                    group_positions=shard.group_positions[keep],
                    pileup={k: v[keep] for k, v in shard.pileup.items()},
                    haplotype={k: v[keep] for k, v in shard.haplotype.items()},
                )
                if len(shard) == 0:
                    continue
        seq = ref.contig(shard.contig)
        dp_b = _bucket(shard.pileup["sequences"].shape[1])
        dh_b = _bucket(shard.haplotype["sequences"].shape[1])
        # read matrices ship compact (int8; int16 for mapq which can reach
        # 254 in the BAM spec) -> 4x less host->device traffic than f32.
        # Shards already store these dtypes (bins._KEY_DTYPE); the astype
        # is a no-op there and only converts legacy int32 shards.
        # Key order MUST match fn's positional signature (seq, baseq, mapq,
        # hap) — NOT bins._KEYS order, which lists hap second (round-1 bug:
        # the permutation fed HP tags as base qualities and mapq as the
        # phasing groups, silently degrading every haplotype call).
        args = []
        for view, db in (("pileup", dp_b), ("haplotype", dh_b)):
            d = getattr(shard, view)
            n_pad = db - d["sequences"].shape[1]
            pad = ((0, 0), (0, n_pad), (0, 0))
            for k in ("sequences", "baseq", "mapq", "hap"):
                # np.pad copies even at zero width; depth already at the
                # bucket (the common case for consolidated shards) skips it
                a = (d[k] if n_pad == 0
                     else np.pad(d[k], pad, constant_values=C.PAD_VALUE))
                args.append(a.astype(bins._KEY_DTYPE[k], copy=False))
            if view == "pileup":
                args.append(ref_window_codes(
                    seq, shard.candidate_positions,
                    cfg.haplotype_feature.pileup_flanking_size).astype(np.int8))
            else:
                args.append(ref_position_codes(
                    seq, shard.group_positions).astype(np.int8))
        key = (dp_b, dh_b)
        pool = pools.setdefault(key, {"chunks": [], "meta": []})
        pool["chunks"].append(args)
        pool["meta"].extend(
            (shard.contig, int(p)) for p in shard.candidate_positions)
        n_sites += len(shard)
        if len(pool["meta"]) >= model_bs:
            flush(key, final=False)
    loader.shutdown(wait=True)
    flush_contig()
    out_f.close()
    dt = time.monotonic() - t0
    m = {"sites": n_sites,
         "sites_per_s": round(n_sites / dt, 1) if dt else 0}
    if defer_frac > 0.0:
        m["deferred"] = n_deferred[0]
    return m


def _depth_scaled_batch(batch_size: int, depth_bucket: int,
                        ref_depth: int = 128, floor: int = 512) -> int:
    """Scale the device batch down for deep buckets so activation memory
    stays roughly constant (batch*depth product), keeping a floor for MXU
    efficiency. Result stays a multiple of `floor` (which the mesh size
    divides)."""
    if depth_bucket <= ref_depth:
        return batch_size
    scaled = max(batch_size * ref_depth // depth_bucket, floor)
    return max(scaled // floor, 1) * floor


_bucket = bins.depth_bucket


def stage_phase_native(
    cfg: PipelineConfig,
    ref: FastaReference,
    pileup_vcf: str,
    bam_path: str,
    out_dir: str,
    contigs: Optional[Sequence[str]] = None,
    emit_tagged_bams: bool = False,
) -> Dict:
    """s3 without whatshap: native read-backed phasing.

    Selects phasing-input hets exactly like the reference
    (select_high_quality_hetesnps.py, QUAL >= phase_het_quality), phases
    them from the read allele matrix (phase/native_phaser.py), writes a
    whatshap-style phased VCF per contig plus the read->HP partition
    ({contig}.hp.npz: read_ids + hp), which s4 injects in place of BAM HP
    tags — no tagged-BAM round trip."""
    from ..decode.sort import select_phasing_hetesnps
    from ..io.bam import BamFile
    from ..phase.native_phaser import phase_contig, write_phased_vcf

    from concurrent.futures import ThreadPoolExecutor

    os.makedirs(out_dir, exist_ok=True)
    hf = cfg.haplotype_feature
    with open(pileup_vcf) as f:
        header, per_contig = select_phasing_hetesnps(f, hf.phase_het_quality)
    want = set(contigs) if contigs else None
    t0 = time.monotonic()
    totals = {"sites": 0, "phased_sites": 0, "blocks": 0, "tagged_reads": 0}

    def one_contig(ctg):
        rows = per_contig[ctg]
        pos, refs, alts = [], [], []
        for row in rows:
            cols = row.split("\t")
            if len(cols[3]) == 1 and len(cols[4].split(",")[0]) == 1:
                pos.append(int(cols[1]))
                refs.append(cols[3])
                alts.append(cols[4].split(",")[0])
        if not pos:
            return None
        result = phase_contig(
            bam, ctg, np.asarray(pos, dtype=np.int64), refs, alts,
            window_bp=hf.phaser_window_bp, overlap_bp=hf.phaser_overlap_bp,
            min_mq=cfg.pileup_feature.mpileup_min_mq,
            min_block_sites=hf.phaser_min_block_sites)
        np.savez_compressed(
            os.path.join(out_dir, f"{ctg}.hp.npz"),
            read_ids=np.array(list(result.read_hp), dtype=np.int64),
            hp=np.array(list(result.read_hp.values()), dtype=np.int8))
        with open(os.path.join(out_dir, f"{ctg}.phased.vcf"), "w") as out:
            out.writelines(header)
            write_phased_vcf(result, rows, out)
        if emit_tagged_bams:
            # whatshap-haplotag's user-visible artifact, via the native
            # BGZF/BAM writer (the pipeline itself injects the partition
            # in-memory; these files serve external tooling / IGV)
            tag_dir = os.path.join(out_dir, "haplotag_out")
            os.makedirs(tag_dir, exist_ok=True)
            bam.write_tagged(os.path.join(tag_dir, f"{ctg}.bam"),
                             result.read_hp, contig=ctg)
        return len(pos), result

    todo = [c for c in sorted(per_contig, key=C.contig_sort_key)
            if want is None or c in want]
    # contig-parallel like the reference's GNU parallel fan-out; the heavy
    # parts (native region fetch, numpy matmuls) release the GIL
    n_workers = max(min(cfg.threads or (os.cpu_count() or 4), len(todo)), 1)
    with BamFile(bam_path) as bam, \
            ThreadPoolExecutor(max_workers=n_workers) as ex:
        for out_item in ex.map(one_contig, todo):
            if out_item is None:
                continue
            n_sites, result = out_item
            totals["sites"] += n_sites
            totals["phased_sites"] += int((result.hap_of_alt != 0).sum())
            totals["blocks"] += result.n_blocks
            totals["tagged_reads"] += len(result.read_hp)
    dt = time.monotonic() - t0
    totals["seconds"] = round(dt, 2)
    return totals


def load_native_phase_overrides(out_dir: str) -> Dict[str, Dict[int, int]]:
    """{contig: {read_id: hp}} from a stage_phase_native output dir."""
    overrides: Dict[str, Dict[int, int]] = {}
    if not os.path.isdir(out_dir):
        return overrides
    for f in os.listdir(out_dir):
        if f.endswith(".hp.npz"):
            z = np.load(os.path.join(out_dir, f))
            overrides[f[: -len(".hp.npz")]] = {
                int(r): int(h) for r, h in zip(z["read_ids"], z["hp"])}
    return overrides


def stage_merge(
    cfg: PipelineConfig,
    pileup_vcf: str,
    haplotype_csv: str,
    output_vcf: str,
) -> Dict:
    with open(pileup_vcf) as pv, open(haplotype_csv) as hc, \
            open(output_vcf, "w") as out:
        n = merge_calls(pv, hc, out,
                        quality_threshold=cfg.merge.quality,
                        hap_quality=cfg.merge.hap_quality,
                        pileup_rescue_quality=cfg.merge.pileup_rescue_quality)
    return {"rescued": n}
