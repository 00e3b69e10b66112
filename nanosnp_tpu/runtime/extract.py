"""Native read-matrix extraction for the haplotype stage (s4).

NativeBamExtractor reproduces the reference's pysam extraction
(create_pileup_haplotype.py:23-216) on top of the native BAM engine:

  - coverage precheck: any group touching a position with coverage above
    max_coverage is dropped (:39-60);
  - one read-matrix sweep over the union of candidate windows and het
    positions (:74-134);
  - per group: slice the 11 het columns and the 33-window columns, keep
    reads covering the center, sort rows by the HP tag at the center column
    (:144-200). Sorting here is a stable argsort (pandas sort_values is
    unstable for ties; row order only matters at depth-cap truncation, and
    the downstream statistics are order-invariant).

Divergences from the reference (documented, both strictly better):
  - a non-ACGT read base leaves a 0 cell instead of poisoning the whole
    chunk via a swallowed KeyError (create_pileup_haplotype.py:122,213);
  - the coverage precheck counts base/del-covering reads (pysam's column.n
    also counts refskip reads, absent in ONT data).
"""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from .. import constants as C
from ..io.bam import BamFile, PYSAM_EXCL_FLAGS


class NativeBamExtractor:
    """ReadMatrixExtractor over per-contig haplotagged BAMs
    (stage_haplotype_features signature: (contig, groups, flank) -> mats)."""

    def __init__(self, bam_dir_or_paths, max_coverage: int = C.MAX_COVERAGE,
                 hp_overrides=None, nbase_chunk_drop: bool = False):
        # bam_dir_or_paths: directory with {contig}.bam, or {contig: path}
        # hp_overrides: {contig: {read_id: 1|2}} from the native phaser —
        # replaces BAM HP tags so no tagged-BAM round trip is needed
        # nbase_chunk_drop: bug-compat mode — drop the whole chunk when any
        # read carries a non-ACGT base at a requested position, replicating
        # the reference's swallowed base_to_int KeyError
        # (create_pileup_haplotype.py:122,213); default keeps the sites
        import threading

        self.max_coverage = max_coverage
        self.hp_overrides = hp_overrides or {}
        self.nbase_chunk_drop = nbase_chunk_drop
        self._open_lock = threading.Lock()
        if isinstance(bam_dir_or_paths, dict):
            self.paths = dict(bam_dir_or_paths)
        else:
            import os

            self.paths = {}
            if os.path.isdir(bam_dir_or_paths):
                for f in os.listdir(bam_dir_or_paths):
                    if f.endswith(".bam"):
                        self.paths[f[:-4]] = os.path.join(bam_dir_or_paths, f)
        self._open: Dict[str, BamFile] = {}

    def _bam(self, contig: str) -> Optional[BamFile]:
        if contig not in self.paths:
            return None
        with self._open_lock:   # callers run chunk-parallel (stages.py s4)
            if contig not in self._open:
                self._open[contig] = BamFile(self.paths[contig])
            return self._open[contig]

    def close(self):
        for b in self._open.values():
            b.close()
        self._open.clear()

    def __call__(self, contig: str, groups: np.ndarray, flank: int
                 ) -> Optional[Dict[str, List[Dict[str, np.ndarray]]]]:
        bam = self._bam(contig)
        if bam is None or len(groups) == 0:
            return None

        # ONE sweep over the union of all needed positions; the coverage
        # precheck (create_pileup_haplotype.py:39-60) reads its counts off
        # the same matrices instead of a second BAM pass
        centers = groups[:, groups.shape[1] // 2]
        ext = set()
        for g in groups:
            ext.update(int(p) for p in g)
        for c in centers:
            ext.update(range(int(c) - flank, int(c) + flank + 1))
        ext_positions = np.array(sorted(ext), dtype=np.int64)
        mats = bam.read_matrices(contig, ext_positions,
                                 excl_flags=PYSAM_EXCL_FLAGS,
                                 max_reads=8192)
        if mats is None:
            return None
        if self.nbase_chunk_drop and mats.get("n_nonacgt", 0) > 0:
            return None

        group_pos = np.unique(groups.reshape(-1))
        gp_cols = np.searchsorted(ext_positions, group_pos)
        coverage = (mats["sequences"][:, gp_cols] != 0).sum(axis=0)
        failed = set(int(p) for p in group_pos[coverage > self.max_coverage])
        if failed:
            keep = [i for i in range(len(groups))
                    if not any(int(p) in failed for p in groups[i])]
            groups = groups[keep]
            if len(groups) == 0:
                return None
        seqm = mats["sequences"]
        bqm = mats["baseq"]
        mqm = mats["mapq"]
        hap_tag = mats["hap_tags"]
        over = self.hp_overrides.get(contig)
        if over:
            hap_tag = np.array(
                [over.get(int(rid), 3) for rid in mats["read_ids"]],
                dtype=np.int32)
        # hap matrix: tag at covered cells, 0 elsewhere
        # (create_pileup_haplotype.py:124,132)
        hapm = np.where(seqm != 0, hap_tag[:, None], 0).astype(np.int32)
        col_of = {int(p): i for i, p in enumerate(ext_positions)}

        out: Dict[str, List[Dict[str, np.ndarray]]] = {"pileup": [],
                                                       "haplotype": [],
                                                       "groups": groups}
        for g in groups:
            center = int(g[len(g) // 2])
            for view, pos_list in (
                ("haplotype", [int(p) for p in g]),
                ("pileup", list(range(center - flank, center + flank + 1))),
            ):
                cols = np.array([col_of[p] for p in pos_list], dtype=np.int64)
                sub_seq = seqm[:, cols]
                mid = len(cols) // 2
                rows = np.flatnonzero(sub_seq[:, mid] != 0)
                sub_seq = sub_seq[rows]
                sub_hap = hapm[np.ix_(rows, cols)]
                order = np.argsort(sub_hap[:, mid], kind="stable")
                out[view].append({
                    "sequences": sub_seq[order].astype(np.int32),
                    "hap": sub_hap[order].astype(np.int32),
                    "baseq": bqm[np.ix_(rows, cols)][order].astype(np.int32),
                    "mapq": mqm[np.ix_(rows, cols)][order].astype(np.int32),
                })
        return out
