"""Independent 18-channel pileup oracle (r3, VERDICT #1 hardening).

Third implementation of the candidate-tensor semantics, written directly
from the reference C++ (`tensor_maker.cpp:116-248`) and the mpileup format
spec — sharing no code with either in-repo path (the native BAM engine in
`io/native/bam_core.cpp` and the text simulator+parser pair). The
engine-vs-text differential in test_bam_engine.py validates two
implementations against each other; this oracle breaks the possible
shared-blind-spot by deriving counts through a different decomposition:
column-major observation multisets, exactly the reference's cov_stats.

Semantics implemented (reference line cites):
  - observation keys: base char with case = strand; '+<seq>' insertions
    attached to the preceding aligned base; '-<refseq>' deletions (allele
    bases from the REFERENCE, tensor_maker.cpp:149-151); '*'/'#' deletion
    placeholders by strand (--reverse-del).
  - channels A C G T I I1 D D1 * a c g t i i1 d d1 #: I/D = total ins/del
    observations by strand; I1/D1 = the LARGEST single distinct
    (sequence,strand) observation count (tensor_maker.cpp:116-165) — not
    the global-argmax allele's per-strand count.
  - depth = ACGT + * + # counts; N bases contribute nothing
    (tensor_maker.cpp:169-186).
  - ref-base negation on both strands (tensor_maker.cpp:229-246).
  - candidate filter: pileup_dict (case-folded SNV keys + aggregate I/D),
    pass_af = top item != ref OR any non-ref SNV >= snp_min_af OR
    aggregate ins/del >= indel_min_af; depth >= min_coverage; ref in ACGT
    (tensor_maker.cpp:196-248, main.cpp:196-201).
  - per-column depth cap, first covering reads in BAM order
    (depth_mode="column"); a read capped-out at its anchor base does not
    record its following indel.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

CH = {n: i for i, n in enumerate(
    ["A", "C", "G", "T", "I", "I1", "D", "D1", "*",
     "a", "c", "g", "t", "i", "i1", "d", "d1", "#"])}


def oracle_pileup(reads, ref_seq: str, *, min_mq=20, excl_flags=2316,
                  max_depth=144, snp_min_af=0.12, indel_min_af=0.12,
                  min_coverage=6):
    """Returns dict pos1 -> (counts[18], depth, is_candidate, alt_info)."""
    L = len(ref_seq)
    # per-position observation lists; cap admission per column in BAM order
    obs: Dict[int, Dict[Tuple, int]] = {}
    col_n = np.zeros(L, np.int64)

    def add(pos0, key):
        obs.setdefault(pos0, {})
        obs[pos0][key] = obs[pos0].get(key, 0) + 1

    for r in reads:
        if r.flag & excl_flags or r.mapq < min_mq:
            continue
        fwd = not r.reverse
        rpos, qpos = r.start0, 0
        anchor = None            # (pos0, counted) of last aligned base
        for op, ln in r.cigar:
            if op in "M=X":
                for k in range(ln):
                    p0 = rpos + k
                    counted = True
                    if 0 <= p0 < L:
                        if col_n[p0] >= max_depth:
                            counted = False
                        else:
                            col_n[p0] += 1
                            b = r.seq[qpos + k].upper()
                            if b in "ACGT":
                                add(p0, ("b", b, fwd))
                            # N: occupies a cap slot, no channel, no depth
                    anchor = (p0, counted)
                rpos += ln
                qpos += ln
            elif op == "I":
                if anchor and anchor[1] and 0 <= anchor[0] < L and ln <= 60:
                    ins = r.seq[qpos: qpos + ln].upper()
                    add(anchor[0], ("+", ins, fwd))
                qpos += ln
            elif op in "DN":
                if op == "D":
                    if anchor and anchor[1] and 0 <= anchor[0] < L \
                            and ln <= 60:
                        add(anchor[0], ("-", ln, fwd))
                    for k in range(ln):
                        p0 = rpos + k
                        if 0 <= p0 < L and col_n[p0] < max_depth:
                            col_n[p0] += 1
                            add(p0, ("*", fwd))
                rpos += ln
            elif op == "S":
                qpos += ln
            # H/P consume nothing we model

    out = {}
    for p0 in sorted(obs):
        ref_b = ref_seq[p0].upper()
        t = np.zeros(18, np.int64)
        depth = 0
        alt: Dict[str, int] = {}
        pile: Dict[str, int] = {}
        max_if, max_ir, max_df, max_dr = 0, 0, 0, 0
        for key, cnt in obs[p0].items():
            kind = key[0]
            if kind == "b":
                b, fwd = key[1], key[2]
                t[CH[b if fwd else b.lower()]] += cnt
                depth += cnt
                pile[b] = pile.get(b, 0) + cnt
                if b != ref_b:
                    alt["X" + b] = alt.get("X" + b, 0) + cnt
            elif kind == "*":
                fwd = key[1]
                t[CH["*" if fwd else "#"]] += cnt
                depth += cnt
            elif kind == "+":
                ins, fwd = key[1], key[2]
                t[CH["I" if fwd else "i"]] += cnt
                if fwd:
                    max_if = max(max_if, cnt)
                else:
                    max_ir = max(max_ir, cnt)
                ak = "I" + ref_b + ins
                alt[ak] = alt.get(ak, 0) + cnt
                pile["I"] = pile.get("I", 0) + cnt
            elif kind == "-":
                ln, fwd = key[1], key[2]
                t[CH["D" if fwd else "d"]] += cnt
                if fwd:
                    max_df = max(max_df, cnt)
                else:
                    max_dr = max(max_dr, cnt)
                # deletion allele bases come RAW from the reference
                # (case preserved; 'N' past the contig end) — engine
                # pileup_common.hpp build_alt_info
                dseq = "".join(
                    ref_seq[p0 + q] if p0 + q < len(ref_seq) else "N"
                    for q in range(1, ln + 1))
                ak = "D" + dseq
                alt[ak] = alt.get(ak, 0) + cnt
                pile["D"] = pile.get("D", 0) + cnt
        t[CH["I1"]], t[CH["i1"]] = max_if, max_ir
        t[CH["D1"]], t[CH["d1"]] = max_df, max_dr

        denom = depth if depth else 1
        items = sorted(pile.items(), key=lambda kv: -kv[1])
        pass_af = bool(items) and items[0][0][0] != ref_b
        for k, c in items:
            if k == ref_b:
                continue
            if k in ("I", "D"):
                pass_af = pass_af or (c / denom >= indel_min_af)
            else:
                pass_af = pass_af or (c / denom >= snp_min_af)
        cand = pass_af and depth >= min_coverage and ref_b in "ACGT"

        if ref_b in "ACGT":
            fsum = sum(t[CH[x]] for x in "ACGT")
            rsum = sum(t[CH[x.lower()]] for x in "ACGT")
            t[CH[ref_b]] = -fsum
            t[CH[ref_b.lower()]] = -rsum

        # NOTE: the engine's ChromPileup carries only the sorted
        # "key cnt " pairs; the reference's "depth-" prefix
        # (main.cpp:225-231) is attached downstream at window emission
        alt_info = ""
        if cand:
            alt_info = "".join(f"{k} {v} " for k, v in sorted(alt.items()))
        out[p0 + 1] = (t, depth, cand, alt_info)
    return out
