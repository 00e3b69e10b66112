#!/usr/bin/env bash
# Real-data parity runbook (BASELINE.md "site-level identical on the test
# BAM"). One command on a machine that has BOTH stacks' prerequisites:
#
#   bash scripts/real_data_parity.sh <BAM> <REF.fa> <OUTDIR> [CONTIG]
#
# Prerequisites:
#   - reference side: samtools, whatshap, bgzip, tabix, python with
#     torch/pysam/pandas/tables (the reference's docker image
#     huangnengcsu/nanosnp:v2.1-gpu has all of them), reference repo at
#     $NANOSNP_REF (default /root/reference) with dna_sv_tensor built;
#   - our side: this repo on PYTHONPATH (jax etc.).
#
# What it does (CONTIG defaults to chr20):
#   1. runs the reference run_caller.sh end to end -> ref_out/
#   2. runs  python -m nanosnp_tpu.runtime.cli call  -> tpu_out/
#      (whatshap engine for strict parity; rerun with --phaser native for
#      the self-contained path)
#   3. diffs the four artifacts stage by stage with eval/diff.py:
#        s1 candidate windows  (positions + 33x18 tensors)
#        s2 pileup.vcf         (site-level)
#        s5 haplotype.csv      (calls)
#        s6 merge.vcf          (site-level)
#
# Every comparison prints counts of identical/missing/different rows;
# exit status is non-zero if any stage diverges.
set -euo pipefail

BAM=${1:?usage: real_data_parity.sh BAM REF OUTDIR [CONTIG]}
REF=${2:?}
OUT=${3:?}
CONTIG=${4:-chr20}
NANOSNP_REF=${NANOSNP_REF:-/root/reference}
THREADS=${THREADS:-16}
REPO=$(cd "$(dirname "$0")/.." && pwd)

mkdir -p "$OUT"/{ref_out,tpu_out}

echo "== [1/3] reference pipeline ($NANOSNP_REF/run_caller.sh) =="
if [ ! -x "$NANOSNP_REF/run_caller.sh" ]; then
  echo "reference run_caller.sh not found/executable at $NANOSNP_REF" >&2
  exit 2
fi
( cd "$NANOSNP_REF" && bash run_caller.sh -b "$BAM" -f "$REF" \
    -t "$THREADS" -c 30 -o "$OUT/ref_out" )

echo "== [1b] depth-admission differential (samtools vs depth_mode=push) =="
# `depth_mode: push` implements htslib's bam_plp_push whole-read admission
# (incl. the coverage-spike shadow) but in this dev container it has only
# ever been validated against a pure-Python model of the rule. BEFORE the
# default can flip from `column` to `push`, this differential must pass on
# a machine with real samtools: same BAM, samtools mpileup --max-depth 144
# (the reference make_predict_data.sh operating point) vs our push-mode
# engine, row-for-row depth comparison.
REPO="$REPO" python - "$BAM" "$REF" "$CONTIG" <<'EOF'
import os, subprocess, sys
bam, ref, contig = sys.argv[1:4]
sys.path.insert(0, os.environ["REPO"])
import numpy as np
from nanosnp_tpu.io.bam import BamFile
from nanosnp_tpu.io.fasta import FastaReference

# exact reference operating point: make_predict_data.sh:117
# SAMTOOS_MPILEUP_OPTIONS
txt = subprocess.run(
    ["samtools", "mpileup", "-r", contig, "--min-MQ", "20", "--min-BQ", "0",
     "--reverse-del", "--excl-flags", "2316", "--max-depth", "144", bam],
    capture_output=True, text=True, check=True).stdout
want = {}
for line in txt.splitlines():
    f = line.split("\t")
    if len(f) >= 4:
        want[int(f[1])] = int(f[3])
seq = FastaReference(ref).contig(contig)
with BamFile(bam) as bf:
    pile = bf.pileup_region(contig, 0, len(seq), seq, min_mq=20,
                            excl_flags=2316, max_depth=144,
                            depth_mode="push")
bad = 0
for p, d in zip(pile.positions, pile.depths):
    wd = want.get(int(p))
    if wd is not None and wd != int(d):
        bad += 1
        if bad <= 10:
            print(f"  depth mismatch at {contig}:{p}: samtools {wd} vs push {d}")
print(f"depth differential: {len(pile.positions)} rows, {bad} mismatches")
sys.exit(1 if bad else 0)
EOF
echo "   (green run above = evidence to flip PileupFeatureConfig.depth_mode"
echo "    default to 'push'; file the flip with this log attached)"

echo "== [2/3] nanosnp_tpu pipeline =="
# Strict-parity knobs for this run (production defaults differ):
#   --defer-unphased-frac 0   : the unphased-rescue deferral gate is OUR
#                               improvement (no reference counterpart);
#                               parity diffs need reference behavior.
#   --depth-mode column       : exact per-column cap until [1b] above has
#                               proven push against real samtools.
#   phaser_min_block_sites=2  : matches whatshap's no-singleton-block
#                               semantics (config default; nothing to pass).
# Shipped haplotype checkpoint (r5): v6b phase-robust synthetic weights
# (sha256 prefix f0fa5321… — verify against docs/evidence/defer_ab_v6_r5.json
# weights_sha256). The deferral gate is OFF here anyway; v6b makes the
# model itself degrade gracefully at phase-blind sites, so gate-off
# parity runs no longer depend on masking (defer_ab_v6_r5.json sparse
# merge_off 0.717 >= pileup 0.690).
( cd "$REPO" && python -m nanosnp_tpu.runtime.cli call \
    --bam "$BAM" --ref "$REF" \
    --pileup-model "$NANOSNP_REF/PileupModel/models/ont_pileup.chkpt" \
    --haplotype-model "${HAPLOTYPE_CKPT:-$REPO/nanosnp_tpu/models/weights/ont_haplotype_synthetic.npz}" \
    --phaser whatshap --contigs "$CONTIG" \
    --defer-unphased-frac 0 --depth-mode column \
    --threads "$THREADS" -o "$OUT/tpu_out" )

echo "== [3/3] stage-by-stage diffs =="
REPO="$REPO" python - "$OUT" "$CONTIG" <<'EOF'
import sys, os
out, contig = sys.argv[1], sys.argv[2]
sys.path.insert(0, os.environ["REPO"])
from nanosnp_tpu.eval.diff import diff_vcfs, diff_haplotype_csvs  # noqa

fail = 0
ref_vcf = os.path.join(out, "ref_out", "pileup.vcf")
tpu_vcf = os.path.join(out, "tpu_out", "pileup.vcf")
for name, a, b, fn in [
    ("s2 pileup.vcf", ref_vcf, tpu_vcf, diff_vcfs),
    ("s5 haplotype.csv", os.path.join(out, "ref_out", "haplotype.csv"),
     os.path.join(out, "tpu_out", "haplotype.csv"), diff_haplotype_csvs),
    ("s6 merge.vcf", os.path.join(out, "ref_out", "merge.vcf"),
     os.path.join(out, "tpu_out", "merge.vcf"), diff_vcfs),
]:
    if not (os.path.exists(a) and os.path.exists(b)):
        print(f"[{name}] MISSING: {a if not os.path.exists(a) else b}")
        fail = 1
        continue
    with open(a) as fa, open(b) as fb:
        r = fn(fa, fb)
    print(f"[{name}] {r.summary()}")
    for row in (r.only_a[:5] + r.only_b[:5]):
        print(f"  divergent: {row}")
    for where, va, vb in r.field_diffs[:5]:
        print(f"  field: {where}: {va!r} vs {vb!r}")
    if not r.identical:
        fail = 1
sys.exit(fail)
EOF
