"""Differential tests: the training-data path vs the reference C++
binaries (DNA_ExtendBed, DNA_SplitVcf, DNA_CreateTrainData built
out-of-tree in /tmp/ref_build as oracles).

These close the round-3 gap that the train-data tools were tested only
against Python restatements of the rules: here the real compiled binaries
run on synthetic inputs and the outputs are compared byte-for-byte.
"""
import math
import re
import subprocess

import numpy as np
import pytest

from conftest import REFERENCE_BIN, needs_oracle
from synth import random_genome, random_mpileup

from nanosnp_tpu.config import PileupFeatureConfig
from nanosnp_tpu.features.pileup import assemble_windows, parse_mpileup_text
from nanosnp_tpu.io.fasta import FastaReference, write_fasta
from nanosnp_tpu.train.data import (
    build_pileup_train_arrays,
    extend_bed_intervals,
    split_truth_vcf,
    train_data_lines,
)


# ---------------------------------------------------------------- ExtendBed

def _run_extend_bed(tmp_path, bed_lines, extend):
    bed = tmp_path / "in.bed"
    out = tmp_path / "out.bed"
    bed.write_text("\n".join(bed_lines) + "\n")
    subprocess.run(
        [str(REFERENCE_BIN / "DNA_ExtendBed"), str(bed), str(extend),
         str(out)],
        check=True, capture_output=True)
    return [l for l in out.read_text().split("\n") if l]


def _random_bed(rng, contigs, n_per_contig):
    """Sorted intervals with strictly increasing starts AND ends per contig
    (the reference merge loop takes the LAST interval's end, not the max,
    so a contained interval silently truncates coverage — see the quirk
    test below; normal BED inputs are containment-free)."""
    lines = []
    intervals = []
    for ctg in contigs:
        pos = 0
        end = 0
        for _ in range(n_per_contig):
            pos += int(rng.integers(0, 120))
            start = pos
            end = max(end + 1, start + int(rng.integers(1, 150)))
            lines.append(f"{ctg}\t{start}\t{end}")
            intervals.append((ctg, start, end))
            pos = start + int(rng.integers(1, 80))
    return lines, intervals


@needs_oracle
@pytest.mark.parametrize("extend", [0, 31, 100])
def test_extend_bed_matches_reference(tmp_path, extend):
    rng = np.random.default_rng(100 + extend)
    lines, intervals = _random_bed(rng, ["chr1", "chr2", "chrX"], 40)
    want = _run_extend_bed(tmp_path, lines, extend)
    got = [f"{c}\t{s}\t{e}"
           for c, s, e in extend_bed_intervals(intervals, extend)]
    assert got == want


@needs_oracle
def test_extend_bed_header_and_blank_lines(tmp_path):
    rng = np.random.default_rng(7)
    lines, intervals = _random_bed(rng, ["ctgA"], 10)
    noisy = ["# header comment", ""] + lines[:5] + [""] + lines[5:]
    want = _run_extend_bed(tmp_path, noisy, 31)
    got = [f"{c}\t{s}\t{e}" for c, s, e in extend_bed_intervals(intervals, 31)]
    assert got == want


@needs_oracle
def test_extend_bed_containment_quirk(tmp_path):
    """The reference sets right = last_interval.end + extend (not the max,
    extend_bed/main.cpp:21), so an interval contained in its predecessor
    TRUNCATES the merged span. Our port takes the max (strictly more
    coverage). Documented divergence: assert our output covers every base
    the reference outputs."""
    lines = ["chrQ\t100\t500", "chrQ\t150\t200", "chrQ\t800\t900"]
    intervals = [("chrQ", 100, 500), ("chrQ", 150, 200), ("chrQ", 800, 900)]
    want = _run_extend_bed(tmp_path, lines, 10)
    got = extend_bed_intervals(intervals, 10)
    # reference truncates the first merged span to 150+10+... -> 210
    ref_spans = []
    for l in want:
        c, s, e = l.split("\t")
        ref_spans.append((c, int(s), int(e)))
    assert ("chrQ", 90, 210) in ref_spans  # the quirk, pinned
    for c, s, e in ref_spans:
        assert any(gc == c and gs <= s and ge >= e for gc, gs, ge in got), \
            (c, s, e, got)


# ----------------------------------------------------------------- SplitVcf

def _make_truth_vcf(rng, per_contig_sites):
    """Synthetic truth VCF exercising the GT/ALT edge forms split_vcf
    handles: phased/unphased GT, missing-allele '.', multi-field GT,
    multiallelic ALT, '*' overlap alleles (fixable 1|2 form and the
    invalid form that is dropped), SNVs and indels."""
    lines = ["##fileformat=VCFv4.2",
             "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1"]
    expected_kept = {}
    for ctg, sites in per_contig_sites.items():
        expected_kept[ctg] = []
        for pos, ref, alt, gt in sites:
            lines.append(
                f"{ctg}\t{pos}\t.\t{ref}\t{alt}\t50\tPASS\t.\tGT:DP\t{gt}")
    return lines


def _run_split_vcf(tmp_path, vcf_lines):
    vcf = tmp_path / "truth.vcf"
    outdir = tmp_path / "split_out"
    outdir.mkdir(exist_ok=True)
    vcf.write_text("\n".join(vcf_lines) + "\n")
    subprocess.run(
        [str(REFERENCE_BIN / "DNA_SplitVcf"), str(vcf), str(outdir)],
        check=True, capture_output=True)
    out = {}
    for f in sorted(outdir.glob("*.true_var")):
        out[f.name[:-len(".true_var")]] = \
            [l for l in f.read_text().split("\n") if l]
    return out


TRICKY_SITES = {
    "chr1": [
        (101, "A", "G", "0/1"),            # het SNV, unphased
        (205, "C", "T", "1|1"),            # hom SNV, phased
        (300, "G", "A,T", "1/2"),          # multiallelic het
        (411, "T", "TACG", "0/1:30:12"),   # insertion, extra GT fields
        (512, "TACG", "T", "1/1"),         # deletion
        (600, "A", "C", "./."),            # missing GT -> 0|0
        (700, "G", "T", "1/0"),            # reversed het -> min/max order
        (802, "C", "CT,*", "1/2"),         # '*' fixable: gt->0/1, alt "CT,"
        (880, "C", "*,CT", "2/1"),         # '*' fixable, star first
        (903, "A", "G,*", "1/1"),          # '*' invalid (gt sum != 3): drop
    ],
    "chr2": [
        (55, "T", "C", "0|1"),
        (90, "A", "AT", "1/2" if False else "1/1"),
        (150, "G", "GAA,GA", "1/2"),
    ],
}


@needs_oracle
def test_split_vcf_matches_reference(tmp_path):
    vcf_lines = _make_truth_vcf(np.random.default_rng(0), TRICKY_SITES)
    want = _run_split_vcf(tmp_path, vcf_lines)

    got_sites = split_truth_vcf(vcf_lines)
    got = {
        ctg: [f"{ctg}\t{t.pos}\t{t.ref}\t{t.alt}\t{t.gt1}\t{t.gt2}"
              for t in sites]
        for ctg, sites in got_sites.items()
    }
    assert set(got) == set(want)
    for ctg in want:
        assert got[ctg] == want[ctg], (ctg, got[ctg], want[ctg])


@needs_oracle
def test_split_vcf_fuzz(tmp_path):
    """Random VCFs across many seeds: positions, alleles and GT forms."""
    rng = np.random.default_rng(77)
    bases = "ACGT"
    for _ in range(5):
        sites = {}
        for ctg in ["c1", "c2"]:
            pos, rows = 10, []
            for _ in range(40):
                pos += int(rng.integers(1, 50))
                ref = bases[rng.integers(4)]
                kind = rng.integers(5)
                if kind == 0:
                    alt = bases[(bases.index(ref) + 1 + rng.integers(3)) % 4]
                elif kind == 1:
                    alt = ref + "".join(bases[rng.integers(4)]
                                        for _ in range(rng.integers(1, 4)))
                elif kind == 2:
                    ref = ref + "".join(bases[rng.integers(4)]
                                        for _ in range(rng.integers(1, 4)))
                    alt = ref[0]
                elif kind == 3:
                    a1 = bases[(bases.index(ref) + 1) % 4]
                    a2 = bases[(bases.index(ref) + 2) % 4]
                    alt = f"{a1},{a2}"
                else:
                    alt = f"{bases[(bases.index(ref) + 1) % 4]},*"
                gt = rng.choice(["0/1", "1/1", "1|0", "./.", "1/2", "2|1",
                                 "0/1:9", "1/1:22:7"])
                rows.append((pos, ref, alt, str(gt)))
            sites[ctg] = rows
        vcf_lines = _make_truth_vcf(rng, sites)
        want = _run_split_vcf(tmp_path, vcf_lines)
        got_sites = split_truth_vcf(vcf_lines)
        got = {
            ctg: [f"{ctg}\t{t.pos}\t{t.ref}\t{t.alt}\t{t.gt1}\t{t.gt2}"
                  for t in s]
            for ctg, s in got_sites.items()
        }
        for ctg in want:
            assert got.get(ctg, []) == want[ctg]


# ---------------------------------------------------------- CreateTrainData

def _prep_world(tmp_path, seed=11, length=3000, coverage=24):
    """Genome + mpileup -> reference .tensor/.alt_info via the compiled
    DNA_CreateCanSnpTensor (the same binary the pileup differentials use),
    plus our parsed CandidateBatch for the same input."""
    rng = np.random.default_rng(seed)
    genome = random_genome(rng, {"chrT": length})
    fasta = tmp_path / "ref.fa"
    write_fasta(str(fasta), genome)
    lines = random_mpileup(rng, "chrT", genome["chrT"], coverage=coverage,
                           alt_rate=0.15, gap_rate=0.01)
    pdir = tmp_path / "chr_pileup"
    tdir = tmp_path / "tensor_out"
    pdir.mkdir(exist_ok=True)
    tdir.mkdir(exist_ok=True)
    (pdir / "chrT.mpileup").write_text("\n".join(lines) + "\n")
    subprocess.run(
        [str(REFERENCE_BIN / "DNA_CreateCanSnpTensor"),
         "-reference", str(fasta),
         "-chr_pileup_dir", str(pdir),
         "-output_dir", str(tdir),
         "-min_af", "0.12", "-snp_min_af", "0.12", "-indel_min_af", "0.12",
         "-min_coverage", "6", "-flanking_base", "16", "-num_threads", "1",
         "chrT"],
        check=True, capture_output=True)
    ref = FastaReference(str(fasta))
    pile = parse_mpileup_text(lines, "chrT", ref.contig("chrT"),
                              PileupFeatureConfig())
    batch = assemble_windows(pile, ref.contig("chrT"))
    return rng, genome, tdir, batch


def _truth_over_candidates(rng, genome, positions, frac=0.35):
    """Truth VCF whose sites partly hit candidate positions (labels join)
    and partly miss (recall < 1), with varied genotypes."""
    bases = "ACGT"
    chosen = sorted(int(p) for p in
                    rng.choice(positions, size=max(3, int(len(positions) * frac)),
                               replace=False))
    extra = sorted(set(int(rng.integers(20, len(genome["chrT"]) - 20))
                       for _ in range(6)) - set(chosen))
    sites = []
    for pos in sorted(set(chosen) | set(extra)):
        ref = genome["chrT"][pos - 1]
        k = rng.integers(5)
        if k == 0:
            alt, gt = bases[(bases.index(ref) + 1) % 4], "0/1"
        elif k == 1:
            alt, gt = bases[(bases.index(ref) + 2) % 4], "1/1"
        elif k == 2:
            a1 = bases[(bases.index(ref) + 1) % 4]
            a2 = bases[(bases.index(ref) + 3) % 4]
            alt, gt = f"{a1},{a2}", "1/2"
        elif k == 3:
            alt, gt = ref + "ACG"[rng.integers(3)], "0/1"
        else:
            ref2 = ref + bases[rng.integers(4)]
            alt, gt = ref2[0], "1/1"
            ref = ref2
        sites.append((pos, ref, alt, str(gt)))
    return _make_truth_vcf(rng, {"chrT": sites})


def _run_train_data(tmp_path, tdir, ratio, shuffle=0):
    vdir = tmp_path / "split_out"
    odir = tmp_path / "td_out"
    odir.mkdir(exist_ok=True)
    proc = subprocess.run(
        [str(REFERENCE_BIN / "DNA_CreateTrainData"),
         "-chr_tensor_dir", str(tdir),
         "-chr_true_var_dir", str(vdir),
         "-output_dir", str(odir),
         "-shuffle_tensors", str(shuffle),
         "-maxinum_non_variant_ratio", str(ratio),
         "-num_threads", "1",
         "chrT"],
        check=True, capture_output=True)
    td = [l for l in (odir / "chrT.td").read_text().split("\n") if l]
    return td, proc.stderr.decode()


@needs_oracle
def test_make_train_data_deterministic_oracle(tmp_path):
    """Byte-identical .td vs the compiled DNA_CreateTrainData on the
    deterministic path (shuffle off, subsample ratio effectively inf):
    covers the 90-dim C++ label encoding (genotype.cpp
    output_labels_from_vcf_columns / output_labels_from_reference), the
    non-ACGT-center drop, first-occurrence dedup, the pos column layout
    and the appended true_var provenance line."""
    rng, genome, tdir, batch = _prep_world(tmp_path)
    vcf_lines = _truth_over_candidates(rng, genome, batch.positions)
    # '*'-fixed alts at candidate positions: after split_vcf the alt keeps
    # a dangling comma ("CT,"), and the C++ label encoder's strtok-style
    # tokenizer sees ONE token — covered by the cpp_split quirk path
    used = {int(l.split("\t")[1]) for l in vcf_lines if not l.startswith("#")}
    star_pos = [int(p) for p in batch.positions if int(p) not in used][:3]
    for i, pos in enumerate(star_pos):
        ref = genome["chrT"][pos - 1]
        alt = "ACGT"[("ACGT".index(ref) + 1) % 4]
        form = [f"{alt},*", f"*,{alt}", f"{alt}C,*"][i]
        vcf_lines.append(
            f"chrT\t{pos}\t.\t{ref}\t{form}\t50\tPASS\t.\tGT\t1/2")
    vcf_lines = (vcf_lines[:2]
                 + sorted((l for l in vcf_lines[2:]),
                          key=lambda l: int(l.split("\t")[1])))
    _run_split_vcf(tmp_path, vcf_lines)

    # ratio must keep variant_cnt*ratio inside int range: the reference
    # stores it in an int (main.cpp:161), so 1e9 would overflow to a
    # negative bound and drop every non-variant row
    want, _ = _run_train_data(tmp_path, tdir, ratio=1e4, shuffle=0)
    truth = split_truth_vcf(vcf_lines)["chrT"]
    got = train_data_lines(batch, truth)
    assert len(got) == len(want), (len(got), len(want))
    n_truth_rows = sum(1 for l in got if l.count("\t") > 3)
    assert n_truth_rows >= 3  # the join actually exercised truth labels
    for i, (g, w) in enumerate(zip(got, want)):
        assert g == w, f"row {i}:\nours:   {g[:200]}...\ntheirs: {w[:200]}..."


@needs_oracle
def test_make_train_data_subsample_parity(tmp_path):
    """Non-variant subsampling: the reference computes
    ratio = variants * R / non_variants from the .alt_info file
    (make_train_data/main.cpp:129-165) then keeps non-variants with
    probability ratio. Assert our computed ratio equals the one the binary
    logs, and both kept-counts sit inside the binomial band."""
    rng, genome, tdir, batch = _prep_world(tmp_path, seed=12, length=4000,
                                           coverage=30)
    vcf_lines = _truth_over_candidates(rng, genome, batch.positions, frac=0.1)
    _run_split_vcf(tmp_path, vcf_lines)
    R = 2.0
    want, stderr = _run_train_data(tmp_path, tdir, ratio=R, shuffle=0)

    m = re.search(
        r"variants / non_variants / subsample_ratio : (\d+) / (\d+) / (\S+)",
        stderr)
    assert m, stderr
    n_var, n_nonvar, ref_ratio = int(m[1]), int(m[2]), float(m[3])

    truth = split_truth_vcf(vcf_lines)["chrT"]
    truth_pos = {t.pos for t in truth}
    our_var = sum(1 for p in batch.positions if int(p) in truth_pos)
    our_nonvar = len(batch.positions) - our_var
    assert (our_var, our_nonvar) == (n_var, n_nonvar)
    max_nonvar = int(our_var * R)
    our_ratio = (max_nonvar / our_nonvar) if max_nonvar < our_nonvar else 1.0
    assert our_ratio == pytest.approx(ref_ratio, rel=1e-4)

    # kept-count binomial band for the reference output...
    kept_nonvar = sum(1 for l in want if l.count("\t") == 3)
    mean = n_nonvar * our_ratio
    sigma = math.sqrt(max(mean * (1 - our_ratio), 1.0))
    assert abs(kept_nonvar - mean) < 6 * sigma + 1
    # ...and for ours
    arrays = build_pileup_train_arrays(
        batch, truth, max_non_variant_ratio=R,
        rng=np.random.default_rng(5), shuffle=False)
    ours_nonvar = int((~arrays.is_variant).sum())
    assert abs(ours_nonvar - mean) < 6 * sigma + 1
