"""Differential tests: our pileup feature extraction vs the reference C++
binaries (built out-of-tree in /tmp/ref_build as an oracle)."""
import os
import subprocess

import numpy as np
import pytest

from conftest import REFERENCE_BIN, needs_oracle
from synth import random_genome, random_mpileup

from nanosnp_tpu.config import PileupFeatureConfig
from nanosnp_tpu.features.pileup import (
    assemble_windows,
    make_tensor_row,
    parse_mpileup_text,
    predict_inputs,
    tensor_lines,
)
from nanosnp_tpu.io.fasta import FastaReference, write_fasta


def _run_reference_tensor(tmp_path, fasta_path, chrom, mpileup_lines):
    """Run DNA_CreateCanSnpTensor on one chromosome; return .tensor lines."""
    pdir = tmp_path / "chr_pileup"
    odir = tmp_path / "tensor_out"
    pdir.mkdir(exist_ok=True)
    odir.mkdir(exist_ok=True)
    (pdir / f"{chrom}.mpileup").write_text("\n".join(mpileup_lines) + "\n")
    subprocess.run(
        [str(REFERENCE_BIN / "DNA_CreateCanSnpTensor"),
         "-reference", str(fasta_path),
         "-chr_pileup_dir", str(pdir),
         "-output_dir", str(odir),
         "-min_af", "0.12", "-snp_min_af", "0.12", "-indel_min_af", "0.12",
         "-min_coverage", "6", "-flanking_base", "16", "-num_threads", "1",
         chrom],
        check=True, capture_output=True)
    out = (odir / f"{chrom}.tensor").read_text()
    return [l for l in out.split("\n") if l]


@needs_oracle
@pytest.mark.parametrize("seed,coverage,alt_rate,gap_rate", [
    (1, 20, 0.12, 0.01),
    (2, 8, 0.3, 0.05),     # low coverage, many alts/gaps
    (3, 60, 0.05, 0.0),    # high coverage, contiguous
])
def test_tensor_output_matches_reference(tmp_path, seed, coverage, alt_rate, gap_rate):
    rng = np.random.default_rng(seed)
    genome = random_genome(rng, {"chrT": 1200})
    fasta = tmp_path / "ref.fa"
    write_fasta(str(fasta), genome)
    lines = random_mpileup(rng, "chrT", genome["chrT"], coverage=coverage,
                           alt_rate=alt_rate, gap_rate=gap_rate)

    want = _run_reference_tensor(tmp_path, fasta, "chrT", lines)

    ref = FastaReference(str(fasta))
    pile = parse_mpileup_text(lines, "chrT", ref.contig("chrT"),
                              PileupFeatureConfig())
    batch = assemble_windows(pile, ref.contig("chrT"))
    got = tensor_lines(batch)

    assert len(got) == len(want), (len(got), len(want))
    for g, w in zip(got, want):
        assert g == w


@needs_oracle
def test_tensor_many_seeds_fuzz(tmp_path):
    """Broader fuzz across seeds on a smaller contig."""
    for seed in range(10, 16):
        rng = np.random.default_rng(seed)
        genome = random_genome(rng, {"chrF": 400})
        fasta = tmp_path / f"ref{seed}.fa"
        write_fasta(str(fasta), genome)
        lines = random_mpileup(rng, "chrF", genome["chrF"],
                               coverage=int(rng.integers(5, 40)),
                               alt_rate=float(rng.uniform(0.03, 0.4)),
                               gap_rate=float(rng.uniform(0, 0.08)))
        want = _run_reference_tensor(tmp_path, fasta, "chrF", lines)
        ref = FastaReference(str(fasta))
        pile = parse_mpileup_text(lines, "chrF", ref.contig("chrF"))
        got = tensor_lines(assemble_windows(pile, ref.contig("chrF")))
        assert got == want, f"seed {seed}: {len(got)} vs {len(want)} rows"


def test_make_tensor_row_basics():
    """Hand-checked micro-cases of the per-row parser."""
    chr_seq = np.frombuffer(b"ACGTACGTAC", dtype=np.uint8).copy()
    # pos 3 (ref G), 5 forward G, 3 reverse g, 2 forward A mismatch
    counts, alt, depth, af, pass_af, mdl = make_tensor_row(
        "GGGGGgggAA", chr_seq, 3, 0.12, 0.12)
    assert depth == 10
    assert alt == {"XA": 2}
    # negation: fwd ACGT sum = 2 + 5 -> G channel := -7; rev g -> -3
    assert counts[2] == -7 and counts[11] == -3
    assert counts[0] == 2  # A fwd
    assert pass_af  # A freq 0.2 >= 0.12
    assert af == pytest.approx(0.2)

    # insertion parsing with cap: +70... ignored but skipped correctly
    counts, alt, depth, af, pass_af, mdl = make_tensor_row(
        "A+2CGA" + "A+70" + "C" * 70 + "A", chr_seq, 1, 0.12, 0.12)
    assert depth == 4
    assert alt == {"IACG": 1}
    assert counts[4] == 1 and counts[5] == 1  # I and I1

    # deletion: ref bases follow the position (case preserved from ref)
    counts, alt, depth, af, pass_af, mdl = make_tensor_row(
        "a-2cgA*", chr_seq, 1, 0.12, 0.12)
    assert alt.get("DCG") == 1
    assert mdl == 2
    assert counts[15] == 1 and counts[16] == 1  # d and d1 (reverse strand key 'c')


def test_window_contiguity_gap_drops_candidate():
    """A gap inside a candidate's window must drop it (ring-buffer reset)."""
    rng = np.random.default_rng(42)
    genome = random_genome(rng, {"c": 200})
    seq = np.frombuffer(genome["c"].encode(), dtype=np.uint8).copy()
    lines = random_mpileup(rng, "c", genome["c"], coverage=30, alt_rate=0.0,
                           gap_rate=0.0, start=1, end=120)
    # force a strong candidate at pos 60 (row index 59)
    ref_base = genome["c"][59]
    alt_base = "A" if ref_base.upper() != "A" else "C"
    lines[59] = f"c\t60\t{ref_base}\t20\t{alt_base * 10 + (ref_base.upper() if ref_base.upper() in 'ACGT' else 'N') * 10}\t" + "I" * 20
    pile = parse_mpileup_text(lines, "c", seq)
    assert pile.is_candidate[59]
    batch = assemble_windows(pile, seq)
    assert 60 in batch.positions

    # same data but with a gap at pos 70 (inside right flank)
    lines_gap = [l for l in lines if int(l.split("\t")[1]) != 70]
    pile2 = parse_mpileup_text(lines_gap, "c", seq)
    batch2 = assemble_windows(pile2, seq)
    assert 60 not in batch2.positions


def test_predict_inputs_drop_non_acgt_center():
    rng = np.random.default_rng(7)
    genome = {"c": "ACGT" * 30}
    seq_l = list(genome["c"])
    seq_l[59] = "N"  # center of some window
    genome = {"c": "".join(seq_l)}
    seq = np.frombuffer(genome["c"].encode(), dtype=np.uint8).copy()
    lines = random_mpileup(rng, "c", genome["c"], coverage=30, alt_rate=0.25,
                           gap_rate=0.0)
    pile = parse_mpileup_text(lines, "c", seq)
    batch = assemble_windows(pile, seq)
    mat, pos, refs = predict_inputs(batch)
    assert 60 not in pos  # N-centered dropped
    for r in refs:   # S33 bytes since r3 (vectorized window emission)
        assert r[16:17] in b"ACGT"
        assert r == r.upper()
