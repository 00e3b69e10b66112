"""Native C++ parser vs NumPy oracle vs reference binary."""
import numpy as np
import pytest

from conftest import needs_oracle
from synth import random_genome, random_mpileup

from nanosnp_tpu.features.pileup import (
    assemble_windows,
    parse_mpileup_text,
    tensor_lines,
)
from nanosnp_tpu.io.fasta import FastaReference, write_fasta

native = pytest.importorskip("nanosnp_tpu.io.native")


def _cases():
    for seed in range(30, 36):
        rng = np.random.default_rng(seed)
        genome = random_genome(rng, {"chrN": 600})
        lines = random_mpileup(
            rng, "chrN", genome["chrN"],
            coverage=int(rng.integers(5, 50)),
            alt_rate=float(rng.uniform(0.05, 0.35)),
            gap_rate=float(rng.uniform(0, 0.05)))
        yield genome, lines


def test_native_matches_numpy_oracle():
    for genome, lines in _cases():
        seq = np.frombuffer(genome["chrN"].encode(), dtype=np.uint8).copy()
        want = parse_mpileup_text(lines, "chrN", seq)
        text = ("\n".join(lines) + "\n").encode()
        got = native.parse_mpileup_native(text, "chrN", seq, n_threads=4)
        np.testing.assert_array_equal(got.positions, want.positions)
        np.testing.assert_array_equal(got.counts, want.counts)
        np.testing.assert_array_equal(got.depths, want.depths)
        np.testing.assert_array_equal(got.is_candidate, want.is_candidate)
        np.testing.assert_allclose(got.afs, want.afs, rtol=1e-12)
        assert got.alt_info == want.alt_info


def test_native_simd_boundary_cases():
    """Adversarial base strings for the AVX-512 bulk scan (r4): runs
    landing exactly on/around the 64-byte block boundary, structural
    chars ('^', '+', '-') as first/last byte, '^' whose mapq byte is a
    structural char, indel seqs straddling the block edge. The numpy
    oracle is the ground truth."""
    seq = np.frombuffer(b"ACGTACGTACGTACGTACGT" * 3, dtype=np.uint8).copy()

    def row(bases):
        quals = "I" * 1  # qual column content is ignored by the parser
        return f"chrN\t3\tG\t{len(bases)}\t{bases}\t{quals}"

    cases = [
        "A" * 63, "A" * 64, "A" * 65, "a" * 127, "C" * 128, "g" * 129,
        "A" * 63 + "^KA", "A" * 64 + "^KA", "A" * 62 + "^^A",
        "^K" + "T" * 64, "A" * 63 + "^",            # dangling ^ at end
        "A" * 60 + "+4ACGT" + "c" * 64,             # indel at the edge
        "A" * 63 + "-2AC" + "T" * 63,
        "+3ACG" + "A" * 64,                          # structural first
        "A" * 64 + "+1C",                            # structural last
        "A" * 31 + "*#" + "t" * 31,                  # star/pound counted
        "N" * 64 + "A" * 64,                         # ignored chars bulk
        "$" * 64 + "G" * 5,                          # '$' benign bulk
        "A" * 64 + "^+A",  # mapq byte is '+': must be skipped, not indel
        "A" * 64 + "^-A",
    ]
    lines = [row(b) for b in cases]
    # unique positions per row so every case becomes its own output row
    lines = [l.replace("\t3\t", f"\t{3 + i}\t", 1)
             for i, l in enumerate(lines)]
    want = parse_mpileup_text(lines, "chrN", seq)
    text = ("\n".join(lines) + "\n").encode()
    for nt in (1, 4):
        got = native.parse_mpileup_native(text, "chrN", seq, n_threads=nt)
        np.testing.assert_array_equal(got.positions, want.positions)
        np.testing.assert_array_equal(got.counts, want.counts)
        np.testing.assert_array_equal(got.depths, want.depths)
        np.testing.assert_array_equal(got.is_candidate, want.is_candidate)
        assert got.alt_info == want.alt_info


@needs_oracle
def test_native_tensor_lines_match_reference(tmp_path):
    from test_pileup_features import _run_reference_tensor

    rng = np.random.default_rng(99)
    genome = random_genome(rng, {"chrZ": 900})
    fasta = tmp_path / "ref.fa"
    write_fasta(str(fasta), genome)
    lines = random_mpileup(rng, "chrZ", genome["chrZ"], coverage=25,
                           alt_rate=0.15, gap_rate=0.02)
    want = _run_reference_tensor(tmp_path, fasta, "chrZ", lines)

    ref = FastaReference(str(fasta))
    seq = ref.contig("chrZ")
    text = ("\n".join(lines) + "\n").encode()
    pile = native.parse_mpileup_native(text, "chrZ", seq, n_threads=4)
    got = tensor_lines(assemble_windows(pile, seq))
    assert got == want


def test_native_bed_mask():
    genome, lines = next(iter(_cases()))
    seq = np.frombuffer(genome["chrN"].encode(), dtype=np.uint8).copy()
    bed = np.zeros(len(seq), dtype=bool)
    bed[100:400] = True
    want = parse_mpileup_text(lines, "chrN", seq, bed_mask=bed)
    text = ("\n".join(lines) + "\n").encode()
    got = native.parse_mpileup_native(text, "chrN", seq, bed_mask=bed)
    np.testing.assert_array_equal(got.positions, want.positions)
    np.testing.assert_array_equal(got.counts, want.counts)
    assert got.alt_info == want.alt_info
