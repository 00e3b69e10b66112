"""Legacy edge/pair-route features (SURVEY section 2.6): vectorized counts
vs a direct per-read loop oracle, and the s4 coverage-drop alignment
regression uncovered while wiring the legacy extractor."""
import numpy as np
import pytest

from bamgen import write_bam, random_reads
from synth import random_genome
from nanosnp_tpu.io.fasta import write_fasta
from nanosnp_tpu.legacy.edges import (EDGE_LABELS, edge_transition_counts,
                                      pad_depth, pair_route_counts)

ALPHA = {1: 0, 2: 1, 3: 2, 4: 3, -1: 4}


def _edge_oracle(reads):
    """Straight port of the reference's per-row loop semantics
    (extract_adjacent_pileup.py:223-234), written independently."""
    reads = np.asarray(reads)
    out = np.zeros((25, reads.shape[1] - 1), dtype=np.int64)
    for row in reads:
        for j in range(len(row) - 1):
            s, t = int(row[j]), int(row[j + 1])
            if s in ALPHA and t in ALPHA:
                out[ALPHA[s] * 5 + ALPHA[t], j] += 1
    return out


def _pair_oracle(reads):
    reads = np.asarray(reads)
    p = reads.shape[1]
    center = p // 2
    out = np.zeros((25, p - 1), dtype=np.int64)
    col = 0
    for j in range(p):
        if j == center:
            continue
        for row in reads:
            s, t = int(row[j]), int(row[center])
            if s in ALPHA and t in ALPHA:
                out[ALPHA[s] * 5 + ALPHA[t], col] += 1
        col += 1
    return out


def test_edge_labels_order():
    # reference: product('ACGTD','ACGTD') -> AA, AC, ..., DD
    assert EDGE_LABELS[0] == "AA" and EDGE_LABELS[1] == "AC"
    assert EDGE_LABELS[4] == "AD" and EDGE_LABELS[24] == "DD"
    assert len(EDGE_LABELS) == 25


def test_edge_and_pair_counts_match_oracle_fuzz():
    rng = np.random.default_rng(11)
    for _ in range(25):
        r = int(rng.integers(0, 40))
        p = int(rng.integers(3, 13)) | 1  # odd widths like the real groups
        reads = rng.choice([-2, -1, 0, 1, 2, 3, 4], size=(r, p),
                           p=[.1, .1, .2, .15, .15, .15, .15])
        np.testing.assert_array_equal(edge_transition_counts(reads),
                                      _edge_oracle(reads))
        np.testing.assert_array_equal(pair_route_counts(reads),
                                      _pair_oracle(reads))


def test_edge_counts_empty_and_shape():
    assert edge_transition_counts(np.zeros((0, 11))).shape == (25, 10)
    assert pair_route_counts(np.zeros((0, 11))).shape == (25, 10)
    full = edge_transition_counts(np.full((7, 5), 1))
    assert full[0].sum() == 7 * 4 and full.sum() == 7 * 4


def test_pad_depth_truncates_and_pads():
    mats = [np.ones((3, 5), np.int32), np.ones((9, 5), np.int32)]
    out = pad_depth(mats, 6)
    assert out.shape == (2, 6, 5)
    assert (out[0, 3:] == -2).all() and (out[1] == 1).all()


def test_extractor_coverage_drop_keeps_alignment(tmp_path):
    """When a group touches an over-covered position the extractor drops
    it; the packed shard's positions must track the KEPT groups, not the
    requested chunk (regression: stages._pack_haplotype_shard previously
    used the full chunk)."""
    from nanosnp_tpu.config import PipelineConfig
    from nanosnp_tpu.runtime import stages
    from nanosnp_tpu.runtime.extract import NativeBamExtractor

    rng = np.random.default_rng(5)
    genome = random_genome(rng, {"chrC": 2400})
    write_fasta(str(tmp_path / "ref.fa"), genome)
    # uniform background + a huge coverage spike over [1200, 1400]
    reads = random_reads(rng, genome["chrC"], 0, n_reads=120, read_len=200,
                         with_hp=True)
    spike = random_reads(rng, genome["chrC"][1200:1400], 0, n_reads=400,
                         read_len=150, with_hp=True)
    for r in spike:
        r.start0 += 1200
    reads += spike
    write_bam(str(tmp_path / "c.bam"), [("chrC", 2400)], reads)

    ext = NativeBamExtractor({"chrC": str(tmp_path / "c.bam")},
                             max_coverage=60)
    groups = np.array([
        np.arange(300, 311),     # calm region: kept
        np.arange(1290, 1301),   # spiked region: dropped
        np.arange(1800, 1811),   # calm region: kept
    ])
    mats = ext("chrC", groups, 5)
    ext.close()
    assert mats is not None
    kept = mats["groups"]
    assert len(kept) == 2 and 1295 not in kept[:, 5]
    assert len(mats["haplotype"]) == len(kept)

    hf = PipelineConfig().haplotype_feature
    shard = stages._pack_haplotype_shard("chrC", mats.get("groups", groups),
                                         mats, hf)
    assert shard is not None
    assert len(shard.candidate_positions) == len(shard.pileup["sequences"])
    np.testing.assert_array_equal(shard.candidate_positions, kept[:, 5])
