"""Haplotype featurizer and group selection vs reference oracles.

The reference modules are pure-Python enough to import directly as test
oracles (with a stub for the absent `tables` package) — we run *their*
functions on the same inputs and compare.
"""
import sys
import types

import numpy as np
import pytest
import jax.numpy as jnp

from nanosnp_tpu import constants as C
from nanosnp_tpu.features.haplotype import (
    build_groups,
    chunk_groups,
    collect_sites,
    haplotype_features,
    haplotype_features_numpy,
    ref_window_codes,
)

REF_HAPLO = "/root/reference/HaplotypeModel"


def _import_reference_dataset_dev():
    if "tables" not in sys.modules:
        sys.modules["tables"] = types.ModuleType("tables")  # never used by the fns we call
    if REF_HAPLO not in sys.path:
        sys.path.insert(0, REF_HAPLO)
    import dataset_dev  # noqa
    return dataset_dev


def _import_reference_select():
    if REF_HAPLO not in sys.path:
        sys.path.insert(0, REF_HAPLO)
    import select_hetesnp_homosnp  # noqa
    return select_hetesnp_homosnp


def _random_read_matrices(rng, n, d, L):
    seq = rng.choice([0, 1, 2, 3, 4, -1], size=(n, d, L),
                     p=[0.1, 0.2, 0.2, 0.2, 0.2, 0.1]).astype(np.int32)
    baseq = rng.integers(0, 60, size=(n, d, L)).astype(np.int32)
    mapq = rng.integers(0, 60, size=(n, d, L)).astype(np.int32)
    hap = rng.choice([0, 1, 2, 3], size=(n, d, L)).astype(np.int32)
    # depth padding: last few rows of some sites
    for s in range(n):
        pad = rng.integers(0, d // 2)
        if pad:
            seq[s, d - pad:] = -2
            baseq[s, d - pad:] = -2
            mapq[s, d - pad:] = -2
            hap[s, d - pad:] = -2
    return seq, baseq, mapq, hap


def test_featurizer_matches_reference_get_frequency_feature(rng):
    dd = _import_reference_dataset_dev()
    n, d, L = 6, 24, 11
    seq, baseq, mapq, hap = _random_read_matrices(rng, n, d, L)
    ref_codes = rng.integers(0, 5, size=(n, L)).astype(np.float32)

    got = np.asarray(haplotype_features(
        jnp.asarray(seq, jnp.float32), jnp.asarray(baseq, jnp.float32),
        jnp.asarray(mapq, jnp.float32), jnp.asarray(hap, jnp.float32),
        jnp.asarray(ref_codes)))

    for s in range(n):
        want = dd.get_frequency_feature(seq[s], baseq[s], mapq[s], hap[s])  # [104, L]
        want = np.concatenate([want, ref_codes[s][None, :]], axis=0)        # [105, L]
        np.testing.assert_allclose(got[s], want.T, rtol=2e-5, atol=2e-4)


def test_featurizer_numpy_oracle_agrees(rng):
    n, d, L = 4, 16, 33
    seq, baseq, mapq, hap = _random_read_matrices(rng, n, d, L)
    ref_codes = rng.integers(0, 5, size=(n, L)).astype(np.float32)
    want = haplotype_features_numpy(seq, baseq, mapq, hap, ref_codes)
    got = np.asarray(haplotype_features(
        jnp.asarray(seq, jnp.float32), jnp.asarray(baseq, jnp.float32),
        jnp.asarray(mapq, jnp.float32), jnp.asarray(hap, jnp.float32),
        jnp.asarray(ref_codes)))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-4)


def _make_vcf(rows):
    header = ["##fileformat=VCFv4.3\n",
              "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tSample\n"]
    lines = []
    for ctg, pos, ref, alt, qual, zy in rows:
        lines.append(f"{ctg}\t{pos}\t.\t{ref}\t{alt}\t{qual}\t"
                     f"PASS\t.\tGT:GQ:DP:AF\t{zy}:{int(qual)}:30:0.4\n")
    return header + lines


def test_group_selection_matches_reference(rng):
    sel = _import_reference_select()
    # random VCF: mix of het/homo with varied quals over two contigs
    rows = []
    for ctg in ["chr1", "chr2"]:
        pos = np.cumsum(rng.integers(50, 500, size=300)) + 1000
        for p in pos:
            zy = rng.choice(["0/1", "1/1", "0/0"], p=[0.6, 0.3, 0.1])
            qual = float(np.round(rng.uniform(2, 40), 2))
            ref, alt = "A", "C"
            rows.append((ctg, int(p), ref, alt, qual, zy))
    vcf = _make_vcf(rows)

    # reference path: contig_dict + find_adjacent_sites per single contig
    # (one contig per call, as production does via one-contig worker chunks)
    from collections import defaultdict
    contig_dict = defaultdict(dict)
    for line in vcf:
        if line[0] == "#":
            continue
        colz = line.split()
        gt = colz[9].split(":")[0].replace("|", "/")
        q = float(colz[5])
        if (gt == "0/0" and q >= 19) or (gt == "1/1" and q >= 19):
            continue
        contig_dict[colz[0]][int(colz[1])] = (gt, q)

    sites = collect_sites(vcf, quality_threshold=19)
    for ctg in ["chr1", "chr2"]:
        want_groups = sel.find_adjacent_sites(contig_dict, [ctg], 5, 19, 14)[ctg]
        want = np.array([[int(it.position) for it in g] for g in want_groups],
                        dtype=np.int64).reshape(-1, 11) if want_groups else np.zeros((0, 11), np.int64)
        got = build_groups(sites[ctg], 5, 19, 14)
        np.testing.assert_array_equal(got, want)


def test_chunk_groups_breaks_on_gap():
    groups = np.array([[10 * i + j for j in range(11)] for i in range(5)],
                      dtype=np.int64)
    groups[3:] += 10_000  # big gap between group 2 and 3
    chunks = chunk_groups(groups, chunk=100, gap=1000)
    assert [len(c) for c in chunks] == [3, 2]
    chunks = chunk_groups(groups, chunk=2, gap=1000)
    assert [len(c) for c in chunks] == [2, 1, 2]


def test_ref_window_codes():
    seq = np.frombuffer(b"ACGTNacgt", dtype=np.uint8).copy()
    codes = ref_window_codes(seq, np.array([2]), 2)  # window around pos 2: A C G T N
    np.testing.assert_array_equal(codes[0], [0, 1, 2, 3, 4])  # pos0 OOB->0? no:
    # centers=2 (1-based 'C'), flank 2 -> positions 0..4 -> A C G T N -> 1 2 3 4 0
    codes = ref_window_codes(seq, np.array([3]), 2)
    np.testing.assert_array_equal(codes[0], [1, 2, 3, 4, 0])
