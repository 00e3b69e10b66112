"""Vectorized two-path heuristic vs the reference's pandas parse_graph
(heuristic.py:18-98), plus constructed het/homo semantics."""
import sys
import types

import numpy as np
import pytest

from nanosnp_tpu.legacy.edges import EDGE_LABELS
from nanosnp_tpu.legacy.heuristic import (call_homozygous, run_heuristic,
                                          two_path_center_nodes)

REF_DIR = "/root/reference/HaplotypeModel"


def _oracle_parse_graph(mat):
    """Scalar re-statement of the reference parse_graph semantics
    (heuristic.py:18-73). The reference code itself crashes on modern
    pandas (Series[0] positional access was removed in pandas 2.x — one
    more marker of this path's vestigiality), so the oracle is this
    direct per-candidate greedy with the same rules."""
    def weight(s, t, j):
        return mat[s * 5 + t, j]

    # first link: two heaviest non-deletion edges (ties: label order)
    best = sorted(((weight(s, t, 0), -(s * 4 + t), s, t)
                   for s in range(4) for t in range(4)), reverse=True)
    (w0, _, s0, t0), (w1, _, s1, t1) = best[0], best[1]
    if w1 == 0:
        s1, t1 = s0, t0
    path = [(s0, s1), (t0, t1)]
    n0, n1 = t0, t1
    for j in range(1, mat.shape[1]):
        if n0 == n1:
            outs = sorted(((weight(n0, t, j), -t, t) for t in range(4)),
                          reverse=True)
            n0, n1 = outs[0][2], outs[1][2]
        else:
            n0 = max(range(4), key=lambda t: (weight(n0, t, j), -t))
            n1 = max(range(4), key=lambda t: (weight(n1, t, j), -t))
        path.append((n0, n1))
    return path


def _oracle_center_equal(mat):
    """Reference run() core for one candidate (heuristic.py:80-95):
    forward pass, then reversed columns with transposed edges."""
    path = _oracle_parse_graph(mat)
    s = np.arange(25) // 5
    t = np.arange(25) % 5
    mat_rev = mat[t * 5 + s, :][:, ::-1]
    path2 = _oracle_parse_graph(mat_rev)
    return (path[5][0] == path[5][1]) or (path2[5][0] == path2[5][1])


def test_heuristic_matches_scalar_oracle_fuzz():
    rng = np.random.default_rng(31)
    mats = []
    for _ in range(60):
        # tie-free weights: tie order is the one documented divergence
        m = rng.permutation(25 * 10).reshape(25, 10).astype(np.float64)
        m += rng.random((25, 10))
        mats.append(m)
    # plus sparse integer-count matrices (zeros everywhere but a few paths)
    for _ in range(60):
        m = np.zeros((25, 10))
        for j in range(10):
            for _k in range(int(rng.integers(1, 4))):
                s, t = rng.integers(0, 4, 2)
                m[s * 5 + t, j] += 10 + rng.random()  # distinct weights
        mats.append(m)
    mats = np.stack(mats)
    got = call_homozygous(mats)
    want = np.array([_oracle_center_equal(m) for m in mats])
    np.testing.assert_array_equal(got, want)


def _path_matrix(pairs_per_link):
    """Build [25, links] counts from per-link lists of (s, t, weight)."""
    m = np.zeros((25, len(pairs_per_link)))
    for j, pairs in enumerate(pairs_per_link):
        for s, t, w in pairs:
            m[s * 5 + t, j] = w
    return m


def test_constructed_het_and_homo_calls():
    # "homozygous at center": two haplotype paths (A... and C...) whose
    # link-4 edges both converge on G at the center position
    flank = [(0, 0, 15.0), (1, 1, 14.0)]
    into_center = [(0, 2, 15.0), (1, 2, 14.0)]
    out_center = [(2, 0, 15.0), (2, 1, 14.0)]
    homo = _path_matrix([flank] * 4 + [into_center] + [out_center]
                        + [flank] * 4)[None]
    # heterozygous: two strong disjoint paths A..A and C..C throughout
    het = _path_matrix([flank] * 10)[None]
    assert call_homozygous(homo)[0]
    assert not call_homozygous(het)[0]
    centers = two_path_center_nodes(np.concatenate([homo, het]))
    assert centers[0, 0] == centers[0, 1] == 2
    assert sorted(centers[1]) == [0, 1]


def test_run_heuristic_emits_positions():
    flank = [(0, 0, 5.5), (3, 3, 5.0)]
    homo = _path_matrix([flank] * 4 + [[(0, 2, 5.5), (3, 2, 5.0)]]
                        + [[(2, 0, 5.5), (2, 3, 5.0)]] + [flank] * 4)
    het = _path_matrix([flank] * 10)
    out = run_heuristic(np.stack([homo, het]), ["chr1:100", "chr1:200"])
    assert out == ["chr1:100"]


def _pair_route_oracle(mat):
    """Scalar restatement of heuristic_pair_route.py:28-61."""
    links = mat.shape[1]
    homo = het = 0
    for j in range(links):
        per_source = []
        for s in range(4):
            vals = [mat[s * 5 + t, j] for t in range(4)]
            best_t = int(np.argmax(vals))
            per_source.append((vals[best_t], best_t))
        order = sorted(range(4), key=lambda s: (-per_source[s][0], s))
        a1 = per_source[order[0]][1]
        a2 = per_source[order[1]][1]
        if a1 == a2:
            homo += 1
        else:
            het += 1
    return homo >= het


def test_pair_route_matches_scalar_oracle_fuzz():
    from nanosnp_tpu.legacy.heuristic import call_homozygous_pair_route

    rng = np.random.default_rng(41)
    mats = []
    for _ in range(80):
        m = rng.permutation(25 * 10).reshape(25, 10).astype(np.float64)
        m += rng.random((25, 10))  # tie-free
        mats.append(m)
    mats = np.stack(mats)
    got = call_homozygous_pair_route(mats)
    want = np.array([_pair_route_oracle(m) for m in mats])
    np.testing.assert_array_equal(got, want)


def test_pair_route_constructed():
    from nanosnp_tpu.legacy.heuristic import call_homozygous_pair_route

    # both heavy sources (A and C) vote center base G in every column
    agree = _path_matrix([[(0, 2, 9.0), (1, 2, 8.0), (3, 1, 1.0)]] * 10)
    # heavy sources vote different centers everywhere
    split = _path_matrix([[(0, 0, 9.0), (1, 1, 8.0)]] * 10)
    got = call_homozygous_pair_route(np.stack([agree, split]))
    assert got[0] and not got[1]
