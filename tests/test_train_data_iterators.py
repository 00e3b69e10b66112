"""haplotype_train_iterator + train-array persistence."""
import numpy as np

from nanosnp_tpu.io import bins
from nanosnp_tpu.train import data as D


def test_train_array_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    arrays = D.PileupTrainArrays(
        rng.integers(-20, 20, (9, 33, 18)).astype(np.int32),
        rng.integers(0, 2, (9, 90)).astype(np.int32),
        np.arange(9, dtype=np.int64),
        rng.random(9) > 0.5,
    )
    p = tmp_path / "t.npz"
    D.save_train_arrays(str(p), arrays)
    back = D.load_train_arrays(str(p))
    np.testing.assert_array_equal(back.matrix, arrays.matrix)
    np.testing.assert_array_equal(back.label, arrays.label)


def test_haplotype_train_iterator(tmp_path):
    rng = np.random.default_rng(1)
    n, dp, dh = 40, 12, 10
    cand = np.arange(100, 100 + n, dtype=np.int64)
    shard = bins.HaplotypeShard(
        contig="c",
        candidate_positions=cand,
        group_positions=np.stack([cand + d for d in range(-5, 6)], axis=1),
        pileup={k: rng.integers(-2, 5, (n, dp, 33)).astype(np.int32)
                for k in bins._KEYS},
        haplotype={k: rng.integers(-2, 5, (n, dh, 11)).astype(np.int32)
                   for k in bins._KEYS},
    )
    path = tmp_path / "s.npz"
    bins.save_haplotype_shard(str(path), shard)

    # truth: all confident; half refcall (zy -1), half variant (zy 2)
    L = 400
    truth = np.zeros((L, 3), dtype=np.int64)
    truth[:, 0] = 1
    truth[:, 1] = 4           # gt CC
    truth[:, 2] = -1
    truth[cand[::2] - 1, 2] = 2   # every other candidate is a variant

    seq = np.frombuffer(b"ACGT" * 100, dtype=np.uint8).copy()
    D.set_reference_for_training({"c": seq})
    batches = list(D.haplotype_train_iterator(
        [str(path)], {"c": truth}, batch_size=8,
        rng=np.random.default_rng(2), pn_value=1.0))
    assert batches
    total = sum(len(b["gt"]) for b in batches)
    # variants (20) + ~20 refcalls at pn 1.0, batched by 8
    assert 24 <= total <= 40
    b = batches[0]
    # depths are padded to the iterator's buckets (12 -> 16, 10 -> 16)
    assert b["p_seq"].shape == (8, 16, 33)
    assert b["h_seq"].shape == (8, 16, 11)
    assert b["h_ref"].shape == (8, 11)
    assert set(np.unique(b["zy"])) <= {0, 1, 2}
    # p_ref codes come from the registered reference
    assert b["p_ref"].max() <= 4
