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


def test_train_h5_reference_layout_roundtrip(tmp_path):
    """Reference-layout HDF5 train bin (make_bin_train_data.py schema):
    dataset names/shapes/dtypes match the reference TrainDataset contract
    and the arrays round-trip losslessly."""
    import h5py

    rng = np.random.default_rng(3)
    n = 7
    label = np.zeros((n, 90), dtype=np.int32)
    gt = rng.integers(0, 10, n)
    zy = rng.integers(0, 3, n)
    label[np.arange(n), gt] = 1
    label[np.arange(n), 21 + zy] = 1
    label[:, 24] = 1
    label[:, 57] = 1
    arrays = D.PileupTrainArrays(
        rng.integers(-20, 20, (n, 33, 18)).astype(np.int32),
        label,
        np.arange(100, 100 + n, dtype=np.int64),
        zy > 0,
        contig="chrT",
        ref_seqs=np.asarray([b"ACGTACGTACGTACGTAACGTACGTACGTACGT"] * n,
                            dtype="S33"),
        alt_info=np.asarray([f"12-XA 3 ".encode()] * n, dtype="S"),
    )
    p = str(tmp_path / "chrT.bin")
    bins.save_pileup_train_h5(p, arrays)

    with h5py.File(p, "r") as f:
        # the exact contract PileupModel/dataset.py:75-80 reads
        assert set(f.keys()) == {"position_matrix", "position", "label",
                                 "alt_info"}
        assert f["position_matrix"].shape == (n, 33, 18)
        assert f["position_matrix"].dtype == np.int32
        assert f["position"].shape == (n, 1)
        assert f["position"].dtype == np.dtype("S83")
        assert f["label"].shape == (n, 90)
        assert f["alt_info"].dtype == np.dtype("S5000")

    back = bins.load_pileup_train_h5(p)
    np.testing.assert_array_equal(back.matrix, arrays.matrix)
    np.testing.assert_array_equal(back.label, arrays.label)
    np.testing.assert_array_equal(back.positions, arrays.positions)
    np.testing.assert_array_equal(back.is_variant, arrays.is_variant)
    assert back.contig == "chrT"
    dec_a = D.decode_90dim_labels(arrays.label)
    dec_b = D.decode_90dim_labels(back.label)
    for k in dec_a:
        np.testing.assert_array_equal(dec_a[k], dec_b[k])


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


def test_haplotype_train_h5_layout(tmp_path):
    """Reference make_train_bins layout: shard h5 + candidate_labels [N,3]."""
    import h5py

    rng = np.random.default_rng(9)
    n, dp, dh = 6, 8, 5
    cand = np.arange(100, 100 + n * 30, 30, dtype=np.int64)
    shard = bins.HaplotypeShard(
        contig="c",
        candidate_positions=cand,
        group_positions=np.stack([cand + d for d in range(-5, 6)], axis=1),
        pileup={k: rng.integers(-2, 5, (n, dp, 33)).astype(np.int32)
                for k in bins._KEYS},
        haplotype={k: rng.integers(-2, 5, (n, dh, 11)).astype(np.int32)
                   for k in bins._KEYS},
    )
    labels = np.stack([np.ones(n), rng.integers(0, 10, n),
                       rng.integers(0, 3, n)], axis=1).astype(np.int64)
    p = str(tmp_path / "t.bin")
    bins.save_haplotype_shard_h5(p, shard, candidate_labels=labels)
    with h5py.File(p, "r") as f:
        assert "candidate_labels" in f
        assert f["candidate_labels"].shape == (n, 3)
        np.testing.assert_array_equal(np.asarray(f["candidate_labels"]),
                                      labels)
    # predict-layout loader ignores the labels gracefully
    back = bins.load_haplotype_shard_h5(p)
    np.testing.assert_array_equal(back.candidate_positions, cand)
