"""v2 columnar pileup shards: storage round-trip, v1 back-compat, and the
s2 on-device window gather (run_pileup_columnar) vs the dense predictor."""
import numpy as np
import pytest

from synth import random_genome, random_mpileup

from nanosnp_tpu.config import PipelineConfig
from nanosnp_tpu.features.pileup import assemble_windows, predict_batch, \
    predict_inputs
from nanosnp_tpu.io import bins
from nanosnp_tpu.io.fasta import FastaReference, write_fasta
from nanosnp_tpu.io.native import parse_mpileup_native


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("colshard")
    rng = np.random.default_rng(11)
    genome = random_genome(rng, {"chrC": 30_000})
    fasta = tmp / "ref.fa"
    write_fasta(str(fasta), genome)
    ref = FastaReference(str(fasta))
    seq = ref.contig("chrC")
    lines = random_mpileup(rng, "chrC", genome["chrC"], coverage=25,
                           alt_rate=0.08, gap_rate=0.01)
    pile = parse_mpileup_native(("\n".join(lines) + "\n").encode(),
                                "chrC", seq)
    return dict(tmp=tmp, seq=seq, pile=pile)


def test_columnar_matrix_matches_dense_gather(world):
    """CandidateBatch.matrix (lazy gather from columns) must equal an
    independent dense reconstruction row by row."""
    batch = assemble_windows(world["pile"], world["seq"])
    assert len(batch) > 20
    assert batch.columns is not None
    p = world["pile"].positions
    # independent dense oracle: locate each candidate's rows by genomic
    # position in the original parse arrays
    pos_to_row = {int(x): i for i, x in enumerate(p)}
    for k in (0, 1, len(batch) // 2, len(batch) - 1):
        c = int(batch.positions[k])
        rows = [pos_to_row[c + d] for d in range(-16, 17)]
        want = world["pile"].counts[rows]
        np.testing.assert_array_equal(batch.matrix[k], want)
    # center counts shortcut == dense center column
    np.testing.assert_array_equal(batch.center_counts,
                                  batch.matrix[:, 16, :])


def test_predict_batch_matches_predict_inputs(world):
    batch = assemble_windows(world["pile"], world["seq"])
    mat, pos, refs = predict_inputs(batch)
    fb = predict_batch(batch)
    np.testing.assert_array_equal(fb.positions, pos)
    np.testing.assert_array_equal(np.asarray(fb.ref_seqs, "S"), refs)
    np.testing.assert_array_equal(fb.matrix, mat)


def test_shard_roundtrip_v2_and_v1_compat(world, tmp_path):
    batch = predict_batch(assemble_windows(world["pile"], world["seq"]))
    shard = bins.PileupShard(
        contig="chrC", positions=batch.positions,
        ref_seqs=np.asarray(batch.ref_seqs, "S33"),
        alt_info=np.asarray([a.encode() for a in batch.alt_info], "S"),
        columns=batch.columns, cand_off=batch.cand_off, flank=16)
    p2 = tmp_path / "v2.npz"
    bins.save_pileup_shard(str(p2), shard)
    r2 = bins.load_pileup_shard(str(p2))
    assert r2.columns is not None and r2.flank == 16
    np.testing.assert_array_equal(r2.matrix, shard.matrix)
    np.testing.assert_array_equal(r2.positions, shard.positions)

    # v1 (dense) shard written by older code must still load
    v1 = bins.PileupShard(
        contig="chrC", positions=shard.positions, matrix=shard.matrix,
        ref_seqs=np.asarray(batch.ref_seqs, "S33"),
        alt_info=np.asarray([a.encode() for a in batch.alt_info], "S"))
    p1 = tmp_path / "v1.npz"
    bins.save_pileup_shard(str(p1), v1)
    r1 = bins.load_pileup_shard(str(p1))
    assert r1.columns is None
    np.testing.assert_array_equal(r1.matrix, shard.matrix)
    np.testing.assert_array_equal(r1.center_counts, shard.center_counts)

    # v2 stores exactly the union of the candidate windows' columns —
    # verify the count against an independent interval-union computation,
    # and that it strictly undercuts the dense [N,33,18] tensor.
    cov = set()
    for c in np.asarray(shard.positions, np.int64):
        cov.update(range(int(c) - 16, int(c) + 17))
    assert shard.columns.shape[0] == len(cov)
    assert shard.columns.nbytes < shard.matrix.nbytes


def test_run_pileup_columnar_matches_dense_predictor(world):
    """The on-device gather path must produce the same probabilities as the
    dense BatchedPredictor on the production checkpoint, across unit
    boundaries (forced tiny unit bucket via monkeypatch is unnecessary:
    one unit suffices for equality; multi-unit covered by batch tail)."""
    import jax
    import jax.numpy as jnp

    from nanosnp_tpu.models.convert import load_pileup_checkpoint
    from nanosnp_tpu.runtime import stages

    cfg = PipelineConfig()
    cfg.inference.batch_size = 256   # force several batches + tail pad
    params = jax.tree.map(jnp.asarray, load_pileup_checkpoint(
        "/root/reference/PileupModel/models/ont_pileup.chkpt"))
    batch = predict_batch(assemble_windows(world["pile"], world["seq"]))
    shard = bins.PileupShard(
        contig="chrC", positions=batch.positions,
        ref_seqs=np.asarray(batch.ref_seqs, "S33"),
        alt_info=np.asarray([a.encode() for a in batch.alt_info], "S"),
        columns=batch.columns, cand_off=batch.cand_off, flank=16)
    gt_c, zy_c = stages.run_pileup_columnar(cfg, params, shard)
    pred = stages.pileup_model_predictor(cfg, params)
    gt_d, zy_d = pred.run(shard.matrix.astype(np.int16, copy=False))
    assert gt_c.shape == gt_d.shape and zy_c.shape == zy_d.shape
    np.testing.assert_allclose(gt_c, gt_d, atol=2e-6)
    np.testing.assert_allclose(zy_c, zy_d, atol=2e-6)


def test_shard_codec_zstd_roundtrip_and_fallback(tmp_path, monkeypatch):
    """r5 shard container: zstd-wrapped stored-npz by default (sniffed by
    magic, ~20x faster inflate than deflate), NSP_SHARD_CODEC=deflate
    restores a plain np.load-able zip; both roundtrip identically and
    load through the same open_npz."""
    import numpy as np

    from nanosnp_tpu.io import bins

    rng = np.random.default_rng(5)
    shard = bins.PileupShard(
        "chrC", positions=np.arange(50, dtype=np.int64) + 100,
        ref_seqs=np.array([b"A" * 33] * 50, dtype="S33"),
        alt_info=np.array([b"9-X"] * 50, dtype="S"),
        columns=rng.integers(-9, 9, (120, 18)).astype(np.int16),
        cand_off=np.arange(50, dtype=np.int64) + 20, flank=16)
    pz = tmp_path / "z.npz"
    bins.save_pileup_shard(str(pz), shard)
    assert open(pz, "rb").read(4) == bins._ZSTD_MAGIC
    back = bins.load_pileup_shard(str(pz))
    np.testing.assert_array_equal(back.columns, shard.columns)
    np.testing.assert_array_equal(back.positions, shard.positions)

    monkeypatch.setenv("NSP_SHARD_CODEC", "deflate")
    pd_ = tmp_path / "d.npz"
    bins.save_pileup_shard(str(pd_), shard)
    assert open(pd_, "rb").read(2) == b"PK"
    legacy = np.load(str(pd_))               # plain numpy can read it
    np.testing.assert_array_equal(legacy["columns"], shard.columns)
    back2 = bins.load_pileup_shard(str(pd_))  # and open_npz handles both
    np.testing.assert_array_equal(back2.positions, shard.positions)
