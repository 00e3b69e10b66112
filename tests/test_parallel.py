"""Sharding planner, batched predictor, and shard verifiers."""
import numpy as np
import jax
import jax.numpy as jnp

from nanosnp_tpu.parallel.launch import plan_contig_shards, gather_vcf_shards
from nanosnp_tpu.parallel.inference import BatchedPredictor
from nanosnp_tpu.parallel.mesh import make_mesh


def test_plan_contig_shards_balanced():
    lengths = {f"chr{i}": (25 - i) * 10_000_000 for i in range(1, 23)}
    shards = plan_contig_shards(lengths, 4)
    assert sum(len(s) for s in shards) == 22
    loads = [sum(lengths[c] for c in s) for s in shards]
    assert max(loads) / min(loads) < 1.3
    # deterministic
    assert shards == plan_contig_shards(lengths, 4)
    # single host gets everything in contig order
    one = plan_contig_shards(lengths, 1)[0]
    assert one == [f"chr{i}" for i in range(1, 23)]


def test_gather_vcf_shards(tmp_path):
    a = tmp_path / "a.vcf"
    b = tmp_path / "b.vcf"
    a.write_text("##h\n#CHROM\nchr1\t1\nchr1\t2\n")
    b.write_text("##h\n#CHROM\nchr2\t5\n")
    out = tmp_path / "all.vcf"
    n = gather_vcf_shards([str(a), str(b)], str(out))
    assert n == 3
    lines = out.read_text().splitlines()
    assert lines.count("##h") == 1
    assert lines[-1] == "chr2\t5"


def test_batched_predictor_sharded_8dev():
    mesh = make_mesh()
    assert mesh.devices.size == 8

    def fn(params, x):
        return (x * params["w"]).sum(axis=(1, 2)) + params["b"]

    params = {"w": jnp.float32(2.0), "b": jnp.float32(1.0)}
    pred = BatchedPredictor(fn, params, batch_size=16, mesh=mesh)
    x = np.random.default_rng(0).standard_normal((37, 3, 4)).astype(np.float32)
    (out,) = pred.run(x)
    np.testing.assert_allclose(out, 2.0 * x.sum(axis=(1, 2)) + 1.0, rtol=1e-5)

    # empty input
    assert pred.run(np.zeros((0, 3, 4), np.float32)) == []


def test_batched_predictor_fetch_strides_identical():
    """Device-side fetch batching (r4) must not change results for any
    stride or tail geometry: exact-multiple N, ragged tail, N smaller
    than one stride group, stride 1 (the r3 behavior)."""

    def fn(params, x):
        return (x * 3.0).sum(axis=1), x[:, 0] - 1.0

    pred = BatchedPredictor(fn, None, batch_size=8,
                            mesh=make_mesh())
    rng = np.random.default_rng(5)
    for n in (64, 61, 8, 7, 3, 23):
        x = rng.standard_normal((n, 5)).astype(np.float32)
        want_a, want_b = (x * 3.0).sum(axis=1), x[:, 0] - 1.0
        for stride in (1, 2, 8, 100):
            a, b = pred.run(x, fetch_stride=stride)
            np.testing.assert_allclose(a, want_a, rtol=1e-5,
                                       err_msg=f"n={n} stride={stride}")
            np.testing.assert_allclose(b, want_b, rtol=1e-5)


def test_shard_verifiers(tmp_path):
    from nanosnp_tpu.io import bins
    from nanosnp_tpu.io.verify import verify_haplotype_shard, verify_pileup_shard

    rng = np.random.default_rng(0)
    n = 7
    mat = rng.integers(0, 30, (n, 33, 18)).astype(np.int32)
    mat[:, 16, 0] = -20  # negated A channel
    shard = bins.PileupShard(
        contig="c",
        positions=np.arange(100, 100 + n, dtype=np.int64),
        matrix=mat,
        ref_seqs=np.asarray([b"A" * 33] * n, dtype="S33"),
        alt_info=np.asarray([b"XC 3 "] * n, dtype="S"),
    )
    p = tmp_path / "p.npz"
    bins.save_pileup_shard(str(p), shard)
    rep = verify_pileup_shard(str(p))
    assert rep["samples"] == n and not rep["problems"]

    hshard = bins.HaplotypeShard(
        contig="c",
        candidate_positions=np.arange(10, 10 + n, dtype=np.int64),
        group_positions=np.tile(np.arange(11), (n, 1)) + np.arange(n)[:, None] + 5,
        pileup={k: rng.integers(-2, 5, (n, 9, 33)).astype(np.int32)
                for k in ("sequences", "hap", "baseq", "mapq")},
        haplotype={k: rng.integers(-2, 5, (n, 9, 11)).astype(np.int32)
                   for k in ("sequences", "hap", "baseq", "mapq")},
    )
    hshard.group_positions[:, 5] = hshard.candidate_positions
    hshard.pileup["hap"] = np.clip(hshard.pileup["hap"], -2, 3)
    hshard.haplotype["hap"] = np.clip(hshard.haplotype["hap"], -2, 3)
    hshard.pileup["hap"][hshard.pileup["hap"] == -1] = 0
    hshard.haplotype["hap"][hshard.haplotype["hap"] == -1] = 0
    hp = tmp_path / "h.npz"
    bins.save_haplotype_shard(str(hp), hshard)
    rep = verify_haplotype_shard(str(hp))
    assert rep["samples"] == n and not rep["problems"]
