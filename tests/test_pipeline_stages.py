"""Integration tests of the pipeline stages over synthetic data."""
import os

import numpy as np
import pytest
import jax

from synth import random_genome
from bamgen import random_reads, simulate_mpileup, write_bam

from nanosnp_tpu.config import PipelineConfig
from nanosnp_tpu.io.fasta import FastaReference, write_fasta
from nanosnp_tpu.io import bins
from nanosnp_tpu.runtime import stages
from nanosnp_tpu.runtime.extract import NativeBamExtractor
from nanosnp_tpu.runtime.pipeline import PipelineRunner, Stage


@pytest.fixture(scope="module")
def synth_world(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("world")
    rng = np.random.default_rng(71)
    genome = random_genome(rng, {"chrW": 3000})
    fasta = tmp / "ref.fa"
    write_fasta(str(fasta), genome)
    reads = random_reads(rng, genome["chrW"], 0, n_reads=400, read_len=200,
                         with_hp=True, mq_range=(10, 60))
    bam = tmp / "sample.bam"
    write_bam(str(bam), [("chrW", 3000)], reads)
    mpileup_lines = simulate_mpileup(genome, {"chrW": reads})
    mdir = tmp / "chr_mpileup"
    mdir.mkdir()
    (mdir / "chrW.mpileup").write_text("\n".join(mpileup_lines) + "\n")
    return dict(tmp=tmp, genome=genome, fasta=str(fasta), bam=str(bam),
                mdir=str(mdir), reads=reads)


def test_s1_bam_matches_s1_text(synth_world, tmp_path):
    cfg = PipelineConfig()
    ref = FastaReference(synth_world["fasta"])
    out_text = tmp_path / "shards_text"
    out_bam = tmp_path / "shards_bam"
    m1 = stages.stage_pileup_features(cfg, ref, synth_world["mdir"],
                                      str(out_text), ["chrW"])
    m2 = stages.stage_pileup_features_from_bam(cfg, ref, synth_world["bam"],
                                               str(out_bam), ["chrW"],
                                               chunk_size=700)
    a = bins.load_pileup_shard(str(out_text / "chrW.npz"))
    b = bins.load_pileup_shard(str(out_bam / "chrW.npz"))
    np.testing.assert_array_equal(a.positions, b.positions)
    np.testing.assert_array_equal(a.matrix, b.matrix)
    np.testing.assert_array_equal(a.ref_seqs, b.ref_seqs)
    np.testing.assert_array_equal(a.alt_info, b.alt_info)
    assert m1["candidates"] == m2["candidates"]
    assert len(a) > 0  # something must be produced for the test to mean much


def test_s1_text_streaming_matches_whole_file(synth_world, tmp_path):
    """Chunked streaming parse (O(chunk) memory) must emit exactly the
    windows the whole-file parse emits, across unit boundaries and gaps."""
    cfg = PipelineConfig()
    ref = FastaReference(synth_world["fasta"])
    out_whole = tmp_path / "whole"
    out_stream = tmp_path / "stream"
    m1 = stages.stage_pileup_features(cfg, ref, synth_world["mdir"],
                                      str(out_whole), ["chrW"],
                                      chunk_bytes=1 << 30)
    # ~4 KB chunks force dozens of carry/boundary handoffs on this world
    m2 = stages.stage_pileup_features(cfg, ref, synth_world["mdir"],
                                      str(out_stream), ["chrW"],
                                      chunk_bytes=4096)
    a = bins.load_pileup_shard(str(out_whole / "chrW.npz"))
    b = bins.load_pileup_shard(str(out_stream / "chrW.npz"))
    assert len(a) > 0
    np.testing.assert_array_equal(a.positions, b.positions)
    np.testing.assert_array_equal(a.matrix, b.matrix)
    np.testing.assert_array_equal(a.ref_seqs, b.ref_seqs)
    np.testing.assert_array_equal(a.alt_info, b.alt_info)
    assert m1["rows"] == m2["rows"]

    # malformed lines sprinkled through the text (incl. near the tiny-chunk
    # boundaries) must not truncate any deferred candidate's flank: the
    # carry counts parseable rows, not raw lines
    dirty_dir = tmp_path / "dirty"
    dirty_dir.mkdir()
    orig = open(os.path.join(synth_world["mdir"], "chrW.mpileup"),
                "rb").read().splitlines(keepends=True)
    rng = np.random.default_rng(5)
    dirty = []
    for i, line in enumerate(orig):
        dirty.append(line)
        if rng.random() < 0.05:
            dirty.append(b"JUNK LINE NO TABS\n")
        if rng.random() < 0.05:
            dirty.append(b"chrW\tnotanint\tN\t0\t*\t*\n")
    (dirty_dir / "chrW.mpileup").write_bytes(b"".join(dirty))
    out_dw = tmp_path / "dirty_whole"
    out_ds = tmp_path / "dirty_stream"
    stages.stage_pileup_features(cfg, ref, str(dirty_dir), str(out_dw),
                                 ["chrW"], chunk_bytes=1 << 30)
    stages.stage_pileup_features(cfg, ref, str(dirty_dir), str(out_ds),
                                 ["chrW"], chunk_bytes=4096)
    da = bins.load_pileup_shard(str(out_dw / "chrW.npz"))
    db = bins.load_pileup_shard(str(out_ds / "chrW.npz"))
    np.testing.assert_array_equal(da.positions, db.positions)
    np.testing.assert_array_equal(da.matrix, db.matrix)


def test_full_native_pipeline_end_to_end(synth_world, tmp_path):
    """BAM -> s1 -> s2 -> s4 -> s5 -> s6 entirely through native + JAX
    components (phasing skipped: HP tags are already in the BAM)."""
    import jax.numpy as jnp

    from nanosnp_tpu.models.convert import load_pileup_checkpoint
    from nanosnp_tpu.models.haplotype_model import init_haplotype_params

    cfg = PipelineConfig()
    cfg.inference.batch_size = 512
    ref = FastaReference(synth_world["fasta"])
    out = tmp_path / "run"
    out.mkdir()
    shards = out / "pileup_shards"

    m1 = stages.stage_pileup_features_from_bam(cfg, ref, synth_world["bam"],
                                               str(shards), ["chrW"])
    assert m1["candidates"] > 0

    params = jax.tree.map(jnp.asarray, load_pileup_checkpoint(
        "/root/reference/PileupModel/models/ont_pileup.chkpt"))
    m2 = stages.stage_pileup_predict(cfg, ref, str(shards),
                                     str(out / "pileup.vcf"), params=params)
    assert m2["sites"] == m1["candidates"]
    vcf_body = [l for l in open(out / "pileup.vcf") if not l.startswith("#")]
    assert len(vcf_body) > 0

    # lower the group-support bar so synthetic data forms groups
    cfg.haplotype_feature.hete_support_quality = 2
    cfg.haplotype_feature.low_quality_threshold = 25
    extractor = NativeBamExtractor({"chrW": synth_world["bam"]})
    m4 = stages.stage_haplotype_features(cfg, ref, str(out / "pileup.vcf"),
                                         extractor, str(out / "hap_shards"))
    extractor.close()

    hap_params = init_haplotype_params(jax.random.key(0), cfg.haplotype_model)
    m5 = stages.stage_haplotype_predict(cfg, ref, str(out / "hap_shards"),
                                        str(out / "haplotype.csv"), hap_params)
    m6 = stages.stage_merge(cfg, str(out / "pileup.vcf"),
                            str(out / "haplotype.csv"),
                            str(out / "merge.vcf"))
    merged = [l for l in open(out / "merge.vcf") if not l.startswith("#")]
    # merge output is a valid VCF whose rows parse
    for l in merged:
        f = l.split("\t")
        assert len(f) == 10 and int(f[1]) > 0
    if m4["groups"] > 0:
        assert m5["sites"] == m4["groups"]
        assert os.path.getsize(out / "haplotype.csv") > 0


def test_s4_flush_cap_splits_shards_identically(synth_world, tmp_path,
                                                monkeypatch):
    """NSP_S4_FLUSH_GROUPS bounds s4's in-RAM pool (the 250 Mbp soak
    peaked ~41 GB holding a whole contig before one write). A tiny cap
    must produce multiple part files whose concatenated content equals
    the single-shard run's."""
    import jax.numpy as jnp

    from nanosnp_tpu.models.convert import load_pileup_checkpoint

    cfg = PipelineConfig()
    cfg.inference.batch_size = 512
    cfg.haplotype_feature.hete_support_quality = 2
    cfg.haplotype_feature.low_quality_threshold = 25
    ref = FastaReference(synth_world["fasta"])
    out = tmp_path / "runf"
    out.mkdir()
    shards = out / "pileup_shards"
    stages.stage_pileup_features_from_bam(cfg, ref, synth_world["bam"],
                                          str(shards), ["chrW"])
    params = jax.tree.map(jnp.asarray, load_pileup_checkpoint(
        "/root/reference/PileupModel/models/ont_pileup.chkpt"))
    stages.stage_pileup_predict(cfg, ref, str(shards),
                                str(out / "pileup.vcf"), params=params)

    def run_s4(dirname):
        extractor = NativeBamExtractor({"chrW": synth_world["bam"]})
        m = stages.stage_haplotype_features(
            cfg, ref, str(out / "pileup.vcf"), extractor, str(out / dirname))
        extractor.close()
        return m

    m_one = run_s4("hap_one")
    if m_one["groups"] < 4:
        return  # not enough groups to exercise the split on this world
    monkeypatch.setenv("NSP_S4_FLUSH_GROUPS", "2")
    m_split = run_s4("hap_split")
    assert m_split["groups"] == m_one["groups"]
    assert m_split["shards"] > m_one["shards"]

    def collect(d):
        rows = {}
        for p in bins.list_shards(str(out / d)):
            s = bins.load_haplotype_shard(p)
            for i, pos in enumerate(s.candidate_positions):
                rows[int(pos)] = (s.pileup["sequences"][i].tobytes(),
                                  s.haplotype["sequences"][i].tobytes())
        return rows

    assert collect("hap_split") == collect("hap_one")


def test_s1_flush_cap_splits_shards_identically(synth_world, tmp_path,
                                                monkeypatch):
    """NSP_S1_FLUSH_CANDIDATES bounds s1's in-RAM columnar accumulation
    (the r5 soak's 24 GB peak was one contig's worth of candidate
    columns materialized at once). A tiny cap must yield part files (on
    both the BAM and text paths), a rerun must clear stale parts, and
    the s2 VCF must be byte-identical to the single-shard run's.
    bug_compat=False here: sub-1000 caps cannot keep the bug-compat
    decode's 1000-row batch windows aligned (see _ShardFlusher; the
    production cap is 1000-aligned, covered by the unit test below)."""
    import jax.numpy as jnp

    from nanosnp_tpu.models.convert import load_pileup_checkpoint

    cfg = PipelineConfig()
    cfg.inference.batch_size = 512
    cfg.inference.bug_compat = False
    ref = FastaReference(synth_world["fasta"])
    params = jax.tree.map(jnp.asarray, load_pileup_checkpoint(
        "/root/reference/PileupModel/models/ont_pileup.chkpt"))

    def run(shards_dir, vcf_name):
        stages.stage_pileup_features_from_bam(
            cfg, ref, synth_world["bam"], str(tmp_path / shards_dir),
            ["chrW"], chunk_size=700)
        stages.stage_pileup_predict(cfg, ref, str(tmp_path / shards_dir),
                                    str(tmp_path / vcf_name), params=params)
        return sorted(os.path.basename(p) for p in
                      bins.list_shards(str(tmp_path / shards_dir)))

    names_one = run("sh_one", "one.vcf")
    assert names_one == ["chrW.npz"]
    monkeypatch.setenv("NSP_S1_FLUSH_CANDIDATES", "5")
    names_split = run("sh_split", "split.vcf")
    assert len(names_split) > 1
    assert all(n.startswith("chrW.part") for n in names_split)
    a = (tmp_path / "one.vcf").read_bytes()
    assert a == (tmp_path / "split.vcf").read_bytes()
    # rerun with the cap back off must clear stale parts
    monkeypatch.delenv("NSP_S1_FLUSH_CANDIDATES")
    names_again = run("sh_split", "again.vcf")
    assert names_again == ["chrW.npz"]
    assert a == (tmp_path / "again.vcf").read_bytes()
    # text path: same cap, same shard content as its own uncapped run
    monkeypatch.setenv("NSP_S1_FLUSH_CANDIDATES", "5")
    stages.stage_pileup_features(cfg, ref, synth_world["mdir"],
                                 str(tmp_path / "sh_text"), ["chrW"])
    parts = bins.list_shards(str(tmp_path / "sh_text"))
    assert len(parts) > 1
    got = np.concatenate([bins.load_pileup_shard(p).positions
                          for p in parts])
    want = bins.load_pileup_shard(str(tmp_path / "sh_one" / "chrW.npz"))
    np.testing.assert_array_equal(got, want.positions)


def test_shard_flusher_batch_alignment(tmp_path, monkeypatch):
    """Production caps keep every non-final part a multiple of 1000
    candidates so the bug-compat decode's 1000-row batch windows match
    whole-contig numbering, regardless of chunk sizes; content
    concatenates in order with correct per-part column offsets."""
    from nanosnp_tpu.features.pileup import CandidateBatch

    rng = np.random.default_rng(3)

    def fake_batch(start, n):
        cols = rng.integers(-5, 5, (n + 33, 18)).astype(np.int16)
        return CandidateBatch(
            "chrZ", np.arange(start, start + n, dtype=np.int64),
            ref_seqs=np.array([b"A" * 33] * n, dtype="S33"),
            alt_info=[f"d-{i}" for i in range(start, start + n)],
            depths=np.full(n, 9, np.int32), columns=cols,
            cand_off=np.arange(n, dtype=np.int64) + 16, flank=16)

    monkeypatch.setenv("NSP_S1_FLUSH_CANDIDATES", "2000")
    fl = stages._ShardFlusher("chrZ", str(tmp_path), 16)
    sizes = [700, 900, 1500, 123, 456, 1100, 77]   # crosses caps mid-chunk
    pos = 1
    for n in sizes:
        fl.add(fake_batch(pos, n))
        pos += n
    total = fl.finish()
    assert total == sum(sizes)
    parts = bins.list_shards(str(tmp_path))
    assert len(parts) > 1
    lens = [len(bins.load_pileup_shard(p)) for p in parts]
    assert all(n % 1000 == 0 for n in lens[:-1])
    got = np.concatenate([bins.load_pileup_shard(p).positions
                          for p in parts])
    np.testing.assert_array_equal(got, np.arange(1, sum(sizes) + 1))
    # window matrices must survive the mid-chunk split (cand_off remap)
    for p in parts:
        s = bins.load_pileup_shard(p)
        assert s.matrix.shape[1:] == (33, 18)


def test_runner_resume(tmp_path):
    calls = []

    def s_a(**kw):
        calls.append("a")
        return {"n": 1}

    def s_b(**kw):
        calls.append("b")

    runner = PipelineRunner(str(tmp_path / "out"))
    runner.run([Stage("a", s_a), Stage("b", s_b)])
    assert calls == ["a", "b"]
    runner2 = PipelineRunner(str(tmp_path / "out"))
    runner2.run([Stage("a", s_a), Stage("b", s_b)])
    assert calls == ["a", "b"]  # skipped on resume
    runner2.reset(["b"])
    runner2.run([Stage("a", s_a), Stage("b", s_b)])
    assert calls == ["a", "b", "b"]


def test_s5_feature_order_matches_named_mapping(tmp_path):
    """Regression (round-2 review): stage_haplotype_predict must feed
    (sequences, baseq, mapq, hap) to the featurizer in that order — the
    round-1 code passed bins._KEYS order, silently permuting HP tags into
    base qualities. Oracle: direct name-mapped featurization + model."""
    import jax.numpy as jnp

    from nanosnp_tpu.features.haplotype import (haplotype_features,
                                                ref_position_codes,
                                                ref_window_codes)
    from nanosnp_tpu.io.fasta import write_fasta
    from nanosnp_tpu.models.haplotype_model import (haplotype_predict,
                                                    init_haplotype_params)
    from nanosnp_tpu.constants import GT21_LABELS

    rng = np.random.default_rng(77)
    L = 2000
    seq = "".join(rng.choice(list("ACGT"), size=L))
    write_fasta(str(tmp_path / "r.fa"), {"cS": seq})
    ref = FastaReference(str(tmp_path / "r.fa"))

    n, dp, dh = 24, 10, 7
    cand = np.arange(300, 300 + n * 40, 40, dtype=np.int64)
    gpos = np.stack([cand + d * 3 for d in range(-5, 6)], axis=1)
    # DISTINCT value ranges per matrix so any permutation changes outputs
    shard = bins.HaplotypeShard(
        contig="cS",
        candidate_positions=cand,
        group_positions=gpos,
        pileup={"sequences": rng.integers(-1, 5, (n, dp, 33)).astype(np.int32),
                "hap": rng.integers(1, 4, (n, dp, 33)).astype(np.int32),
                "baseq": rng.integers(10, 40, (n, dp, 33)).astype(np.int32),
                "mapq": rng.integers(40, 60, (n, dp, 33)).astype(np.int32)},
        haplotype={"sequences": rng.integers(-1, 5, (n, dh, 11)).astype(np.int32),
                   "hap": rng.integers(1, 4, (n, dh, 11)).astype(np.int32),
                   "baseq": rng.integers(10, 40, (n, dh, 11)).astype(np.int32),
                   "mapq": rng.integers(40, 60, (n, dh, 11)).astype(np.int32)},
    )
    sdir = tmp_path / "shards"
    sdir.mkdir()
    bins.save_haplotype_shard(str(sdir / "cS_d16x16.npz"), shard)

    cfg = PipelineConfig()
    cfg.inference.batch_size = 64
    params = init_haplotype_params(jax.random.key(3), cfg.haplotype_model)
    out_csv = tmp_path / "h.csv"
    stages.stage_haplotype_predict(cfg, ref, str(sdir), str(out_csv), params)
    got = {}
    for line in open(out_csv):
        c, p, gt, q = line.split("\t")
        got[int(p)] = gt

    # oracle: featurize by NAME with bucket padding identical to the stage
    chr_seq = ref.contig("cS")
    def pad16(a):
        return np.pad(a, ((0, 0), (0, 16 - a.shape[1]), (0, 0)),
                      constant_values=-2).astype(np.float32)
    xp = haplotype_features(
        jnp.asarray(pad16(shard.pileup["sequences"])),
        jnp.asarray(pad16(shard.pileup["baseq"])),
        jnp.asarray(pad16(shard.pileup["mapq"])),
        jnp.asarray(pad16(shard.pileup["hap"])),
        jnp.asarray(ref_window_codes(chr_seq, cand, 16)))
    xh = haplotype_features(
        jnp.asarray(pad16(shard.haplotype["sequences"])),
        jnp.asarray(pad16(shard.haplotype["baseq"])),
        jnp.asarray(pad16(shard.haplotype["mapq"])),
        jnp.asarray(pad16(shard.haplotype["hap"])),
        jnp.asarray(ref_position_codes(chr_seq, gpos)))
    gt_p, _ = haplotype_predict(params, xp, xh, cfg.haplotype_model)
    want = np.asarray(gt_p).argmax(1)
    for j, p in enumerate(cand):
        assert got[int(p)] == GT21_LABELS[want[j]], (j, p)


def test_resolve_contigs_fallbacks(tmp_path):
    """Nonstandard FASTA names must fall back to all contigs — an empty
    selection silently skipped s4/s5 (regression)."""
    from nanosnp_tpu.io.fasta import FastaReference, write_fasta
    from nanosnp_tpu.runtime.cli import resolve_contigs

    write_fasta(str(tmp_path / "a.fa"),
                {"vchr": "ACGT" * 40, "other": "ACGT" * 30})
    ref = FastaReference(str(tmp_path / "a.fa"))
    assert resolve_contigs(None, ref) == ["vchr", "other"]
    assert resolve_contigs(["other"], ref) == ["other"]

    write_fasta(str(tmp_path / "b.fa"),
                {"chr2": "ACGT" * 40, "chr1": "ACGT" * 30, "odd": "ACGT" * 8})
    refb = FastaReference(str(tmp_path / "b.fa"))
    # major-contig order wins over FASTA order; extras are excluded
    assert resolve_contigs(None, refb) == ["chr1", "chr2"]
