"""Eval subsystem tests + an end-to-end accuracy check: planted variants ->
full pileup stage with the production checkpoint -> F1 vs planted truth."""
import numpy as np
import pytest
import jax

from synth import random_genome
from bamgen import random_reads, write_bam
from test_training import _plant_variants

from nanosnp_tpu.config import PipelineConfig
from nanosnp_tpu.eval.diff import diff_vcfs
from nanosnp_tpu.eval.f1 import evaluate_calls
from nanosnp_tpu.io.fasta import FastaReference, write_fasta
from nanosnp_tpu.runtime import stages

HDR = "##fileformat=VCFv4.3\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tSample\n"


def _row(ctg, pos, ref, alt, qual=30.0, filt="PASS", gt="0/1"):
    return f"{ctg}\t{pos}\t.\t{ref}\t{alt}\t{qual}\t{filt}\t.\tGT:GQ:DP:AF\t{gt}:30:30:0.5\n"


def test_f1_basics():
    called = [HDR, _row("c", 10, "A", "C"), _row("c", 20, "G", "T", gt="1/1"),
              _row("c", 30, "T", "A"),
              _row("c", 40, "A", "A", filt="RefCall", gt="0/0")]
    truth = [HDR, _row("c", 10, "A", "C"), _row("c", 20, "G", "T", gt="1/1"),
             _row("c", 50, "C", "G")]
    res = evaluate_calls(called, truth)
    assert (res.tp, res.fp, res.fn) == (2, 1, 1)
    assert 0 < res.f1 < 1

    # genotype-aware: 0/1 vs 1/1 mismatch counts as fp+fn
    called = [HDR, _row("c", 10, "A", "C", gt="1/1")]
    truth = [HDR, _row("c", 10, "A", "C", gt="0/1")]
    res = evaluate_calls(called, truth)
    assert (res.tp, res.fp, res.fn) == (0, 1, 1)
    res = evaluate_calls(called, truth, genotype_aware=False)
    assert (res.tp, res.fp, res.fn) == (1, 0, 0)

    # confident bed restriction
    called = [HDR, _row("c", 10, "A", "C"), _row("c", 500, "G", "T")]
    truth = [HDR, _row("c", 10, "A", "C")]
    res = evaluate_calls(called, truth, confident_bed=[("c", 0, 100)])
    assert (res.tp, res.fp, res.fn) == (1, 0, 0)


def test_diff_vcfs():
    a = [HDR, _row("c", 10, "A", "C"), _row("c", 20, "G", "T")]
    b = [HDR, _row("c", 10, "A", "C"), _row("c", 30, "T", "A")]
    d = diff_vcfs(a, b)
    assert not d.identical
    assert len(d.only_a) == 1 and len(d.only_b) == 1 and d.n_common == 1
    d = diff_vcfs(a, a)
    assert d.identical and d.n_common == 2

    b2 = [HDR, _row("c", 10, "A", "G"), _row("c", 20, "G", "T")]
    d = diff_vcfs(a, b2)
    assert len(d.field_diffs) == 1 and "col4" in d.field_diffs[0][0]


def test_end_to_end_f1_on_planted_variants(tmp_path):
    """Clean 35x reads with planted SNVs -> s1(BAM) -> s2(production
    checkpoint) -> merge-free F1. The model was trained on real ONT data;
    on clean synthetic reads it must recover strong planted SNVs."""
    import jax.numpy as jnp

    from nanosnp_tpu.models.convert import load_pileup_checkpoint
    from nanosnp_tpu.train.data import TruthSite

    rng = np.random.default_rng(314)
    genome = random_genome(rng, {"chrE": 8000})
    # regenerate with low error rate reads for a cleaner signal
    reads = random_reads(rng, genome["chrE"], 0, n_reads=1400, read_len=220,
                         mq_range=(40, 60))
    truth = _plant_variants(rng, genome["chrE"], reads, n_sites=30)

    fasta = tmp_path / "ref.fa"
    write_fasta(str(fasta), genome)
    bam = tmp_path / "in.bam"
    write_bam(str(bam), [("chrE", 8000)], reads)

    cfg = PipelineConfig()
    cfg.inference.batch_size = 1024
    ref = FastaReference(str(fasta))
    shards = tmp_path / "shards"
    stages.stage_pileup_features_from_bam(cfg, ref, str(bam), str(shards),
                                          ["chrE"])
    params = jax.tree.map(jnp.asarray, load_pileup_checkpoint(
        "/root/reference/PileupModel/models/ont_pileup.chkpt"))
    stages.stage_pileup_predict(cfg, ref, str(shards),
                                str(tmp_path / "pileup.vcf"), params=params)

    truth_vcf = [HDR] + [
        _row("chrE", t.pos, t.ref, t.alt,
             gt=("1/1" if t.gt1 == t.gt2 else "0/1"))
        for t in truth]
    with open(tmp_path / "pileup.vcf") as f:
        res = evaluate_calls(f, truth_vcf, genotype_aware=False)
    # recall is the important half here (candidate gen + model find the site)
    assert res.recall > 0.8, res.summary()
    assert res.f1 > 0.5, res.summary()


def test_genotype_confusion():
    from nanosnp_tpu.eval.f1 import genotype_confusion

    called = [HDR, _row("c", 10, "A", "C", gt="0/1"),
              _row("c", 20, "G", "T", gt="1/1"),
              _row("c", 99, "T", "A", gt="0/1")]
    truth = [HDR, _row("c", 10, "A", "C", gt="0/1"),
             _row("c", 20, "G", "T", gt="0/1"),
             _row("c", 50, "C", "G", gt="1/1")]
    conf = genotype_confusion(called, truth)
    assert conf["0/1"]["0/1"] == 1       # correct het
    assert conf["0/1"]["1/1"] == 1       # genotype error
    assert conf["1/1"]["missed"] == 1    # FN
    assert conf["spurious"]["0/1"] == 1  # FP


def test_best_checkpoint_retention(tmp_path):
    import io
    from contextlib import redirect_stdout

    import jax

    from nanosnp_tpu.config import PileupModelConfig, TrainConfig
    from nanosnp_tpu.train import data as D
    from nanosnp_tpu.train.train_pileup import train_pileup

    rng = np.random.default_rng(5)
    arrays = D.PileupTrainArrays(
        rng.integers(-20, 20, (128, 33, 18)).astype(np.int32),
        np.eye(90, dtype=np.int32)[rng.integers(0, 21, 128)],
        np.arange(128, dtype=np.int64),
        np.zeros(128, dtype=bool),
    )
    mcfg = PileupModelConfig(hidden_size=8, output_size=16, inner_size=16,
                             n_layers=1, dropout=0.0)
    tcfg = TrainConfig(batch_size=32, seed=2)
    tcfg.optim.type = "adam"

    metrics_seen = []

    def eval_fn(state):
        metrics_seen.append(len(metrics_seen))
        return float(len(metrics_seen))  # strictly improving

    with redirect_stdout(io.StringIO()):
        train_pileup(D.batch_iterator(arrays, 32, rng, epochs=4), mcfg, tcfg,
                     steps_per_epoch=4, out_dir=str(tmp_path),
                     max_steps=16, eval_fn=eval_fn)
    assert len(metrics_seen) >= 3
    assert (tmp_path / "best.ckpt").exists()


def test_diff_haplotype_csvs():
    from nanosnp_tpu.eval.diff import diff_haplotype_csvs

    a = ["chr1\t10\tAC\t12.0\n", "chr1\t20\tGG\t9.0\n", "chr2\t5\tTT\t7.0\n"]
    b = ["chr1\t10\tAC\t12.5\n", "chr1\t20\tGT\t9.0\n", "chr2\t7\tTT\t7.0\n"]
    d = diff_haplotype_csvs(a, b)
    assert d.n_common == 2
    assert len(d.only_a) == 1 and d.only_a[0].startswith("chr2\t5")
    assert len(d.only_b) == 1 and d.only_b[0].startswith("chr2\t7")
    # GT compared; qual differences ignored
    assert len(d.field_diffs) == 1 and d.field_diffs[0][1] == "GG"
    assert not d.identical
    assert diff_haplotype_csvs(a, a).identical


def test_compare_failed_cli(tmp_path):
    """compare-failed = reference compare.py: keep failed-site rows inside
    the confident BED whose truth zygosity is het (compare.py:20-27)."""
    from nanosnp_tpu.runtime.cli import main as cli_main

    rng = np.random.default_rng(42)
    genome = random_genome(rng, {"ctg": 300})
    write_fasta(str(tmp_path / "ref.fa"), genome)
    seq = genome["ctg"]
    # truth: het at 50, hom at 120 (both in BED); het at 250 outside BED
    def alt_of(pos1):
        r = seq[pos1 - 1].upper()
        return "ACGT"[("ACGT".index(r) + 1) % 4]
    truth = HDR + "".join([
        _row("ctg", 50, seq[49].upper(), alt_of(50), gt="0/1"),
        _row("ctg", 120, seq[119].upper(), alt_of(120), gt="1/1"),
        _row("ctg", 250, seq[249].upper(), alt_of(250), gt="0/1"),
    ])
    (tmp_path / "truth.vcf").write_text(truth)
    (tmp_path / "conf.bed").write_text("ctg\t0\t200\n")
    failed = "".join(f"ctg\t{p}\textra\n" for p in (50, 120, 150, 250))
    (tmp_path / "failed.tsv").write_text(failed)

    assert cli_main([
        "compare-failed", "--failed", str(tmp_path / "failed.tsv"),
        "--ref", str(tmp_path / "ref.fa"),
        "--truth-vcf", str(tmp_path / "truth.vcf"),
        "--bed", str(tmp_path / "conf.bed"),
        "--out", str(tmp_path / "fn.tsv")]) == 0
    rows = (tmp_path / "fn.tsv").read_text().splitlines()
    # only the in-BED het (50) survives: 120 is hom, 150 isn't truth,
    # 250 is outside the confident BED
    assert rows == ["ctg\t50\textra"]
