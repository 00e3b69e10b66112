"""The progressive two-stage pipeline on a diploid world: train the
haplotype model on one region, evaluate on another, and show the merge
rescues/corrects pileup calls (the reference design's core claim)."""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from synth import random_genome
from bamgen import write_bam
from diploid import diploid_reads, make_diploid, truth_vcf_lines

from nanosnp_tpu.config import PipelineConfig, TrainConfig
from nanosnp_tpu.eval.f1 import evaluate_calls
from nanosnp_tpu.io import bins
from nanosnp_tpu.io.fasta import FastaReference, write_fasta
from nanosnp_tpu.models.convert import load_pileup_checkpoint
from nanosnp_tpu.runtime import stages
from nanosnp_tpu.runtime.extract import NativeBamExtractor
from nanosnp_tpu.train import data as D
from nanosnp_tpu.train import labels as L
from nanosnp_tpu.train.train_haplotype import train_haplotype
from nanosnp_tpu.train.train_pileup import load_checkpoint

REF_CKPT = "/root/reference/PileupModel/models/ont_pileup.chkpt"


@pytest.mark.slow
def test_haplotype_stage_rescues_low_quality_calls(tmp_path):
    rng = np.random.default_rng(4242)
    L_train, L_eval = 20000, 10000
    genome = random_genome(rng, {"trainC": L_train, "evalC": L_eval})
    worlds = {}
    for ctg in ("trainC", "evalC"):
        truth, h1, h2 = make_diploid(
            rng, genome[ctg], n_het=len(genome[ctg]) // 70,
            n_hom=len(genome[ctg]) // 200)
        # low coverage (~12x) so the pileup model is genuinely uncertain
        n_reads = len(genome[ctg]) * 12 // 200
        reads = diploid_reads(rng, h1, h2, ref_id=0, n_reads=n_reads,
                              read_len=200, err=0.06)
        worlds[ctg] = dict(truth=truth, reads=reads)

    fasta = tmp_path / "ref.fa"
    write_fasta(str(fasta), genome)
    ref = FastaReference(str(fasta))
    for ctg in worlds:
        write_bam(str(tmp_path / f"{ctg}.bam"), [(ctg, len(genome[ctg]))],
                  worlds[ctg]["reads"])

    cfg = PipelineConfig()
    cfg.inference.batch_size = 1024
    cfg.haplotype_feature.hete_support_quality = 5
    cfg.haplotype_feature.low_quality_threshold = 19
    # small haplotype model (training on CPU)
    cfg.haplotype_model.hidden_size = 48
    cfg.haplotype_model.lstm_layers = 1
    cfg.haplotype_model.dropout = 0.0

    pileup_params = jax.tree.map(jnp.asarray, load_pileup_checkpoint(REF_CKPT))

    # s1+s2 per contig
    vcfs = {}
    for ctg in worlds:
        shards = tmp_path / f"shards_{ctg}"
        stages.stage_pileup_features_from_bam(
            cfg, ref, str(tmp_path / f"{ctg}.bam"), str(shards), [ctg])
        vcfs[ctg] = str(tmp_path / f"pileup_{ctg}.vcf")
        stages.stage_pileup_predict(cfg, ref, str(shards), vcfs[ctg],
                                    params=pileup_params)

    # s4 on both contigs
    hap_shards = {}
    for ctg in worlds:
        extractor = NativeBamExtractor({ctg: str(tmp_path / f"{ctg}.bam")})
        out = tmp_path / f"hap_shards_{ctg}"
        m = stages.stage_haplotype_features(cfg, ref, vcfs[ctg], extractor,
                                            str(out))
        extractor.close()
        hap_shards[ctg] = (str(out), m["groups"])
    assert hap_shards["trainC"][1] > 50, hap_shards
    assert hap_shards["evalC"][1] > 20, hap_shards

    # train on trainC with truth labels
    seqs = {n: ref.contig(n) for n in ref.names}
    bed = [("trainC", 0, L_train), ("evalC", 0, L_eval)]
    truth_lines = truth_vcf_lines("trainC", worlds["trainC"]["truth"])
    truth_arrays = L.truth_arrays({n: ref.length(n) for n in ref.names},
                                  seqs, bed, truth_lines)
    D.set_reference_for_training(seqs)
    paths = bins.list_shards(hap_shards["trainC"][0])
    tcfg = TrainConfig(batch_size=32, seed=7)
    tcfg.optim.type = "adam"
    tcfg.optim.lr = 2e-3
    tcfg.optim.max_grad_norm = 2.0

    def train_iter():
        yield from D.haplotype_train_iterator(
            paths, truth_arrays, tcfg.batch_size,
            np.random.default_rng(8), epochs=80, pn_value=1.0)

    import io as _io
    from contextlib import redirect_stdout

    buf = _io.StringIO()
    with redirect_stdout(buf):
        state = train_haplotype(train_iter(), cfg.haplotype_model, tcfg,
                                steps_per_epoch=10**9,
                                out_dir=str(tmp_path / "hap_train"),
                                log_every=50, max_steps=700)
    logs = [l for l in buf.getvalue().splitlines() if "loss " in l]
    first = float(logs[0].split("loss ")[1].split()[0])
    last = float(logs[-1].split("loss ")[1].split()[0])
    assert last < first

    # s5 + s6 on evalC with the trained model
    params, _ = load_checkpoint(str(tmp_path / "hap_train" / "last.ckpt"))
    hap_csv = str(tmp_path / "haplotype_eval.csv")
    stages.stage_haplotype_predict(cfg, ref, hap_shards["evalC"][0], hap_csv,
                                   params)
    merge_vcf = str(tmp_path / "merge_eval.vcf")
    m6 = stages.stage_merge(cfg, vcfs["evalC"], hap_csv, merge_vcf)

    truth_eval = truth_vcf_lines("evalC", worlds["evalC"]["truth"])
    with open(vcfs["evalC"]) as f:
        f1_pileup = evaluate_calls(f, truth_eval, genotype_aware=False)
    with open(merge_vcf) as f:
        f1_merge = evaluate_calls(f, truth_eval, genotype_aware=False)

    print("pileup:", f1_pileup.summary())
    print("merge :", f1_merge.summary(), "rescued:", m6["rescued"])
    # the haplotype stage must engage, sharpen precision, and hold F1
    assert m6["rescued"] > 0
    assert f1_merge.precision >= f1_pileup.precision
    assert f1_merge.f1 >= f1_pileup.f1 - 0.03
