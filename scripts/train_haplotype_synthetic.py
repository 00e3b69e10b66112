"""Train the full-size haplotype model on a synthetic diploid world.

Produces models/ont_haplotype_synthetic.ckpt — a demonstration checkpoint
(the reference's production haplotype weights are absent from its mirror;
real deployments should retrain on GIAB-labeled data with the same
command, see README). Runs the whole path on the current JAX backend
(TPU when available): s1 -> s2 (production pileup weights) -> s4 ->
train_haplotype -> eval-with-merge on a held-out contig.

Usage: python scripts/train_haplotype_synthetic.py [out_dir] [max_steps]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "tests"))

import numpy as np


def main(out_dir="./hap_synth_train", max_steps=1500):
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

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(20260816)
    sizes = {"trainC": 120_000, "evalC": 30_000}
    genome = random_genome(rng, sizes)
    worlds = {}
    for ctg, L_ctg in sizes.items():
        truth, h1, h2 = make_diploid(rng, genome[ctg], n_het=L_ctg // 60,
                                     n_hom=L_ctg // 180)
        reads = diploid_reads(rng, h1, h2, 0, n_reads=L_ctg * 14 // 200,
                              read_len=200, err=0.06)
        worlds[ctg] = dict(truth=truth, reads=reads)
        write_bam(os.path.join(out_dir, f"{ctg}.bam"),
                  [(ctg, L_ctg)], reads)
    fasta = os.path.join(out_dir, "ref.fa")
    write_fasta(fasta, genome)
    ref = FastaReference(fasta)
    print("[world] built", flush=True)

    cfg = PipelineConfig()
    cfg.inference.batch_size = 2048
    cfg.haplotype_feature.hete_support_quality = 5
    pileup_params = jax.tree.map(jnp.asarray, load_pileup_checkpoint(
        "/root/reference/PileupModel/models/ont_pileup.chkpt"))

    vcfs, hap_shards = {}, {}
    for ctg in worlds:
        shards = os.path.join(out_dir, f"shards_{ctg}")
        stages.stage_pileup_features_from_bam(
            cfg, ref, os.path.join(out_dir, f"{ctg}.bam"), shards, [ctg])
        vcfs[ctg] = os.path.join(out_dir, f"pileup_{ctg}.vcf")
        m2 = stages.stage_pileup_predict(cfg, ref, shards, vcfs[ctg],
                                         params=pileup_params)
        extractor = NativeBamExtractor(
            {ctg: os.path.join(out_dir, f"{ctg}.bam")})
        hs = os.path.join(out_dir, f"hap_shards_{ctg}")
        m4 = stages.stage_haplotype_features(cfg, ref, vcfs[ctg], extractor, hs)
        extractor.close()
        hap_shards[ctg] = hs
        print(f"[{ctg}] sites={m2['sites']} groups={m4['groups']}", flush=True)

    seqs = {n: ref.contig(n) for n in ref.names}
    bed = [(c, 0, sizes[c]) for c in sizes]
    truth_arrays = L.truth_arrays({n: ref.length(n) for n in ref.names},
                                  seqs, bed,
                                  truth_vcf_lines("trainC",
                                                  worlds["trainC"]["truth"]))
    D.set_reference_for_training(seqs)
    paths = bins.list_shards(hap_shards["trainC"])
    tcfg = TrainConfig(batch_size=256, seed=11)
    tcfg.optim.type = "lookahead_adam"
    tcfg.optim.lr = 1e-3
    tcfg.optim.max_grad_norm = 2.0

    def it():
        yield from D.haplotype_train_iterator(
            paths, truth_arrays, tcfg.batch_size,
            np.random.default_rng(12), epochs=400, pn_value=1.0)

    state = train_haplotype(it(), cfg.haplotype_model, tcfg,
                            steps_per_epoch=200, out_dir=out_dir,
                            log_every=50, max_steps=max_steps)
    print(f"[train] done at step {state.step}", flush=True)

    params, _ = load_checkpoint(os.path.join(out_dir, "last.ckpt"))
    hap_csv = os.path.join(out_dir, "haplotype_eval.csv")
    stages.stage_haplotype_predict(cfg, ref, hap_shards["evalC"], hap_csv,
                                   params)
    merge_vcf = os.path.join(out_dir, "merge_eval.vcf")
    m6 = stages.stage_merge(cfg, vcfs["evalC"], hap_csv, merge_vcf)

    truth_eval = truth_vcf_lines("evalC", worlds["evalC"]["truth"])
    with open(vcfs["evalC"]) as f:
        f1_p = evaluate_calls(f, truth_eval, genotype_aware=False)
    with open(merge_vcf) as f:
        f1_m = evaluate_calls(f, truth_eval, genotype_aware=False)
    print("[eval] pileup:", f1_p.summary(), flush=True)
    print("[eval] merge :", f1_m.summary(), "rescued:", m6["rescued"],
          flush=True)


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "./hap_synth_train"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 1500
    main(out, steps)
