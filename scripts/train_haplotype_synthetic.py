"""Train the full-size haplotype model on a synthetic diploid world.

Produces nanosnp_tpu/models/weights/ont_haplotype_synthetic.npz — a usable
haplotype checkpoint (the reference's production haplotype weights are
absent from its mirror, .MISSING_LARGE_BLOBS:1-2; real deployments should
retrain on GIAB-labeled data with the train-haplotype CLI). Runs the whole
path on the current JAX backend (TPU when available): s1 -> s2 (production
pileup weights) -> s4 -> train_haplotype (val split, best-F1 retention)
-> s5+s6 merge on a held-out contig -> F1 report (written to
<out_dir>/f1_results.json).

Usage: python scripts/train_haplotype_synthetic.py [out_dir] [max_steps]
       [train_bp] [eval_bp]
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "tests"))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WEIGHTS_OUT = os.path.join(REPO, "nanosnp_tpu", "models", "weights",
                           "ont_haplotype_synthetic.npz")


def main(out_dir="./hap_synth_train", max_steps=3000,
         train_bp=4_000_000, eval_bp=300_000):
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
    from nanosnp_tpu.train.train_pileup import (load_checkpoint,
                                                save_params_npz)

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(20260817)
    sizes = {"trainC": train_bp, "evalC": eval_bp}
    genome = random_genome(rng, sizes)
    worlds = {}
    for ctg, L_ctg in sizes.items():
        truth, h1, h2 = make_diploid(rng, genome[ctg], n_het=L_ctg // 60,
                                     n_hom=L_ctg // 180)
        reads = diploid_reads(rng, h1, h2, 0, n_reads=L_ctg * 20 // 250,
                              read_len=250, err=0.06)
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
    tcfg.optim.lr = 3e-4
    tcfg.optim.max_grad_norm = 2.0
    train_paths, val_paths = D.reshard_train_val(
        paths, os.path.join(out_dir, "split"), tcfg.val_fraction,
        np.random.default_rng(7))
    print(f"[train] {len(train_paths)} train shards, {len(val_paths)} val",
          flush=True)

    n_sites = sum(len(bins.open_npz(p)["candidate_positions"])
                  for p in train_paths)
    val_factory = None
    if val_paths:
        val_factory = lambda: D.haplotype_train_iterator(
            val_paths, truth_arrays, tcfg.batch_size,
            np.random.default_rng(0), epochs=1, pn_value=1.0)
    state = train_haplotype(
        D.haplotype_train_iterator(train_paths, truth_arrays, tcfg.batch_size,
                                   np.random.default_rng(12), epochs=400,
                                   pn_value=1.0, mark_epochs=True),
        cfg.haplotype_model, tcfg, steps_per_epoch=None, out_dir=out_dir,
        log_every=50, max_steps=max_steps, val_iter_factory=val_factory,
        lr_steps_per_epoch=max(n_sites // tcfg.batch_size, 1))
    print(f"[train] done at step {state.step}", flush=True)

    best = os.path.join(out_dir, "best.ckpt")
    ckpt = best if os.path.exists(best) else os.path.join(out_dir, "last.ckpt")
    params, _ = load_checkpoint(ckpt)
    os.makedirs(os.path.dirname(WEIGHTS_OUT), exist_ok=True)
    save_params_npz(WEIGHTS_OUT, params)
    print(f"[train] weights ({ckpt}) -> {WEIGHTS_OUT}", flush=True)

    hap_csv = os.path.join(out_dir, "haplotype_eval.csv")
    m5 = stages.stage_haplotype_predict(cfg, ref, hap_shards["evalC"],
                                        hap_csv, params)
    merge_vcf = os.path.join(out_dir, "merge_eval.vcf")
    m6 = stages.stage_merge(cfg, vcfs["evalC"], hap_csv, merge_vcf)

    truth_eval = truth_vcf_lines("evalC", worlds["evalC"]["truth"])
    results = {"train_steps": state.step, "epochs": state.epoch,
               "rescued": m6["rescued"],
               "haplotype_sites_per_s": m5["sites_per_s"]}
    for name, path, gt_aware in [("pileup_site", vcfs["evalC"], False),
                                 ("pileup_genotype", vcfs["evalC"], True),
                                 ("merge_site", merge_vcf, False),
                                 ("merge_genotype", merge_vcf, True)]:
        with open(path) as f:
            r = evaluate_calls(f, truth_eval, genotype_aware=gt_aware)
        results[name] = r.summary()
        print(f"[eval] {name}: {r.summary()}", flush=True)
    with open(os.path.join(out_dir, "f1_results.json"), "w") as f:
        json.dump(results, f, indent=1)
    print("[eval] results ->", os.path.join(out_dir, "f1_results.json"),
          flush=True)


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "./hap_synth_train"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3000
    tb = int(sys.argv[3]) if len(sys.argv) > 3 else 4_000_000
    eb = int(sys.argv[4]) if len(sys.argv) > 4 else 300_000
    main(out, steps, tb, eb)
