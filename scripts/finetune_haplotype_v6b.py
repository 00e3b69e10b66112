"""Fine-tune the v6 haplotype checkpoint toward graceful no-phase
degradation (r5; the v6 gate's criterion (a) failed by 0.047).

v6 closed most of v5's phase-blind gap (sparse merge_off 0.349 -> 0.643
vs pileup 0.690) but still over-rescues at sparse untagged sites
(+1477 FPs on the A/B world). This fine-tune continues from v6's
best.ckpt on a corpus skewed 3:1 toward phase-degraded geometries —
three sparse-untagged worlds spanning the failing operating point
(hets ~1/1000 bp, 10-12x, 250-300 bp reads, err 0.05-0.08) plus an
untagged ONT world — with one tagged ONT + one tagged uniform world for
retention. OOD truth is persisted this time so the eval is re-runnable.

Writes <out>/ont_haplotype_synthetic.npz + <out>/f1_results.json with
the same keys scripts/ship_haplotype_v6.py gates on; run the gate with
train_dir=<out> afterwards.

Usage: python scripts/finetune_haplotype_v6b.py [out_dir] [init_ckpt]
                                                [max_steps]
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "tests"))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (name, length, kind, err_or_profile, cov, read_len, tag, spacing)
WORLDS = [
    ("nS1", 3_000_000, "uniform", 0.05, 10, 300, 0.0, 500),
    ("nS2", 2_500_000, "uniform", 0.08, 10, 300, 0.0, 500),
    ("nS3", 2_000_000, "uniform", 0.06, 12, 250, 0.0, 800),
    ("nU2", 2_000_000, "ont", 1, 18, 280, 0.0, None),
    ("tR", 2_500_000, "ont", 0, 22, 280, 0.85, None),
    ("uR", 2_000_000, "uniform", 0.06, 15, 250, 0.85, 60),
]
OOD_WORLD = ("ood2", 5_000_000, "ont", 3, 12, 320, 0.0, None)


def main(out_dir="./hap_v6b", init_ckpt="./hap_v6_train/best.ckpt",
         max_steps=3500):
    import jax
    import jax.numpy as jnp

    from bamgen import write_bam
    from diploid import diploid_reads, make_diploid, truth_vcf_lines
    from ontsim import ont_reads, random_profile
    from synth import random_genome
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
    rng = np.random.default_rng(20260821)
    profiles = [random_profile(rng, f"q{i}") for i in range(4)]
    specs = WORLDS + [OOD_WORLD]
    sizes = {s[0]: s[1] for s in specs}
    genome = random_genome(rng, sizes)
    worlds = {}
    for ctg, L_ctg, kind, e_or_p, cov, rl, tag, spacing in specs:
        if kind == "uniform":
            truth, h1, h2 = make_diploid(rng, genome[ctg],
                                         n_het=L_ctg // (spacing * 2),
                                         n_hom=L_ctg // (spacing * 6),
                                         spacing=spacing)
            reads = diploid_reads(rng, h1, h2, 0,
                                  n_reads=L_ctg * cov // rl, read_len=rl,
                                  err=e_or_p, tag_rate=tag)
        else:
            truth, h1, h2 = make_diploid(rng, genome[ctg],
                                         n_het=L_ctg // 60,
                                         n_hom=L_ctg // 180)
            reads = ont_reads(rng, h1, h2, 0,
                              n_reads=L_ctg * cov // rl, read_len=rl,
                              prof=profiles[e_or_p], tag_rate=tag)
        worlds[ctg] = dict(truth=truth)
        write_bam(os.path.join(out_dir, f"{ctg}.bam"), [(ctg, L_ctg)], reads)
        with open(os.path.join(out_dir, f"truth_{ctg}.vcf"), "w") as f:
            f.write("\n".join(truth_vcf_lines(ctg, truth)) + "\n")
        print(f"[world] {ctg}: {len(reads)} reads kind={kind} cov={cov} "
              f"tag={tag}", flush=True)
    fasta = os.path.join(out_dir, "ref.fa")
    write_fasta(fasta, genome)
    ref = FastaReference(fasta)

    cfg = PipelineConfig()
    cfg.inference.batch_size = 2048
    cfg.haplotype_feature.hete_support_quality = 5
    pileup_params = jax.tree.map(jnp.asarray, load_pileup_checkpoint(
        "/root/reference/PileupModel/models/ont_pileup.chkpt"))

    vcfs, hap_shards = {}, {}
    for spec in WORLDS:
        ctg = spec[0]
        shards = os.path.join(out_dir, f"shards_{ctg}")
        stages.stage_pileup_features_from_bam(
            cfg, ref, os.path.join(out_dir, f"{ctg}.bam"), shards, [ctg])
        vcfs[ctg] = os.path.join(out_dir, f"pileup_{ctg}.vcf")
        m2 = stages.stage_pileup_predict(cfg, ref, shards, vcfs[ctg],
                                         params=pileup_params)
        extractor = NativeBamExtractor(
            {ctg: os.path.join(out_dir, f"{ctg}.bam")})
        hs = os.path.join(out_dir, f"hap_shards_{ctg}")
        m4 = stages.stage_haplotype_features(cfg, ref, vcfs[ctg], extractor,
                                             hs)
        extractor.close()
        hap_shards[ctg] = hs
        print(f"[{ctg}] sites={m2['sites']} groups={m4['groups']}",
              flush=True)

    seqs = {n: ref.contig(n) for n in ref.names}
    train_ctgs = [s[0] for s in WORLDS]
    all_lines = truth_vcf_lines(train_ctgs[0], worlds[train_ctgs[0]]["truth"])
    for c in train_ctgs[1:]:
        all_lines += truth_vcf_lines(c, worlds[c]["truth"])[2:]
    bed = [(c, 0, sizes[c]) for c in sizes]
    truth_arrays = L.truth_arrays({n: ref.length(n) for n in ref.names},
                                  seqs, bed, all_lines)
    D.set_reference_for_training(seqs)
    paths = []
    for c in train_ctgs:
        paths += bins.list_shards(hap_shards[c])
    tcfg = TrainConfig(batch_size=256, seed=17)
    tcfg.optim.type = "lookahead_adam"
    tcfg.optim.lr = 1e-4          # fine-tune: 1/3 of the v6 training lr
    tcfg.optim.max_grad_norm = 2.0
    train_paths, val_paths = D.reshard_train_val(
        paths, os.path.join(out_dir, "split"), tcfg.val_fraction,
        np.random.default_rng(7))
    print(f"[train] {len(train_paths)} train shards, {len(val_paths)} val",
          flush=True)

    init_params, _ = load_checkpoint(init_ckpt)
    init_params = jax.tree.map(jnp.asarray, init_params)
    n_sites = sum(len(bins.open_npz(p)["candidate_positions"])
                  for p in train_paths)
    val_factory = None
    if val_paths:
        val_factory = lambda: D.haplotype_train_iterator(
            val_paths, truth_arrays, tcfg.batch_size,
            np.random.default_rng(0), epochs=1, pn_value=1.0)
    state = train_haplotype(
        D.haplotype_train_iterator(train_paths, truth_arrays,
                                   tcfg.batch_size,
                                   np.random.default_rng(19), epochs=400,
                                   pn_value=1.0, mark_epochs=True),
        cfg.haplotype_model, tcfg, steps_per_epoch=None, out_dir=out_dir,
        init_params=init_params, log_every=50, max_steps=max_steps,
        val_iter_factory=val_factory,
        lr_steps_per_epoch=max(n_sites // tcfg.batch_size, 1))
    print(f"[train] done at step {state.step}", flush=True)

    best = os.path.join(out_dir, "best.ckpt")
    ckpt = best if os.path.exists(best) else os.path.join(out_dir,
                                                          "last.ckpt")
    params, _ = load_checkpoint(ckpt)
    weights_out = os.path.join(out_dir, "ont_haplotype_synthetic.npz")
    save_params_npz(weights_out, params)
    print(f"[train] weights ({ckpt}) -> {weights_out}", flush=True)

    # OOD eval: unseen profile, untagged -> full native-phaser path
    results = {"train_steps": state.step, "init_ckpt": init_ckpt}
    ctg = OOD_WORLD[0]
    bam = os.path.join(out_dir, f"{ctg}.bam")
    shards = os.path.join(out_dir, f"shards_{ctg}")
    stages.stage_pileup_features_from_bam(cfg, ref, bam, shards, [ctg])
    pvcf = os.path.join(out_dir, f"pileup_{ctg}.vcf")
    stages.stage_pileup_predict(cfg, ref, shards, pvcf,
                                params=pileup_params)
    phase_dir = os.path.join(out_dir, f"phase_{ctg}")
    m3 = stages.stage_phase_native(cfg, ref, pvcf, bam, phase_dir, [ctg])
    print(f"[{ctg}] phaser: {m3}", flush=True)
    overrides = stages.load_native_phase_overrides(phase_dir)
    extractor = NativeBamExtractor({ctg: bam},
                                   cfg.haplotype_feature.max_coverage,
                                   hp_overrides=overrides)
    hs = os.path.join(out_dir, f"hap_shards_{ctg}")
    stages.stage_haplotype_features(cfg, ref, pvcf, extractor, hs)
    extractor.close()
    tl = truth_vcf_lines(ctg, worlds[ctg]["truth"])
    with open(pvcf) as f:
        rp = evaluate_calls(f, tl, genotype_aware=True)
    results["ood_pileup"] = rp.summary()
    print(f"[eval] ood_pileup: {rp.summary()}", flush=True)
    for label, gate in (("off", 0.0), ("on", 0.01)):
        cfg.merge.defer_unphased_frac = gate
        csv = os.path.join(out_dir, f"hap_{ctg}_{label}.csv")
        stages.stage_haplotype_predict(cfg, ref, hs, csv,
                                       jax.tree.map(jnp.asarray, params))
        merge = os.path.join(out_dir, f"merge_{ctg}_{label}.vcf")
        stages.stage_merge(cfg, pvcf, csv, merge)
        with open(merge) as f:
            rm = evaluate_calls(f, tl, genotype_aware=True)
        results[f"ood_merge_{label}"] = rm.summary()
        print(f"[eval] ood_merge_{label}: {rm.summary()}", flush=True)

    with open(os.path.join(out_dir, "f1_results.json"), "w") as f:
        json.dump(results, f, indent=1)
    print("[next] gate: python scripts/ship_haplotype_v6.py", out_dir,
          flush=True)


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "./hap_v6b"
    ck = sys.argv[2] if len(sys.argv) > 2 else "./hap_v6_train/best.ckpt"
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 3500
    main(out, ck, steps)
