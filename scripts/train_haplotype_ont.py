"""Retrain the haplotype model on ONT-like error profiles (r3, VERDICT #5).

Training realism upgrade over scripts/train_haplotype_synthetic.py (uniform
substitution-only errors): three training contigs each drawn with a
DIFFERENT ErrorProfile (tests/ontsim.py — homopolymer indels,
context-dependent substitutions, correlated base/mapping qualities,
per-read error-rate variation) at different coverages and read lengths,
so the model must learn pileup evidence rather than one noise signature.

Evaluation:
  - evalC: held-out contig with a TRAINING profile (in-distribution).
  - oodC:  held-out contig with an UNSEEN profile at an unseen coverage,
           UNTAGGED reads routed through the native phaser — the full
           production regime. Reported vs the pileup baseline with the
           deferral gate off AND on (VERDICT r2 #5 done-criterion: OOD
           merge F1 > pileup baseline without the gate).

v4 OUTCOME (2026-08-19): NOT SHIPPED as-is. The VERDICT #5 done-criterion
was met — OOD ONT-world merge F1 0.9646 (gate off) vs pileup 0.9118 — but
re-running the 3-geometry defer A/B (eval_defer_unphased.py) with this
checkpoint showed the uniform-error worlds had become out-of-distribution:
sparse merge_on 0.610 < pileup 0.690 (16.6k FPs gate-off), mid merge_off
0.866 < pileup 0.903. An ONT-only corpus trades one noise signature for
another. The shipped fix is train_haplotype_v5.py: the union corpus (these
three ONT worlds + v2's four uniform worlds), which must pass BOTH evals.

Writes ont_haplotype_synthetic.npz and f1_results.json in the out dir
(promotion to nanosnp_tpu/models/weights/ is a separate deliberate step).

Usage: python scripts/train_haplotype_ont.py [out_dir] [max_steps]
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

# (contig, length, profile idx, coverage, read_len, tag_rate)
TRAIN_WORLDS = [
    ("tA", 3_500_000, 0, 22, 280, 0.85),
    ("tB", 3_500_000, 1, 15, 240, 0.85),
    ("tC", 3_500_000, 2, 28, 300, 0.85),
]
EVAL_WORLD = ("evalC", 600_000, 0, 22, 280, 0.85)   # in-distribution
OOD_WORLD = ("oodC", 8_000_000, 3, 12, 320, 0.0)    # unseen profile+cov,
                                                    # untagged (phaser)


def main(out_dir="./hap_ont_train", max_steps=6000):
    import jax
    import jax.numpy as jnp

    from synth import random_genome
    from bamgen import write_bam
    from diploid import make_diploid, truth_vcf_lines
    from ontsim import ont_reads, random_profile
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
    rng = np.random.default_rng(20260819)
    profiles = [random_profile(rng, f"p{i}") for i in range(4)]
    specs = TRAIN_WORLDS + [EVAL_WORLD, OOD_WORLD]
    sizes = {c: n for c, n, *_ in specs}
    genome = random_genome(rng, sizes)
    worlds = {}
    for ctg, L_ctg, pi, cov, rl, tag in specs:
        truth, h1, h2 = make_diploid(rng, genome[ctg], n_het=L_ctg // 60,
                                     n_hom=L_ctg // 180)
        reads = ont_reads(rng, h1, h2, 0,
                          n_reads=L_ctg * cov // rl, read_len=rl,
                          prof=profiles[pi], tag_rate=tag)
        worlds[ctg] = dict(truth=truth, reads=reads)
        write_bam(os.path.join(out_dir, f"{ctg}.bam"), [(ctg, L_ctg)], reads)
        print(f"[world] {ctg}: {len(reads)} reads profile=p{pi} "
              f"cov={cov}", flush=True)
    fasta = os.path.join(out_dir, "ref.fa")
    write_fasta(fasta, genome)
    ref = FastaReference(fasta)

    cfg = PipelineConfig()
    cfg.inference.batch_size = 2048
    cfg.haplotype_feature.hete_support_quality = 5
    pileup_params = jax.tree.map(jnp.asarray, load_pileup_checkpoint(
        "/root/reference/PileupModel/models/ont_pileup.chkpt"))

    vcfs, hap_shards = {}, {}
    for ctg, *_ in specs[:-1]:   # oodC goes through the phaser below
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

    # labels over ALL training contigs
    seqs = {n: ref.contig(n) for n in ref.names}
    train_ctgs = [c for c, *_ in TRAIN_WORLDS]
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
        D.haplotype_train_iterator(train_paths, truth_arrays,
                                   tcfg.batch_size,
                                   np.random.default_rng(12), epochs=400,
                                   pn_value=1.0, mark_epochs=True),
        cfg.haplotype_model, tcfg, steps_per_epoch=None, out_dir=out_dir,
        log_every=50, max_steps=max_steps, val_iter_factory=val_factory,
        lr_steps_per_epoch=max(n_sites // tcfg.batch_size, 1))
    print(f"[train] done at step {state.step}", flush=True)

    best = os.path.join(out_dir, "best.ckpt")
    ckpt = best if os.path.exists(best) else os.path.join(out_dir,
                                                          "last.ckpt")
    params, _ = load_checkpoint(ckpt)
    os.makedirs(os.path.dirname(WEIGHTS_OUT), exist_ok=True)
    save_params_npz(WEIGHTS_OUT, params)
    print(f"[train] weights ({ckpt}) -> {WEIGHTS_OUT}", flush=True)

    results = {"train_steps": state.step, "epochs": state.epoch,
               "profiles": {p.name: vars(p) for p in profiles}}
    for k in results["profiles"]:
        results["profiles"][k] = {
            kk: (vv.tolist() if isinstance(vv, np.ndarray) else vv)
            for kk, vv in results["profiles"][k].items()}

    # in-distribution eval (oracle tags, like training)
    ctg = "evalC"
    hap_csv = os.path.join(out_dir, "haplotype_eval.csv")
    cfg.merge.defer_unphased_frac = 0.0
    stages.stage_haplotype_predict(cfg, ref, hap_shards[ctg], hap_csv,
                                   params)
    merge_vcf = os.path.join(out_dir, "merge_eval.vcf")
    stages.stage_merge(cfg, vcfs[ctg], hap_csv, merge_vcf)
    tl = truth_vcf_lines(ctg, worlds[ctg]["truth"])
    for name, path in [("eval_pileup", vcfs[ctg]), ("eval_merge",
                                                    merge_vcf)]:
        with open(path) as f:
            r = evaluate_calls(f, tl, genotype_aware=True)
        results[name] = r.summary()
        print(f"[eval] {name}: {r.summary()}", flush=True)

    # OOD eval: unseen profile/coverage, untagged -> native phaser (full
    # production regime), gate off and on
    ctg = "oodC"
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
    m4 = stages.stage_haplotype_features(cfg, ref, pvcf, extractor, hs)
    extractor.close()
    tl = truth_vcf_lines(ctg, worlds[ctg]["truth"])
    with open(pvcf) as f:
        rp = evaluate_calls(f, tl, genotype_aware=True)
    results["ood_pileup"] = rp.summary()
    print(f"[eval] ood_pileup: {rp.summary()}", flush=True)
    for label, gate in (("off", 0.0), ("on", 0.01)):
        cfg.merge.defer_unphased_frac = gate
        csv = os.path.join(out_dir, f"hap_{ctg}_{label}.csv")
        stages.stage_haplotype_predict(cfg, ref, hs, csv, params)
        merge = os.path.join(out_dir, f"merge_{ctg}_{label}.vcf")
        stages.stage_merge(cfg, pvcf, csv, merge)
        with open(merge) as f:
            rm = evaluate_calls(f, tl, genotype_aware=True)
        results[f"ood_merge_{label}"] = rm.summary()
        print(f"[eval] ood_merge_{label}: {rm.summary()}", flush=True)

    with open(os.path.join(out_dir, "f1_results.json"), "w") as f:
        json.dump(results, f, indent=1)
    print("[eval] results ->", os.path.join(out_dir, "f1_results.json"),
          flush=True)


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "./hap_ont_train"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 6000
    main(out, steps)
