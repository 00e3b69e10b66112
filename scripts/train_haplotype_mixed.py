"""Train the haplotype model on a MIXED-condition synthetic corpus.

Harder/more diverse than train_haplotype_synthetic.py: several contigs
spanning error rates (3-9%), coverages (15-30x), and het spacings (dense
and sparse), so the checkpoint generalizes across noise profiles instead
of memorizing one operating point (the v1 checkpoint lost precision on a
5%-error 20x world it never saw). Same mechanics: s1 -> s2 (production
pileup weights) -> s4 -> train (val split + best-F1 retention) -> eval on
TWO held-out worlds (in-distribution 300 kbp + a harder high-error one).

Usage: python scripts/train_haplotype_mixed.py [out_dir] [max_steps]
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

# (name, length, het spacing, coverage, read_len, err) — train corpus
TRAIN_WORLDS = [
    ("trA", 1_200_000, 60, 20, 250, 0.06),
    ("trB", 1_000_000, 60, 30, 300, 0.03),
    ("trC", 1_000_000, 90, 15, 250, 0.08),
    ("trD", 800_000, 300, 20, 300, 0.05),
    # low-coverage worlds: NanoSNP's headline operating point is ~10x; a
    # checkpoint trained only at 15-30x overcalls variants on 10x-depth
    # matrices (measured: merge ADDED 16k FPs on a 20 Mbp 10x world)
    ("trE", 1_000_000, 50, 10, 300, 0.05),
    ("trF", 800_000, 100, 12, 250, 0.06),
    # sparse-het low-coverage worlds (v3): at 10x with hets ~1/1000 bp no
    # read links adjacent hets (300 bp reads), so the haplotype branch
    # carries no phasing signal; the model must learn to defer (low qual
    # -> merge falls back to the pileup call). Measured gap: the v2
    # checkpoint's merge TRAILED pileup 0.627 vs 0.691 on a 20 Mbp
    # 10x/sparse world it never trained on.
    #
    # v3 A/B OUTCOME (2026-08-18): NOT SHIPPED. The sparse worlds taught
    # the model to rescue far more aggressively (20 Mbp 20x world:
    # 11085 rescued vs v2's 6045), which cratered precision at normal
    # coverage — big-world merge F1 0.833 vs v2's 0.905, BELOW the 0.845
    # pileup baseline. Small-world wins were marginal (evSparse 0.851 vs
    # 0.846; evIn/evHard +<0.001) and evLow regressed (0.906 vs 0.912).
    # The shipped checkpoint remains v2 (trA-trF). Any future attempt at
    # the sparse-het gap should add a *deferral* signal (e.g. phase-block
    # membership as a feature) rather than more sparse data, which just
    # shifts the rescue threshold globally.
    ("trG", 1_500_000, 500, 10, 300, 0.05),
    ("trH", 1_200_000, 500, 12, 250, 0.06),
]
EVAL_WORLDS = [
    ("evIn", 300_000, 60, 20, 250, 0.06),    # in-distribution
    ("evHard", 300_000, 300, 20, 300, 0.05), # sparse hets + 5% err (v1's gap)
    ("evLow", 300_000, 100, 10, 300, 0.05),  # the low-coverage point
    ("evSparse", 400_000, 500, 10, 300, 0.05),  # the v2 gap geometry
]


def build_world(rng, name, L, spacing, cov, read_len, err, out_dir, genome,
                worlds):
    from bamgen import write_bam
    from diploid import diploid_reads, make_diploid

    seq = genome[name]
    truth, h1, h2 = make_diploid(rng, seq, n_het=L // (spacing * 2),
                                 n_hom=L // (spacing * 6), spacing=spacing)
    reads = diploid_reads(rng, h1, h2, 0, n_reads=L * cov // read_len,
                          read_len=read_len, err=err)
    write_bam(os.path.join(out_dir, f"{name}.bam"), [(name, L)], reads)
    worlds[name] = dict(truth=truth)


def main(out_dir="./hap_mixed_train", max_steps=4000):
    import jax
    import jax.numpy as jnp

    from diploid import truth_vcf_lines
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
    rng = np.random.default_rng(20260818)
    specs = TRAIN_WORLDS + EVAL_WORLDS
    genome = random_genome(rng, {n: Lb for n, Lb, *_ in specs})
    fasta = os.path.join(out_dir, "ref.fa")
    write_fasta(fasta, genome)
    ref = FastaReference(fasta)
    worlds = {}
    for name, Lb, spacing, cov, rl, err in specs:
        build_world(rng, name, Lb, spacing, cov, rl, err, out_dir, genome,
                    worlds)
        print(f"[world] {name} built ({len(worlds[name]['truth'])} truth)",
              flush=True)

    cfg = PipelineConfig()
    cfg.inference.batch_size = 2048
    cfg.haplotype_feature.hete_support_quality = 5
    pileup_params = jax.tree.map(jnp.asarray, load_pileup_checkpoint(
        "/root/reference/PileupModel/models/ont_pileup.chkpt"))

    vcfs, hap_shards = {}, {}
    for name, *_ in specs:
        shards = os.path.join(out_dir, f"shards_{name}")
        stages.stage_pileup_features_from_bam(
            cfg, ref, os.path.join(out_dir, f"{name}.bam"), shards, [name])
        vcfs[name] = os.path.join(out_dir, f"pileup_{name}.vcf")
        m2 = stages.stage_pileup_predict(cfg, ref, shards, vcfs[name],
                                         params=pileup_params)
        extractor = NativeBamExtractor(
            {name: os.path.join(out_dir, f"{name}.bam")})
        hs = os.path.join(out_dir, f"hap_shards_{name}")
        m4 = stages.stage_haplotype_features(cfg, ref, vcfs[name], extractor,
                                             hs)
        extractor.close()
        hap_shards[name] = hs
        print(f"[{name}] sites={m2['sites']} groups={m4['groups']}",
              flush=True)

    seqs = {n: ref.contig(n) for n in ref.names}
    bed = [(n, 0, Lb) for n, Lb, *_ in specs]
    train_names = [w[0] for w in TRAIN_WORLDS]
    truth_lines = []
    for n in train_names:
        truth_lines += truth_vcf_lines(n, worlds[n]["truth"])
    truth_arrays = L.truth_arrays({n: ref.length(n) for n in ref.names},
                                  seqs, bed, truth_lines)
    D.set_reference_for_training(seqs)

    paths = []
    for n in train_names:
        paths += bins.list_shards(hap_shards[n])
    tcfg = TrainConfig(batch_size=256, seed=17)
    tcfg.optim.type = "lookahead_adam"
    tcfg.optim.lr = 3e-4
    tcfg.optim.max_grad_norm = 2.0
    train_paths, val_paths = D.reshard_train_val(
        paths, os.path.join(out_dir, "split"), tcfg.val_fraction,
        np.random.default_rng(7))
    n_sites = sum(len(bins.open_npz(p)["candidate_positions"])
                  for p in train_paths)
    print(f"[train] {len(train_paths)} train shards / {n_sites} sites, "
          f"{len(val_paths)} val shards", flush=True)
    val_factory = (lambda: D.haplotype_train_iterator(
        val_paths, truth_arrays, tcfg.batch_size, np.random.default_rng(0),
        epochs=1, pn_value=1.0)) if val_paths else None
    state = train_haplotype(
        D.haplotype_train_iterator(train_paths, truth_arrays, tcfg.batch_size,
                                   np.random.default_rng(12), epochs=400,
                                   pn_value=1.0, mark_epochs=True),
        cfg.haplotype_model, tcfg, steps_per_epoch=None, out_dir=out_dir,
        log_every=100, max_steps=max_steps, val_iter_factory=val_factory,
        lr_steps_per_epoch=max(n_sites // tcfg.batch_size, 1))
    print(f"[train] done at step {state.step}", flush=True)

    best = os.path.join(out_dir, "best.ckpt")
    ckpt = best if os.path.exists(best) else os.path.join(out_dir, "last.ckpt")
    params, _ = load_checkpoint(ckpt)

    results = {"train_steps": state.step}
    for name, *_ in EVAL_WORLDS:
        csv = os.path.join(out_dir, f"hap_{name}.csv")
        stages.stage_haplotype_predict(cfg, ref, hap_shards[name], csv, params)
        merge = os.path.join(out_dir, f"merge_{name}.vcf")
        m6 = stages.stage_merge(cfg, vcfs[name], csv, merge)
        tl = truth_vcf_lines(name, worlds[name]["truth"])
        with open(merge) as f:
            rm = evaluate_calls(f, tl, genotype_aware=True)
        with open(vcfs[name]) as f:
            rp = evaluate_calls(f, tl, genotype_aware=True)
        results[name] = {"pileup": rp.summary(), "merge": rm.summary(),
                         "rescued": m6["rescued"]}
        print(f"[eval {name}] pileup {rp.summary()}", flush=True)
        print(f"[eval {name}] merge  {rm.summary()}", flush=True)
    with open(os.path.join(out_dir, "f1_results.json"), "w") as f:
        json.dump(results, f, indent=1)

    # ship only if it dominates on the in-distribution eval AND improves
    # the hard one (the artifact in-repo must never regress)
    print("[done] review f1_results.json; ship with:\n"
          f"  python -c \"import sys; sys.path.insert(0,'{REPO}'); "
          "from nanosnp_tpu.train.train_pileup import *; "
          f"p,_=load_checkpoint('{ckpt}'); "
          f"save_params_npz('{WEIGHTS_OUT}', p)\"", flush=True)


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "./hap_mixed_train"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 4000
    main(out, steps)
