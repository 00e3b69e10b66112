"""A/B the unphased-site deferral gate (MergeConfig.defer_unphased_frac).

Builds two synthetic diploid worlds with UNTAGGED reads (production
regime: HP comes from s3, not from oracle truth), runs the realistic
pipeline s1 -> s2 -> s3 (native phaser) -> s4 ONCE per world, then s5+s6
twice (gate off / gate on) and reports genotype-aware F1:

  - sparse: the documented v2 gap geometry (hets ~1/1000 bp at 10x with
    300 bp reads — no read links adjacent hets, so the NATIVE PHASER
    cannot form blocks and reads stay unphased; the hap channel is empty
    and v2's merge trails pileup, scripts/train_haplotype_mixed.py v3
    notes). The gate should recover merge to ~pileup.
  - dense: a normal 20x world where the phaser works and rescue helps;
    the gate must not regress it (phased fractions are high there).

Usage: python scripts/eval_defer_unphased.py [out_dir] [frac] [weights_npz]
(weights_npz defaults to the shipped checkpoint — pass a candidate's npz
to A/B it before promotion, e.g. the train_haplotype_v5.py output)
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "tests"))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (name, length, het spacing, coverage, read_len, err)
WORLDS = [
    ("sparse", 4_000_000, 500, 10, 300, 0.05),
    ("dense", 2_000_000, 60, 20, 250, 0.06),
    # partially-phasable middle ground: reads span ~1.7 hets, the phaser
    # forms short blocks, some sites phase and some don't — the gate must
    # split them correctly (defaults A/B, r3)
    ("mid", 2_000_000, 150, 15, 250, 0.05),
]


def main(out_dir="./defer_ab", frac=0.01, weights=None):
    import jax
    import jax.numpy as jnp

    from bamgen import write_bam
    from diploid import diploid_reads, make_diploid, truth_vcf_lines
    from synth import random_genome
    from nanosnp_tpu.config import PipelineConfig
    from nanosnp_tpu.eval.f1 import evaluate_calls
    from nanosnp_tpu.io.fasta import FastaReference, write_fasta
    from nanosnp_tpu.models.convert import load_pileup_checkpoint
    from nanosnp_tpu.runtime import stages
    from nanosnp_tpu.runtime.extract import NativeBamExtractor
    from nanosnp_tpu.train.train_pileup import load_params_npz

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(20260819)
    genome = random_genome(rng, {n: L for n, L, *_ in WORLDS})
    fasta = os.path.join(out_dir, "ref.fa")
    write_fasta(fasta, genome)
    ref = FastaReference(fasta)

    cfg = PipelineConfig()
    cfg.inference.batch_size = 2048
    cfg.haplotype_feature.hete_support_quality = 5
    pileup_params = jax.tree.map(jnp.asarray, load_pileup_checkpoint(
        "/root/reference/PileupModel/models/ont_pileup.chkpt"))
    weights_path = weights or os.path.join(
        REPO, "nanosnp_tpu", "models", "weights",
        "ont_haplotype_synthetic.npz")
    hap_params = load_params_npz(weights_path)

    # record WHICH weights produced this A/B so downstream gates can
    # verify the artifact belongs to their candidate (not just mtimes)
    import hashlib
    with open(weights_path, "rb") as f:
        weights_sha = hashlib.sha256(f.read()).hexdigest()
    results = {"frac": frac, "weights_path": os.path.abspath(weights_path),
               "weights_sha256": weights_sha}
    for name, L, spacing, cov, read_len, err in WORLDS:
        seq = genome[name]
        truth, h1, h2 = make_diploid(rng, seq, n_het=L // (spacing * 2),
                                     n_hom=L // (spacing * 6),
                                     spacing=spacing)
        reads = diploid_reads(rng, h1, h2, 0, n_reads=L * cov // read_len,
                              read_len=read_len, err=err, tag_rate=0.0)
        bam = os.path.join(out_dir, f"{name}.bam")
        write_bam(bam, [(name, L)], reads)
        tl = truth_vcf_lines(name, truth)

        shards = os.path.join(out_dir, f"shards_{name}")
        stages.stage_pileup_features_from_bam(cfg, ref, bam, shards, [name])
        pvcf = os.path.join(out_dir, f"pileup_{name}.vcf")
        stages.stage_pileup_predict(cfg, ref, shards, pvcf,
                                    params=pileup_params)
        phase_dir = os.path.join(out_dir, f"phase_{name}")
        m3 = stages.stage_phase_native(cfg, ref, pvcf, bam, phase_dir,
                                       [name])
        overrides = stages.load_native_phase_overrides(phase_dir)
        print(f"[{name}] phaser: {m3}", flush=True)
        extractor = NativeBamExtractor(
            {name: bam}, cfg.haplotype_feature.max_coverage,
            hp_overrides=overrides)
        hs = os.path.join(out_dir, f"hap_shards_{name}")
        m4 = stages.stage_haplotype_features(cfg, ref, pvcf, extractor, hs)
        extractor.close()
        with open(pvcf) as f:
            rp = evaluate_calls(f, tl, genotype_aware=True)
        res = {"pileup": rp.summary(), "groups": m4["groups"]}
        for label, gate in (("off", 0.0), ("on", frac)):
            cfg.merge.defer_unphased_frac = gate
            csv = os.path.join(out_dir, f"hap_{name}_{label}.csv")
            stages.stage_haplotype_predict(cfg, ref, hs, csv, hap_params)
            merge = os.path.join(out_dir, f"merge_{name}_{label}.vcf")
            m6 = stages.stage_merge(cfg, pvcf, csv, merge)
            with open(merge) as f:
                rm = evaluate_calls(f, tl, genotype_aware=True)
            res[f"merge_{label}"] = rm.summary()
            res[f"rescued_{label}"] = m6["rescued"]
            print(f"[{name}] merge({label}) {rm.summary()} "
                  f"rescued={m6['rescued']}", flush=True)
        print(f"[{name}] pileup {rp.summary()}", flush=True)
        results[name] = res
    with open(os.path.join(out_dir, "defer_ab.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "./defer_ab"
    fr = float(sys.argv[2]) if len(sys.argv) > 2 else 0.01
    w = sys.argv[3] if len(sys.argv) > 3 else None
    main(out, fr, w)
