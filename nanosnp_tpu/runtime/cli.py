"""Command-line driver: `python -m nanosnp_tpu.runtime.cli <command>`.

Replaces the reference's run_caller.sh entry point. Commands:

  call        run the pipeline (all stages that have inputs available)
  s1-features mpileup(+ref) -> pileup shards
  s2-predict  shards -> pileup.vcf
  s6-merge    pileup.vcf + haplotype.csv -> merge.vcf
  sort-vcf    contig-ordered VCF sort
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

from ..config import load_config
from ..constants import ALL_CHROMS
from ..io.fasta import FastaReference
from . import stages
from .pipeline import PipelineRunner, Stage


def _add_common(p):
    p.add_argument("--config", default=None, help="YAML config overriding defaults")
    p.add_argument("--threads", type=int, default=0)
    p.add_argument("--output", "-o", required=True, help="output directory")


def _enable_compilation_cache():
    """Persistent XLA compilation cache: repeat pipeline runs skip the
    (remote-)compile of every jitted stage."""
    try:
        import jax

        default_dir = os.path.expanduser("~/.cache/nanosnp_jax")
        cache_dir = os.environ.get("NSP_JAX_CACHE", default_dir)
        if not cache_dir or cache_dir.lower() in ("0", "false", "no", "off"):
            return
        if cache_dir.lower() in ("1", "true", "yes", "on"):
            cache_dir = default_dir
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


def main(argv=None):
    _enable_compilation_cache()
    parser = argparse.ArgumentParser(prog="nanosnp_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("call", help="run the pipeline end to end")
    _add_common(p)
    p.add_argument("--bam", help="input BAM (requires samtools for mpileup)")
    p.add_argument("--mpileup", help="pre-computed whole-genome mpileup file")
    p.add_argument("--mpileup-dir", help="per-contig mpileup directory")
    p.add_argument("--ref", required=True, help="reference FASTA")
    p.add_argument("--pileup-model", required=True)
    p.add_argument("--haplotype-model", default=None)
    p.add_argument("--contigs", nargs="*", default=None)
    p.add_argument("--coverage", type=int, default=30)
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--allow-unphased", action="store_true",
                   help="proceed through s4/s5 with untagged reads when "
                        "no phaser is available (degrades haplotype "
                        "features; off by default)")
    p.add_argument("--phaser", default="auto",
                   choices=["auto", "whatshap", "native", "unphased"],
                   help="s3 engine: whatshap (reference parity, external), "
                        "native (built-in read-backed phaser, no external "
                        "deps), auto = whatshap if installed else native")
    p.add_argument("--emit-tagged-bams", action="store_true",
                   help="with --phaser native: also write haplotag_out/"
                        "{contig}.bam copies (whatshap-haplotag's artifact) "
                        "for external tools; the pipeline itself does not "
                        "need them")
    p.add_argument("--defer-unphased-frac", type=float, default=None,
                   help="skip haplotype-model rescue at candidates whose "
                        "covering reads are phased below this fraction "
                        "(merge keeps the pileup call there); 0 = reference "
                        "behavior. No reference counterpart — see "
                        "MergeConfig.defer_unphased_frac")
    p.add_argument("--depth-mode", default=None,
                   choices=["column", "push"],
                   help="s1 BAM depth-cap semantics: column = exact "
                        "per-column cap; push = htslib bam_plp_push "
                        "whole-read admission incl. the coverage-spike "
                        "shadow (samtools --max-depth behavior). See "
                        "PileupFeatureConfig.depth_mode")
    p.add_argument("--coordinator", default=None,
                   help="multi-host: coordinator address host:port "
                        "(or env NSP_COORDINATOR)")
    p.add_argument("--num-hosts", type=int, default=None,
                   help="multi-host: total process count (or NSP_NUM_PROCS)")
    p.add_argument("--host-id", type=int, default=None,
                   help="multi-host: this process's id (or NSP_PROC_ID)")

    p = sub.add_parser("s1-features")
    _add_common(p)
    p.add_argument("--mpileup", help="whole-genome mpileup file")
    p.add_argument("--mpileup-dir", help="per-contig mpileup directory")
    p.add_argument("--ref", required=True)
    p.add_argument("--contigs", nargs="*", default=None)

    p = sub.add_parser("s2-predict")
    _add_common(p)
    p.add_argument("--shards", required=True)
    p.add_argument("--ref", required=True)
    p.add_argument("--pileup-model", required=True)

    p = sub.add_parser("s6-merge")
    _add_common(p)
    p.add_argument("--pileup-vcf", required=True)
    p.add_argument("--haplotype-csv", required=True)

    p = sub.add_parser("sort-vcf")
    p.add_argument("--input", "-i", required=True)
    p.add_argument("--output", "-o", required=True)

    p = sub.add_parser(
        "split-bam",
        help="native BAM splitting (no samtools): per contig and/or by HP "
             "tag into h1/h2 (reference DNA_SplitSam / split_bam_by_tag "
             "roles). Outputs are unindexed BAMs.")
    p.add_argument("--bam", required=True)
    p.add_argument("--output", "-o", required=True, help="output directory")
    p.add_argument("--contigs", nargs="*", default=None,
                   help="write {contig}.bam per contig (default: all)")
    p.add_argument("--by-tag", action="store_true",
                   help="split into h1.bam/h2.bam by HP aux instead "
                        "(untagged reads dropped)")

    p = sub.add_parser("make-train-data",
                       help="labeled pileup training arrays from BAM + truth")
    _add_common(p)
    p.add_argument("--bam", required=True)
    p.add_argument("--ref", required=True)
    p.add_argument("--truth-vcf", required=True)
    p.add_argument("--bed", default=None, help="confident regions BED")
    p.add_argument("--contigs", nargs="*", default=None)
    p.add_argument("--max-nonvariant-ratio", type=float, default=5.0)
    p.add_argument("--h5", action="store_true",
                   help="also write reference-layout HDF5 train bins "
                        "(make_bin_train_data.py schema) for cross-stack "
                        "train-data diffing")

    p = sub.add_parser("train-pileup")
    _add_common(p)
    p.add_argument("--data", required=True, help="dir of labeled .npz arrays")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--resume", default=None)
    p.add_argument("--use-balance", action="store_true",
                   help="per-(gt,zy)-class upsampling per epoch")
    p.add_argument("--val-fraction", type=float, default=None,
                   help="held-out fraction for per-epoch validation "
                        "(default cfg.train.val_fraction)")
    p.add_argument("--first-stage", type=int, default=None,
                   help="freeze encoder params from this epoch on")

    p = sub.add_parser("train-haplotype")
    _add_common(p)
    p.add_argument("--shards", required=True, help="haplotype shard dir")
    p.add_argument("--ref", required=True)
    p.add_argument("--truth-vcf", required=True)
    p.add_argument("--bed", required=True)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=512)
    p.add_argument("--pn-value", type=float, default=0.7)
    p.add_argument("--resume", default=None)
    p.add_argument("--val-fraction", type=float, default=None,
                   help="held-out shard fraction for per-epoch validation")
    p.add_argument("--first-stage", type=int, default=None)

    p = sub.add_parser("evaluate-pileup",
                       help="confusion/accuracy/macro-F1 of a pileup "
                            "checkpoint on labeled arrays (reference "
                            "PileupModel eval pass)")
    _add_common(p)
    p.add_argument("--data", required=True, help="dir of labeled .npz arrays")
    p.add_argument("--model", required=True)
    p.add_argument("--for-evaluate", action="store_true",
                   help="variant-only filter (zy>0), reference "
                        "dataset.py:100-106")
    p.add_argument("--batch-size", type=int, default=2000)

    p = sub.add_parser("legacy-make-groups",
                       help="legacy cat-model path: pileup VCF + BAM(s) -> "
                            "per-contig edge/read-matrix bins (reference "
                            "make_predict_groups.py)")
    _add_common(p)
    p.add_argument("--pileup-vcf", required=True)
    p.add_argument("--bam", required=True,
                   help="directory of {contig}.bam files, or one BAM used "
                        "for every contig (a per-HP split from split-bam "
                        "--by-tag in the dual-bin flow)")
    p.add_argument("--contigs", nargs="*", default=None)
    p.add_argument("--adjacent-size", type=int, default=5)
    p.add_argument("--min-quality", type=float, default=15.0)
    p.add_argument("--support-quality", type=float, default=19.0)
    p.add_argument("--max-coverage", type=int, default=150)

    p = sub.add_parser("legacy-predict",
                       help="legacy CatModel inference over dual-tag bins "
                            "(reference HaplotypeModel/predict.py)")
    _add_common(p)
    p.add_argument("--data-tag1", required=True, help="bin dir, HP tag 1")
    p.add_argument("--data-tag2", required=True, help="bin dir, HP tag 2")
    p.add_argument("--model", required=True, help=".npz/.ckpt CatModel params")
    p.add_argument("--batch-size", type=int, default=1000)
    p.add_argument("--max-depth", type=int, default=20)
    p.add_argument("--min-depth", type=int, default=2)

    p = sub.add_parser("legacy-heuristic",
                       help="legacy non-NN homozygote caller over edge "
                            "graphs (reference heuristic.py)")
    _add_common(p)
    p.add_argument("--data", required=True, help="legacy bin dir")
    p.add_argument("--pair-route", action="store_true",
                   help="use the pair-route voting rule "
                        "(heuristic_pair_route.py) instead of the two-path "
                        "walk")

    p = sub.add_parser("legacy-train",
                       help="train the legacy CatModel on dual-tag bins + "
                            "a truth VCF (reference HaplotypeModel/train.py)")
    _add_common(p)
    p.add_argument("--data-tag1", required=True)
    p.add_argument("--data-tag2", required=True)
    p.add_argument("--ref", required=True)
    p.add_argument("--truth-vcf", required=True)
    p.add_argument("--bed", required=True)
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--max-depth", type=int, default=20)
    p.add_argument("--min-depth", type=int, default=5)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--gt-classes", type=int, default=10, choices=(10, 15),
                   help="10 = shipped legacy configs (gt_num_class: 10); "
                        "15 = the config_prev cal_label pair space "
                        "(dataset.py:26-57) incl. deletion pairs")

    p = sub.add_parser("legacy-eval",
                       help="legacy CatModel accuracy vs truth labels over "
                            "dual-tag bins (reference HaplotypeModel/eval.py)")
    _add_common(p)
    p.add_argument("--data-tag1", required=True)
    p.add_argument("--data-tag2", required=True)
    p.add_argument("--model", required=True, help=".npz CatModel params")
    p.add_argument("--ref", required=True)
    p.add_argument("--truth-vcf", required=True)
    p.add_argument("--bed", required=True)
    p.add_argument("--batch-size", type=int, default=1000)
    p.add_argument("--max-depth", type=int, default=20)
    p.add_argument("--min-depth", type=int, default=5)
    p.add_argument("--seed", type=int, default=0)

    p = sub.add_parser("legacy-filter-labels",
                       help="flag label-noise sites where both tags' read "
                            "consensus contradicts the truth label "
                            "(reference filter_catmodel_label.py)")
    _add_common(p)
    p.add_argument("--data-tag1", required=True)
    p.add_argument("--data-tag2", required=True)
    p.add_argument("--ref", required=True)
    p.add_argument("--truth-vcf", required=True)
    p.add_argument("--bed", required=True)
    p.add_argument("--max-depth", type=int, default=20)
    p.add_argument("--min-depth", type=int, default=5)
    p.add_argument("--threshold", type=float, default=0.70)
    p.add_argument("--center-col", type=int, default=None,
                   help="het-matrix column for the consensus check; "
                        "default = true center (adjacent_size). The "
                        "reference tool hardcodes 2 "
                        "(filter_catmodel_label.py:233-238) — pass "
                        "--center-col 2 for bit-parity with it")

    p = sub.add_parser("evaluate-haplotype",
                       help="confusion/accuracy/macro-F1 of a haplotype "
                            "checkpoint on labeled shards (reference "
                            "evaluate_dev.py)")
    _add_common(p)
    p.add_argument("--shards", required=True)
    p.add_argument("--ref", required=True)
    p.add_argument("--truth-vcf", required=True)
    p.add_argument("--bed", required=True)
    p.add_argument("--model", required=True)
    p.add_argument("--batch-size", type=int, default=512)

    p = sub.add_parser("compare-failed",
                       help="filter a failed-site list to confident-BED "
                            "het-truth rows (reference compare.py)")
    p.add_argument("--failed", required=True,
                   help="TSV of failed sites, rows start ctg\\tpos")
    p.add_argument("--ref", required=True)
    p.add_argument("--truth-vcf", required=True)
    p.add_argument("--bed", required=True)
    p.add_argument("--out", required=True,
                   help="output file of confirmed het false negatives")

    args = parser.parse_args(argv)

    if args.cmd == "compare-failed":
        from ..eval.f1 import classify_failed_sites
        from ..train import labels as L

        ref = FastaReference(args.ref)
        seqs = {name: ref.contig(name) for name in ref.names}
        with open(args.bed) as f:
            bed = L.parse_bed(f)
        with open(args.truth_vcf) as f:
            truth = L.truth_arrays(
                {n: ref.length(n) for n in ref.names}, seqs, bed, f)
        with open(args.failed) as f:
            kept = classify_failed_sites(f, truth)
        with open(args.out, "w") as f:
            f.writelines(kept)
        print({"failed_in": args.failed, "het_fn": len(kept)})
        return 0

    if args.cmd == "sort-vcf":
        from ..decode.sort import sort_vcf_lines

        with open(args.input) as f:
            lines = sort_vcf_lines(f)
        with open(args.output, "w") as f:
            f.writelines(lines)
        return 0

    if args.cmd == "split-bam":
        from ..io.bam import BamFile

        os.makedirs(args.output, exist_ok=True)
        with BamFile(args.bam) as bam:
            if args.by_tag:
                n = bam.split_by_tag(os.path.join(args.output, "h1.bam"),
                                     os.path.join(args.output, "h2.bam"))
                print({"records": n})
            else:
                contigs = args.contigs or [c for c, _ in bam.references()]
                total = 0
                for ctg in contigs:
                    total += bam.write_tagged(
                        os.path.join(args.output, f"{ctg}.bam"), {},
                        contig=ctg)
                print({"records": total, "contigs": len(contigs)})
        return 0

    cfg = load_config(args.config)
    if args.threads:
        cfg.threads = args.threads
    if getattr(args, "defer_unphased_frac", None) is not None:
        cfg.merge.defer_unphased_frac = args.defer_unphased_frac
    if getattr(args, "depth_mode", None) is not None:
        cfg.pileup_feature.depth_mode = args.depth_mode
    os.makedirs(args.output, exist_ok=True)

    if args.cmd == "s1-features":
        ref = FastaReference(args.ref)
        mdir = _ensure_mpileup_dir(args, cfg)
        m = stages.stage_pileup_features(
            cfg, ref, mdir, os.path.join(args.output, "pileup_shards"),
            args.contigs)
        print(m)
        return 0

    if args.cmd == "s2-predict":
        ref = FastaReference(args.ref)
        m = stages.stage_pileup_predict(
            cfg, ref, args.shards, os.path.join(args.output, "pileup.vcf"),
            model_path=args.pileup_model)
        print(m)
        return 0

    if args.cmd == "s6-merge":
        m = stages.stage_merge(cfg, args.pileup_vcf, args.haplotype_csv,
                               os.path.join(args.output, "merge.vcf"))
        print(m)
        return 0

    if args.cmd == "legacy-make-groups":
        return _run_legacy_make_groups(args, cfg)
    if args.cmd == "legacy-predict":
        return _run_legacy_predict(args, cfg)
    if args.cmd == "legacy-heuristic":
        return _run_legacy_heuristic(args, cfg)
    if args.cmd == "legacy-train":
        return _run_legacy_train(args, cfg)
    if args.cmd == "legacy-eval":
        return _run_legacy_eval(args, cfg)
    if args.cmd == "legacy-filter-labels":
        return _run_legacy_filter_labels(args, cfg)
    if args.cmd == "evaluate-pileup":
        return _run_evaluate_pileup(args, cfg)
    if args.cmd == "evaluate-haplotype":
        return _run_evaluate_haplotype(args, cfg)
    if args.cmd == "make-train-data":
        return _run_make_train_data(args, cfg)
    if args.cmd == "train-pileup":
        return _run_train_pileup(args, cfg)
    if args.cmd == "train-haplotype":
        return _run_train_haplotype(args, cfg)
    if args.cmd == "call":
        return _run_call(args, cfg)

    return 1


def _legacy_bam_paths(bam_arg, contigs=None):
    """Directory of {contig}.bam files, or one BAM mapped to every contig
    in its header."""
    if os.path.isdir(bam_arg):
        return {f[:-4]: os.path.join(bam_arg, f)
                for f in os.listdir(bam_arg) if f.endswith(".bam")}
    from ..io.bam import BamFile

    with BamFile(bam_arg) as bam:
        names = [c for c, _ in bam.references()]
    if contigs:
        names = [c for c in names if c in contigs]
    return {c: bam_arg for c in names}


def _run_legacy_make_groups(args, cfg) -> int:
    from ..legacy.bins import build_legacy_bins

    written = build_legacy_bins(
        args.pileup_vcf, _legacy_bam_paths(args.bam, args.contigs),
        args.output, max_coverage=args.max_coverage,
        quality_threshold=args.min_quality,
        support_quality=args.support_quality,
        adjacent_size=args.adjacent_size, contigs=args.contigs)
    print({"contigs": len(written), "groups": sum(written.values())})
    return 0


def _align_legacy_bins(b1, b2, min_depth):
    """PredictDataset position alignment (dataset.py:828-853): advancing
    two position-sorted bins, keeping matches whose surrounding depth
    reaches min_depth in both tags."""
    import numpy as np

    d1 = ((b1["surrounding_read_matrix"] != -2).sum(2) > 0).sum(1)
    d2 = ((b2["surrounding_read_matrix"] != -2).sum(2) > 0).sum(1)
    p1 = [int(p.split(":")[1]) for p in b1["position"]]
    p2 = [int(p.split(":")[1]) for p in b2["position"]]
    idx1, idx2 = [], []
    k = j = 0
    while k < len(p1) and j < len(p2):
        if p1[k] == p2[j]:
            if d1[k] >= min_depth and d2[j] >= min_depth:
                idx1.append(k)
                idx2.append(j)
            k += 1
            j += 1
        elif p1[k] < p2[j]:
            k += 1
        else:
            j += 1
    return np.asarray(idx1, dtype=int), np.asarray(idx2, dtype=int)


def _run_legacy_predict(args, cfg) -> int:
    import numpy as np
    import jax.numpy as jnp

    from .. import constants as C
    from ..decode.pileup_vcf import calculate_score
    from ..legacy.bins import load_legacy_bin
    from ..legacy.catmodel import build_g_images, catmodel_predict
    from ..ops.pallas_lstm import pallas_supported
    from ..train.train_pileup import load_checkpoint

    use_pallas = pallas_supported()
    params, _ = load_checkpoint(args.model)
    out_path = os.path.join(args.output, "legacy_calls.tsv")
    n_out = 0
    with open(out_path, "w") as fout:
        names = sorted(set(os.listdir(args.data_tag1))
                       & set(os.listdir(args.data_tag2)))
        for name in names:
            b1 = load_legacy_bin(os.path.join(args.data_tag1, name))
            b2 = load_legacy_bin(os.path.join(args.data_tag2, name))
            idx1, idx2 = _align_legacy_bins(b1, b2, args.min_depth)
            if len(idx1) == 0:
                continue
            md = args.max_depth

            def tag(b, idx, key):
                return {"read": b[f"{key}read_matrix"][idx, :md],
                        "baseq": b[f"{key}base_quality_matrix"][idx, :md],
                        "mapq": b[f"{key}mapping_quality_matrix"][idx, :md]}

            g0 = build_g_images(tag(b1, idx1, "surrounding_"),
                                tag(b2, idx2, "surrounding_"), md)
            g1 = build_g_images(tag(b1, idx1, ""), tag(b2, idx2, ""), md)
            positions = b1["position"][idx1]
            for s in range(0, len(positions), args.batch_size):
                probs = np.asarray(catmodel_predict(
                    params, jnp.asarray(g0[s:s + args.batch_size]),
                    jnp.asarray(g1[s:s + args.batch_size]),
                    use_pallas=use_pallas))
                best = probs.argmax(1)
                for pos, cls, pr in zip(positions[s:s + args.batch_size],
                                        best, probs.max(1)):
                    ctg, p = pos.split(":")
                    fout.write(f"{ctg}\t{p}\t{C.GT21_LABELS[cls]}\t"
                               f"{calculate_score(float(pr))}\n")
                    n_out += 1
    print({"sites": n_out, "output": out_path})
    return 0


def _legacy_labeled_bins(args):
    """Shared assembly for the legacy labeled dual-tag commands: align each
    bin pair, join truth labels at the group centers (the reference reads a
    stored `labels` dataset written by make_train_groups; our labels come
    from the same truth-VCF/BED join, train/labels.py), yield
    (name, b1, b2, idx1, idx2, ctg, centers, labels)."""
    import numpy as np

    from ..io.fasta import FastaReference
    from ..legacy.bins import load_legacy_bin
    from ..train import labels as L
    from ..train.data import attach_haplotype_labels

    ref = FastaReference(args.ref)
    contig_seqs = {c: ref.contig(c) for c in ref.names}
    with open(args.bed) as f:
        bed = list(L.parse_bed(f))
    with open(args.truth_vcf) as f:
        truth = L.truth_arrays({c: len(s) for c, s in contig_seqs.items()},
                               contig_seqs, bed, f)

    names = sorted(set(os.listdir(args.data_tag1))
                   & set(os.listdir(args.data_tag2)))
    for name in names:
        b1 = load_legacy_bin(os.path.join(args.data_tag1, name))
        b2 = load_legacy_bin(os.path.join(args.data_tag2, name))
        idx1, idx2 = _align_legacy_bins(b1, b2, args.min_depth)
        if len(idx1) == 0:
            continue
        ctg = b1["position"][idx1[0]].split(":")[0]
        if ctg not in truth:
            continue
        centers = np.array([int(p.split(":")[1])
                            for p in b1["position"][idx1]], dtype=np.int64)
        labels = attach_haplotype_labels(centers, truth[ctg])
        yield name, b1, b2, idx1, idx2, ctg, centers, labels


def _legacy_tag_slices(b, idx, md, key=""):
    return {"read": b[f"{key}read_matrix"][idx, :md],
            "baseq": b[f"{key}base_quality_matrix"][idx, :md],
            "mapq": b[f"{key}mapping_quality_matrix"][idx, :md]}


def _run_legacy_train(args, cfg) -> int:
    import numpy as np
    import jax

    from ..legacy.catmodel import build_g_images, init_catmodel_params
    from ..legacy.train import select_training_sites, train_catmodel
    from ..train.train_pileup import save_params_npz

    md = args.max_depth
    datasets = []
    for (_name, b1, b2, idx1, idx2, _ctg, _centers,
         labels) in _legacy_labeled_bins(args):
        g0 = build_g_images(_legacy_tag_slices(b1, idx1, md, "surrounding_"),
                            _legacy_tag_slices(b2, idx2, md, "surrounding_"),
                            md)
        g1 = build_g_images(_legacy_tag_slices(b1, idx1, md),
                            _legacy_tag_slices(b2, idx2, md), md)
        datasets.append((g0, g1, labels))
    if not datasets:
        print({"error": "no aligned training sites"})
        return 1

    g0 = np.concatenate([d[0] for d in datasets])
    g1 = np.concatenate([d[1] for d in datasets])
    labels = np.concatenate([d[2] for d in datasets])
    rng = np.random.default_rng(args.seed)
    n_cls = getattr(args, "gt_classes", 10)
    params = init_catmodel_params(jax.random.key(args.seed),
                                  gt_classes=n_cls)
    for epoch in range(args.epochs):
        idx = select_training_sites(labels, rng, n_classes=n_cls)
        if len(idx) == 0:
            print({"error": "no confident SNV-labeled sites"})
            return 1

        def batches():
            for s in range(0, len(idx) - args.batch_size + 1,
                           args.batch_size):
                sel = idx[s:s + args.batch_size]
                yield g0[sel], g1[sel], labels[sel, 1]

        params, loss, steps = train_catmodel(
            params, batches(), lr=args.lr, seed=args.seed + epoch)
        print({"epoch": epoch + 1, "loss": round(loss, 4),
               "steps": steps, "sites": len(idx)})
        save_params_npz(os.path.join(args.output,
                                     f"catmodel_epoch{epoch + 1}.npz"),
                        params)
    save_params_npz(os.path.join(args.output, "catmodel.npz"), params)
    return 0


def _run_legacy_eval(args, cfg) -> int:
    """Reference HaplotypeModel/eval.py:29-83: CatModel predictions vs
    truth labels over labeled dual-tag bins; TSV rows
    `ctg pos truth pred qual -/False` plus an accuracy line. Site filter =
    the reference's confident-variant + downsampled-nonvariant selection
    (dataset.py:552-561 via select_training_sites)."""
    import numpy as np
    import jax.numpy as jnp

    from .. import constants as C
    from ..decode.pileup_vcf import calculate_score
    from ..legacy.catmodel import build_g_images, catmodel_predict
    from ..legacy.train import select_training_sites
    from ..ops.pallas_lstm import pallas_supported
    from ..train.train_pileup import load_checkpoint

    use_pallas = pallas_supported()
    params, _ = load_checkpoint(args.model)
    rng = np.random.default_rng(args.seed)
    md = args.max_depth
    out_path = os.path.join(args.output, "legacy_eval.tsv")
    os.makedirs(args.output, exist_ok=True)
    n_total = n_correct = 0
    with open(out_path, "w") as fout:
        fout.write("# Contig\tPos\tTruth\tPred\tQual\tTrue/False\n")
        for (_name, b1, b2, idx1, idx2, ctg, centers,
             labels) in _legacy_labeled_bins(args):
            # class count comes from the loaded head (10-class shipped
            # configs or the 15-class config_prev variant)
            keep = select_training_sites(
                labels, rng, n_classes=params["out"]["w"].shape[-1])
            if len(keep) == 0:
                continue
            g0 = build_g_images(
                _legacy_tag_slices(b1, idx1[keep], md, "surrounding_"),
                _legacy_tag_slices(b2, idx2[keep], md, "surrounding_"), md)
            g1 = build_g_images(_legacy_tag_slices(b1, idx1[keep], md),
                                _legacy_tag_slices(b2, idx2[keep], md), md)
            gt = labels[keep, 1]
            pos = centers[keep]
            for s in range(0, len(keep), args.batch_size):
                probs = np.asarray(catmodel_predict(
                    params, jnp.asarray(g0[s:s + args.batch_size],
                                        jnp.float32),
                    jnp.asarray(g1[s:s + args.batch_size], jnp.float32),
                    use_pallas=use_pallas))
                best = probs.argmax(1)
                sub_gt = gt[s:s + args.batch_size]
                n_total += len(best)
                n_correct += int((best == sub_gt).sum())
                for p, cls, pr, y in zip(pos[s:s + args.batch_size], best,
                                         probs.max(1), sub_gt):
                    ok = "-" if cls == y else "False"
                    fout.write(f"{ctg}\t{p}\t{C.GT21_LABELS[y]}\t"
                               f"{C.GT21_LABELS[cls]}\t"
                               f"{calculate_score(float(pr))}\t{ok}\n")
    acc = round(n_correct / n_total, 4) if n_total else 0.0
    print({"sites": n_total, "accuracy": acc, "output": out_path})
    return 0


def _run_legacy_filter_labels(args, cfg) -> int:
    """Reference filter_catmodel_label.py: write positions where both
    tags' read consensus contradicts the truth label (label noise to drop
    before legacy training)."""
    import numpy as np

    from ..legacy.labelcheck import consensus_label_mismatches

    out_path = os.path.join(args.output, "filtered_positions.txt")
    os.makedirs(args.output, exist_ok=True)
    n_flagged = n_checked = 0
    with open(out_path, "w") as fout:
        for (name, b1, b2, idx1, idx2, ctg, centers,
             labels) in _legacy_labeled_bins(args):
            r1 = b1["read_matrix"][idx1, :args.max_depth]
            r2 = b2["read_matrix"][idx2, :args.max_depth]
            col = args.center_col
            if col is None:
                col = r1.shape[2] // 2
            checked, mism = consensus_label_mismatches(
                r1, r2, labels[:, 1], col, args.threshold)
            # only confidently-labeled SNV sites participate, as in the
            # reference (its bins carry labels only there)
            conf = (labels[:, 0] > 0) & (labels[:, 1] >= 0) \
                & (labels[:, 1] < 10)
            mism &= conf
            n_checked += int((checked & conf).sum())
            n_flagged += int(mism.sum())
            for p in centers[mism]:
                fout.write(f"{ctg}:{p}\n")
            print({"bin": name, "flagged": int(mism.sum()),
                   "kept": int((conf & ~mism).sum())})
    print({"checked": n_checked, "flagged": n_flagged, "output": out_path})
    return 0


def _run_legacy_heuristic(args, cfg) -> int:
    from ..legacy.bins import load_legacy_bin
    from ..legacy.heuristic import run_heuristic

    out_path = os.path.join(args.output, "legacy_homozygous.txt")
    n_out = 0
    with open(out_path, "w") as fout:
        for name in sorted(os.listdir(args.data)):
            b = load_legacy_bin(os.path.join(args.data, name))
            mat = b["pair_route"] if args.pair_route else b["edge_matrix"]
            for pos in run_heuristic(mat, list(b["position"]),
                                     pair_route=args.pair_route):
                fout.write(pos + "\n")
                n_out += 1
    print({"homozygous": n_out, "output": out_path})
    return 0


def _run_evaluate_pileup(args, cfg) -> int:
    """Reference PileupModel eval pass (train.py eval()/dataset
    for_evaluate): per-class confusion + accuracy + macro-F1 on labeled
    arrays."""
    import json

    import jax.numpy as jnp
    import numpy as np

    from .. import constants as Cn
    from ..io.bins import list_shards
    from ..models.pileup_model import pileup_predict
    from ..parallel.inference import BatchedPredictor
    from ..train import data as D
    from ..train.metrics import ConfusionAccumulator
    from ..train.train_pileup import load_checkpoint

    params, _ = load_checkpoint(args.model)
    mcfg = cfg.pileup_model

    def fn(p, x):
        return pileup_predict(p, x.astype(jnp.float32), mcfg)

    predictor = BatchedPredictor(fn, params, batch_size=args.batch_size)
    gt_conf = ConfusionAccumulator(mcfg.gt_num_class)
    zy_conf = ConfusionAccumulator(mcfg.zy_num_class)
    for path in list_shards(args.data):
        arrays = D.load_train_arrays(path)
        dec = D.decode_90dim_labels(arrays.label)
        sel = (D.for_evaluate_indices(dec["zy"]) if args.for_evaluate
               else np.arange(len(arrays.positions)))
        if len(sel) == 0:
            continue
        gt_p, zy_p = predictor.run(arrays.matrix[sel].astype(np.float32))
        gt_conf.update(gt_p.argmax(1), dec["gt"][sel])
        zy_conf.update(zy_p.argmax(1), dec["zy"][sel])
    report = {"n": gt_conf.total}
    report.update(gt_conf.summary("gt_"))
    report.update(zy_conf.summary("zy_"))
    print(json.dumps(report))
    print(gt_conf.format_matrix(Cn.GT21_LABELS))
    print(zy_conf.format_matrix(["0/0", "1/1", "0/1"]))
    with open(os.path.join(args.output, "evaluate_pileup.json"), "w") as f:
        json.dump(report, f, indent=1)
    return 0


def _run_evaluate_haplotype(args, cfg) -> int:
    """Reference HaplotypeModel/evaluate_dev.py: score a checkpoint on
    labeled haplotype shards (confusion, accuracy, macro-F1)."""
    import json

    import jax.numpy as jnp
    import numpy as np

    from .. import constants as Cn
    from ..features.haplotype import haplotype_features
    from ..io.bins import list_shards
    from ..models.haplotype_model import haplotype_predict
    from ..parallel.inference import BatchedPredictor
    from ..train import data as D
    from ..train import labels as L
    from ..train.metrics import ConfusionAccumulator
    from ..train.train_pileup import load_checkpoint

    ref = FastaReference(args.ref)
    seqs = {name: ref.contig(name) for name in ref.names}
    with open(args.bed) as f:
        bed = L.parse_bed(f)
    with open(args.truth_vcf) as f:
        truth_arrays = L.truth_arrays(
            {n: ref.length(n) for n in ref.names}, seqs, bed, f)
    D.set_reference_for_training(seqs)
    params, _ = load_checkpoint(args.model)
    hcfg = cfg.haplotype_model

    def fn(p, sp, bp, mp_, hp, rp, sh, bh, mh, hh, rh):
        xp = haplotype_features(sp, bp, mp_, hp, rp)
        xh = haplotype_features(sh, bh, mh, hh, rh)
        return haplotype_predict(p, xp, xh, hcfg)

    predictor = BatchedPredictor(fn, params, batch_size=args.batch_size)
    gt_conf = ConfusionAccumulator(hcfg.gt_num_class)
    zy_conf = ConfusionAccumulator(hcfg.zy_num_class)
    order = ("p_seq", "p_baseq", "p_mapq", "p_hap", "p_ref",
             "h_seq", "h_baseq", "h_mapq", "h_hap", "h_ref")
    for batch in D.haplotype_train_iterator(
            list_shards(args.shards), truth_arrays, args.batch_size,
            np.random.default_rng(0), epochs=1, pn_value=1.0):
        n_valid = batch.pop("_n", None)   # don't double-count tiled tails
        gt_p, zy_p = predictor.run(*[batch[k] for k in order])
        gt_conf.update(gt_p.argmax(1)[:n_valid], batch["gt"][:n_valid])
        zy_conf.update(zy_p.argmax(1)[:n_valid], batch["zy"][:n_valid])
    report = {"n": gt_conf.total}
    report.update(gt_conf.summary("gt_"))
    report.update(zy_conf.summary("zy_"))
    print(json.dumps(report))
    print(gt_conf.format_matrix(Cn.GT21_LABELS[:hcfg.gt_num_class]))
    print(zy_conf.format_matrix(["0/0", "1/1", "0/1"]))
    with open(os.path.join(args.output, "evaluate_haplotype.json"), "w") as f:
        json.dump(report, f, indent=1)
    return 0


def _run_make_train_data(args, cfg) -> int:
    import numpy as np

    from ..io.bam import BamFile
    from ..features.pileup import CandidateBatch, assemble_windows
    from ..train import data as D

    ref = FastaReference(args.ref)
    with open(args.truth_vcf) as f:
        truth = D.split_truth_vcf(f)
    bed_masks = None
    if args.bed:
        with open(args.bed) as f:
            intervals = D.extend_bed_intervals(
                [(c, int(s), int(e)) for c, s, e, *_ in
                 (l.split("\t") for l in f if l.strip())])
        bed_masks = {}
        for ctg, s, e in intervals:
            if ctg not in bed_masks and ctg in ref.by_name:
                bed_masks[ctg] = np.zeros(ref.length(ctg), dtype=bool)
            if ctg in bed_masks:
                bed_masks[ctg][s:e] = True
    rng = np.random.default_rng(cfg.train.seed)
    fc = cfg.pileup_feature
    out_dir = os.path.join(args.output, "train_data")
    os.makedirs(out_dir, exist_ok=True)
    total = {"sites": 0, "variants": 0}
    with BamFile(args.bam) as bam:
        contigs = args.contigs or [c for c, _ in bam.references()
                                   if c in ref.by_name]
        for ctg in contigs:
            seq = ref.contig(ctg)
            pile = bam.pileup_region(
                ctg, 0, len(seq), seq,
                snp_min_af=fc.snp_min_af, indel_min_af=fc.indel_min_af,
                min_coverage=fc.min_depth, max_indel=fc.max_indel_size,
                min_mq=fc.mpileup_min_mq, excl_flags=fc.mpileup_excl_flags,
                max_depth=fc.mpileup_max_depth)
            if bed_masks is not None and ctg in bed_masks:
                keep = bed_masks[ctg][pile.positions - 1]
                pile.positions = pile.positions[keep]
                pile.counts = pile.counts[keep]
                pile.depths = pile.depths[keep]
                pile.is_candidate = pile.is_candidate[keep]
                pile.afs = pile.afs[keep]
                pile.alt_info = [a for a, k in zip(pile.alt_info, keep) if k]
            batch = assemble_windows(pile, seq, fc.flanking_bases)
            arrays = D.build_pileup_train_arrays(
                batch, truth.get(ctg, []), args.max_nonvariant_ratio, rng)
            D.save_train_arrays(os.path.join(out_dir, f"{ctg}.npz"), arrays)
            if args.h5:
                from ..io.bins import save_pileup_train_h5

                save_pileup_train_h5(
                    os.path.join(out_dir, f"{ctg}.bin"), arrays)
            total["sites"] += len(arrays.positions)
            total["variants"] += int(arrays.is_variant.sum())
    print(total)
    return 0


def _run_train_pileup(args, cfg) -> int:
    import numpy as np

    from ..io.bins import list_shards
    from ..train import data as D
    from ..train.train_pileup import train_pileup

    tcfg = cfg.train
    if args.batch_size:
        tcfg.batch_size = args.batch_size
    if args.use_balance:
        tcfg.use_balance = True
    if args.val_fraction is not None:
        tcfg.val_fraction = args.val_fraction
    if args.first_stage is not None:
        tcfg.first_stage = args.first_stage
    epochs = args.epochs or tcfg.epochs
    rng = np.random.default_rng(tcfg.seed)

    # 90/10 split at shard (file) level like the reference when several
    # shards exist (train.py:176-181), else at row level
    paths = list_shards(args.data)
    train_paths, val_paths = D.split_train_val(paths, tcfg.val_fraction, rng)

    def merge(ps):
        arrays = [D.load_train_arrays(p) for p in ps]
        return D.PileupTrainArrays(
            np.concatenate([a.matrix for a in arrays]),
            np.concatenate([a.label for a in arrays]),
            np.concatenate([a.positions for a in arrays]),
            np.concatenate([a.is_variant for a in arrays]),
        )

    if val_paths:
        train_arrays, val_arrays = merge(train_paths), merge(val_paths)
    else:
        all_arrays = merge(paths)
        n = len(all_arrays.positions)
        tr_idx, va_idx = D.split_train_val(range(n), tcfg.val_fraction, rng)
        def take(idx):
            idx = np.asarray(idx)
            return D.PileupTrainArrays(
                all_arrays.matrix[idx], all_arrays.label[idx],
                all_arrays.positions[idx], all_arrays.is_variant[idx])
        train_arrays = take(tr_idx) if va_idx else all_arrays
        val_arrays = take(va_idx) if va_idx else None

    steps_hint = max(len(train_arrays.positions) // tcfg.batch_size, 1)
    val_factory = None
    if val_arrays is not None and len(val_arrays.positions):
        val_factory = lambda: D.batch_iterator(
            val_arrays, tcfg.batch_size, np.random.default_rng(0),
            epochs=1, drop_last=False)
    state = train_pileup(
        D.batch_iterator(train_arrays, tcfg.batch_size, rng, epochs=epochs,
                         use_balance=tcfg.use_balance, mark_epochs=True),
        cfg.pileup_model, tcfg, steps_per_epoch=None,
        out_dir=os.path.join(args.output, "pileup_train"),
        resume_from=args.resume,
        val_iter_factory=val_factory,
        lr_steps_per_epoch=steps_hint)
    print({"steps": state.step, "epochs": state.epoch})
    return 0


def _run_train_haplotype(args, cfg) -> int:
    import numpy as np

    from ..io.bins import list_shards, open_npz
    from ..train import data as D
    from ..train import labels as L
    from ..train.train_haplotype import train_haplotype

    ref = FastaReference(args.ref)
    seqs = {name: ref.contig(name) for name in ref.names}
    with open(args.bed) as f:
        bed = L.parse_bed(f)
    with open(args.truth_vcf) as f:
        truth_arrays = L.truth_arrays(
            {n: ref.length(n) for n in ref.names}, seqs, bed, f)
    D.set_reference_for_training(seqs)

    tcfg = cfg.train
    tcfg.batch_size = args.batch_size
    if args.val_fraction is not None:
        tcfg.val_fraction = args.val_fraction
    if args.first_stage is not None:
        tcfg.first_stage = args.first_stage
    epochs = args.epochs or 30
    rng = np.random.default_rng(tcfg.seed)
    paths = list_shards(args.shards)
    # row-level reshard: consolidated s4 shards are one file per
    # (contig, depth bucket), far too coarse for a file-level split
    train_paths, val_paths = D.reshard_train_val(
        paths, os.path.join(args.output, "haplotype_split"),
        tcfg.val_fraction, rng)

    # lr-decay schedule hint: total candidate count from shard metadata
    # (loads one small array per shard — NOT the old full counting pass)
    n_sites = sum(len(open_npz(p)["candidate_positions"])
                  for p in train_paths)
    steps_hint = max(n_sites // tcfg.batch_size, 1)
    val_factory = None
    if val_paths:
        val_factory = lambda: D.haplotype_train_iterator(
            val_paths, truth_arrays, tcfg.batch_size,
            np.random.default_rng(0), epochs=1, pn_value=args.pn_value)
    state = train_haplotype(
        D.haplotype_train_iterator(train_paths, truth_arrays, tcfg.batch_size,
                                   rng, epochs=epochs, pn_value=args.pn_value,
                                   mark_epochs=True),
        cfg.haplotype_model, tcfg, steps_per_epoch=None,
        out_dir=os.path.join(args.output, "haplotype_train"),
        resume_from=args.resume,
        val_iter_factory=val_factory,
        lr_steps_per_epoch=steps_hint)
    print({"steps": state.step, "epochs": state.epoch})
    return 0


def _ensure_mpileup_dir(args, cfg, work_dir=None, contigs=None) -> str:
    if getattr(args, "mpileup_dir", None):
        return args.mpileup_dir
    work_dir = work_dir or args.output
    contigs = contigs if contigs is not None else args.contigs
    out = os.path.join(work_dir, "chr_mpileup")
    if getattr(args, "mpileup", None):
        if not os.path.isdir(out) or not os.listdir(out):
            stages.split_mpileup_by_contig(args.mpileup, out, contigs)
        return out
    if getattr(args, "bam", None):
        from . import external

        mp = os.path.join(work_dir, "pileup_data.mpileup")
        if not os.path.exists(mp):
            fc = cfg.pileup_feature
            external.run_mpileup(args.bam, args.ref, mp,
                                 min_mq=fc.mpileup_min_mq,
                                 max_depth=fc.mpileup_max_depth,
                                 excl_flags=fc.mpileup_excl_flags)
        stages.split_mpileup_by_contig(mp, out, contigs)
        return out
    raise SystemExit("one of --mpileup-dir / --mpileup / --bam is required")


def resolve_contigs(requested, ref) -> list:
    """Contigs the call pipeline works on: the user's --contigs, else the
    reference's major-contig order (run_caller.sh operates chr1..chrX/Y),
    else — when the FASTA uses nonstandard names (synthetic worlds,
    non-human assemblies) — every FASTA contig. Never empty for a
    non-empty FASTA: an empty list would silently skip s4/s5."""
    return (list(requested) if requested
            else [c for c in ALL_CHROMS if c in ref.by_name]
            or [e.name for e in ref.entries])


def _run_call(args, cfg) -> int:
    from ..parallel.launch import (barrier, host_contigs,
                                   initialize_distributed, merge_host_csvs,
                                   merge_host_vcfs)

    plan = initialize_distributed(
        coordinator_address=getattr(args, "coordinator", None),
        num_processes=getattr(args, "num_hosts", None),
        process_id=getattr(args, "host_id", None))
    ref = FastaReference(args.ref)
    all_contigs = resolve_contigs(args.contigs, ref)
    if plan.n_hosts > 1:
        # deterministic LPT contig fan-out over hosts (each host computes the
        # same plan; the reference's GNU-parallel chromosome fan-out at
        # process level, scripts/s3_phasing_long_reads.sh:35-69)
        contigs = host_contigs(
            plan, {c: ref.length(c) for c in all_contigs})
        work_dir = os.path.join(args.output, f"host{plan.host_id}")
    else:
        contigs = all_contigs
        work_dir = args.output
    os.makedirs(work_dir, exist_ok=True)
    runner = PipelineRunner(work_dir)
    shard_dir = os.path.join(work_dir, "pileup_shards")
    pileup_vcf = os.path.join(work_dir, "pileup.vcf")

    def s1(**kw):
        if args.bam:
            # native path: direct BAM pileup, no samtools round trip
            return stages.stage_pileup_features_from_bam(
                cfg, ref, args.bam, shard_dir, contigs)
        return stages.stage_pileup_features(
            cfg, ref, _ensure_mpileup_dir(args, cfg, work_dir, contigs),
            shard_dir, contigs)

    stage_list = [
        Stage("s1_pileup_features", s1, "BAM/mpileup -> candidate windows"),
        Stage("s2_pileup_predict",
              lambda **kw: stages.stage_pileup_predict(
                  cfg, ref, shard_dir, pileup_vcf,
                  model_path=args.pileup_model),
              "pileup model inference -> pileup.vcf"),
    ]
    if args.haplotype_model:
        from . import external
        from .extract import NativeBamExtractor

        hap_shards = os.path.join(work_dir, "haplotype_shards")
        hap_csv = os.path.join(work_dir, "haplotype.csv")
        merge_vcf = os.path.join(work_dir, "merge.vcf")
        tag_dir_holder = {}

        phase_native_dir = os.path.join(work_dir, "phase_native")

        def s3(**kw):
            if not args.bam:
                raise SystemExit("stages s3-s5 need --bam")
            mode = getattr(args, "phaser", "auto")
            if mode == "auto":
                mode = "whatshap" if external.have("whatshap") else "native"
            if mode == "unphased" or (mode == "whatshap"
                                      and not external.have("whatshap")):
                # No phaser. Unphased reads degrade the haplotype features
                # (every read lands in the 'unphased' group), so this is
                # opt-in — the reference hard-depends on whatshap
                # (scripts/s3_phasing_long_reads.sh:48-69).
                if not getattr(args, "allow_unphased", False):
                    raise SystemExit(
                        f"phaser '{mode}' unavailable: install whatshap, "
                        "use --phaser native (built-in), pass "
                        "--allow-unphased to run s4/s5 with every read "
                        "unphased (reduced accuracy), or drop "
                        "--haplotype-model to stop after the pileup stage.")
                tag_dir_holder["paths"] = {c: args.bam for c in contigs}
                return {"phased": 0, "unphased_fallback": True,
                        "note": f"phaser {mode} (--allow-unphased)"}
            if mode == "native":
                m = stages.stage_phase_native(
                    cfg, ref, pileup_vcf, args.bam, phase_native_dir,
                    contigs,
                    emit_tagged_bams=getattr(args, "emit_tagged_bams", False))
                tag_dir_holder["paths"] = {c: args.bam for c in contigs}
                tag_dir_holder["hp_overrides"] = \
                    stages.load_native_phase_overrides(phase_native_dir)
                m["engine"] = "native"
                return m
            from ..decode.sort import select_phasing_hetesnps

            work = os.path.join(work_dir, "phase_work")
            os.makedirs(work, exist_ok=True)
            with open(pileup_vcf) as f:
                header, per_contig = select_phasing_hetesnps(
                    f, cfg.haplotype_feature.phase_het_quality)
            split_vcfs = {}
            for ctg, rows in per_contig.items():
                p = os.path.join(work, f"{ctg}.splited.vcf")
                with open(p, "w") as f:
                    f.writelines(header)
                    f.writelines(rows)
                split_vcfs[ctg] = p
            split_bams = external.split_bam_by_contig(
                args.bam, list(split_vcfs), os.path.join(work, "split_bams"),
                threads=cfg.threads or 8)
            tagged = external.phase_and_haplotag(
                split_vcfs, split_bams, args.ref, work,
                threads=cfg.threads or 8)
            tag_dir_holder["paths"] = tagged
            return {"phased": len(tagged)}

        def s4(**kw):
            paths = tag_dir_holder.get("paths")
            hp_overrides = tag_dir_holder.get("hp_overrides")
            if not paths:
                # resumed run: pick up previously haplotagged BAMs or the
                # native phaser's HP partition if present
                tag_dir = os.path.join(work_dir, "phase_work",
                                       "haplotag_out")
                if os.path.isdir(tag_dir) and os.listdir(tag_dir):
                    paths = {f[:-4]: os.path.join(tag_dir, f)
                             for f in os.listdir(tag_dir)
                             if f.endswith(".bam")}
                elif os.path.isdir(phase_native_dir):
                    hp_overrides = stages.load_native_phase_overrides(
                        phase_native_dir)
                    if hp_overrides:
                        paths = {c: args.bam for c in contigs}
            if not paths:
                paths = {c: args.bam for c in contigs}
            extractor = NativeBamExtractor(
                paths, cfg.haplotype_feature.max_coverage,
                hp_overrides=hp_overrides,
                nbase_chunk_drop=cfg.haplotype_feature.nbase_chunk_drop)
            try:
                return stages.stage_haplotype_features(
                    cfg, ref, pileup_vcf, extractor, hap_shards)
            finally:
                extractor.close()

        def s5(**kw):
            from ..train.train_pileup import load_checkpoint

            params, _ = load_checkpoint(args.haplotype_model)
            return stages.stage_haplotype_predict(
                cfg, ref, hap_shards, hap_csv, params)

        # fingerprints: the merge knobs feed s5 (deferral gate drops rows
        # there) and s6; changing them on a resumed run must invalidate
        # the stale artifacts (pipeline.Stage.fingerprint).
        merge_fp = json.dumps(dataclasses.asdict(cfg.merge), sort_keys=True)
        stage_list += [
            Stage("s3_phasing", s3, "whatshap phase + haplotag"),
            Stage("s4_haplotype_features", s4,
                  "group selection + read matrices"),
            Stage("s5_haplotype_predict", s5,
                  "haplotype model inference -> haplotype.csv",
                  fingerprint=f"defer={cfg.merge.defer_unphased_frac}"),
            Stage("s6_merge",
                  lambda **kw: stages.stage_merge(cfg, pileup_vcf, hap_csv,
                                                  merge_vcf),
                  "merge calls", fingerprint=merge_fp),
        ]
        # kick the s5 model compile now: it is the longest compile in the
        # pipeline (minutes cold on TPU) with config-fixed shapes, so it
        # hides behind s1-s4 instead of serializing in front of s5. Skipped
        # when s5 is already .done (resume) - nothing would use it.
        s5_done = os.path.join(work_dir, ".stages",
                               "s5_haplotype_predict.done")
        if args.no_resume or not os.path.exists(s5_done):
            stages.prewarm_haplotype_model(cfg, args.haplotype_model)
    s2_done = os.path.join(work_dir, ".stages", "s2_pileup_predict.done")
    if args.no_resume or not os.path.exists(s2_done):
        stages.prewarm_pileup_model(cfg, args.pileup_model)
    runner.run(stage_list, resume=not args.no_resume)
    # outstanding prewarm compiles abort the interpreter if still running
    # at shutdown (possible when a stage had zero sites and never waited
    # on the compiled program) — join them before returning.
    stages.join_prewarm_threads()

    if plan.n_hosts > 1:
        # all hosts finished their contig shard; host 0 gathers the final
        # artifacts in global contig order (reference: file concatenation of
        # per-chromosome outputs; here sortvcf.py-ordered merge)
        barrier("nsp_call_gather")
        if plan.host_id == 0:
            host_dirs = [os.path.join(args.output, f"host{h}")
                         for h in range(plan.n_hosts)]
            for name, merge_fn in (("pileup.vcf", merge_host_vcfs),
                                   ("merge.vcf", merge_host_vcfs),
                                   ("haplotype.csv", merge_host_csvs)):
                paths = [os.path.join(d, name) for d in host_dirs
                         if os.path.exists(os.path.join(d, name))]
                if paths:
                    n = merge_fn(paths, os.path.join(args.output, name))
                    runner.log.info("gathered %s: %d rows from %d hosts",
                                    name, n, len(paths))
        barrier("nsp_call_done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
