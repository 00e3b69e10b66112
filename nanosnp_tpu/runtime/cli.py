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


def main(argv=None):
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

    args = parser.parse_args(argv)

    if args.cmd == "sort-vcf":
        from ..decode.sort import sort_vcf_lines

        with open(args.input) as f:
            lines = sort_vcf_lines(f)
        with open(args.output, "w") as f:
            f.writelines(lines)
        return 0

    cfg = load_config(args.config)
    if args.threads:
        cfg.threads = args.threads
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

    if args.cmd == "call":
        return _run_call(args, cfg)

    return 1


def _ensure_mpileup_dir(args, cfg) -> str:
    if getattr(args, "mpileup_dir", None):
        return args.mpileup_dir
    out = os.path.join(args.output, "chr_mpileup")
    if getattr(args, "mpileup", None):
        if not os.path.isdir(out) or not os.listdir(out):
            stages.split_mpileup_by_contig(args.mpileup, out, args.contigs)
        return out
    if getattr(args, "bam", None):
        from . import external

        mp = os.path.join(args.output, "pileup_data.mpileup")
        if not os.path.exists(mp):
            fc = cfg.pileup_feature
            external.run_mpileup(args.bam, args.ref, mp,
                                 min_mq=fc.mpileup_min_mq,
                                 max_depth=fc.mpileup_max_depth,
                                 excl_flags=fc.mpileup_excl_flags)
        stages.split_mpileup_by_contig(mp, out, args.contigs)
        return out
    raise SystemExit("one of --mpileup-dir / --mpileup / --bam is required")


def _run_call(args, cfg) -> int:
    ref = FastaReference(args.ref)
    contigs = args.contigs or [c for c in ALL_CHROMS if c in ref.by_name]
    runner = PipelineRunner(args.output)
    shard_dir = os.path.join(args.output, "pileup_shards")
    pileup_vcf = os.path.join(args.output, "pileup.vcf")

    def s1(**kw):
        if args.bam:
            # native path: direct BAM pileup, no samtools round trip
            return stages.stage_pileup_features_from_bam(
                cfg, ref, args.bam, shard_dir, contigs)
        return stages.stage_pileup_features(
            cfg, ref, _ensure_mpileup_dir(args, cfg), shard_dir, contigs)

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

        hap_shards = os.path.join(args.output, "haplotype_shards")
        hap_csv = os.path.join(args.output, "haplotype.csv")
        merge_vcf = os.path.join(args.output, "merge.vcf")
        tag_dir_holder = {}

        def s3(**kw):
            if not args.bam:
                raise SystemExit("stages s3-s5 need --bam")
            if not external.have("whatshap"):
                # no phaser available: proceed unphased (HP tags absent ->
                # every read lands in the 'unphased' feature group)
                tag_dir_holder["paths"] = {c: args.bam for c in contigs}
                return {"phased": 0, "note": "whatshap unavailable"}
            from ..decode.sort import select_phasing_hetesnps

            work = os.path.join(args.output, "phase_work")
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
            if not paths:
                # resumed run: pick up previously haplotagged BAMs if present
                tag_dir = os.path.join(args.output, "phase_work",
                                       "haplotag_out")
                if os.path.isdir(tag_dir) and os.listdir(tag_dir):
                    paths = {f[:-4]: os.path.join(tag_dir, f)
                             for f in os.listdir(tag_dir)
                             if f.endswith(".bam")}
            if not paths:
                paths = {c: args.bam for c in contigs}
            extractor = NativeBamExtractor(
                paths, cfg.haplotype_feature.max_coverage)
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

        stage_list += [
            Stage("s3_phasing", s3, "whatshap phase + haplotag"),
            Stage("s4_haplotype_features", s4,
                  "group selection + read matrices"),
            Stage("s5_haplotype_predict", s5,
                  "haplotype model inference -> haplotype.csv"),
            Stage("s6_merge",
                  lambda **kw: stages.stage_merge(cfg, pileup_vcf, hap_csv,
                                                  merge_vcf),
                  "merge calls"),
        ]
    runner.run(stage_list, resume=not args.no_resume)
    return 0


if __name__ == "__main__":
    sys.exit(main())
