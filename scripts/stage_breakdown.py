"""Per-stage s/Mbp breakdown of a full `call` run (VERDICT r3 #1).

Runs the pipeline end-to-end on a world directory (scripts/make_world.py
layout: ref.fa, reads.bam, truth.vcf), collects the .stages/*.done wall
seconds, normalizes to s/Mbp, and writes a JSON evidence record with the
world geometry, per-stage breakdown, merge/pileup F1, and host metadata.

  python scripts/stage_breakdown.py --world /tmp/w100 --out docs/evidence/...
  [--platform tpu|cpu] [--threads 4] [--tag label]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PILEUP_CKPT = "/root/reference/PileupModel/models/ont_pileup.chkpt"
HAPLO_CKPT = os.path.join(
    REPO, "nanosnp_tpu/models/weights/ont_haplotype_synthetic.npz")


def run_call(world: str, out_dir: str, platform: str, threads: int,
             contigs=None, resume: bool = True) -> float:
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    if platform == "cpu":
        env["JAX_PLATFORMS"] = "cpu"
        code = ("import jax; jax.config.update('jax_platforms','cpu'); "
                "import sys; from nanosnp_tpu.runtime.cli import main; "
                "sys.exit(main(sys.argv[1:]))")
    else:
        # tunnel TPU: the persistent compile cache can hang s2 (see
        # .claude/skills/verify) — disable it
        env["NSP_JAX_CACHE"] = "0"
        code = ("import sys; from nanosnp_tpu.runtime.cli import main; "
                "sys.exit(main(sys.argv[1:]))")
    cmd = [sys.executable, "-c", code, "call",
           "--bam", os.path.join(world, "reads.bam"),
           "--ref", os.path.join(world, "ref.fa"),
           "--pileup-model", PILEUP_CKPT,
           "--haplotype-model", HAPLO_CKPT,
           "--phaser", "native",
           "--threads", str(threads),
           "-o", out_dir]
    if contigs:
        cmd += ["--contigs"] + list(contigs)
    if not resume:
        cmd += ["--no-resume"]
    t0 = time.time()
    r = subprocess.run(cmd, env=env, capture_output=True, text=True)
    wall = time.time() - t0
    if r.returncode != 0:
        raise RuntimeError(f"call failed rc={r.returncode}:\n"
                           f"{r.stderr[-3000:]}")
    return wall


def collect(world: str, out_dir: str, wall: float, platform: str,
            threads: int, tag: str) -> dict:
    from nanosnp_tpu.eval.f1 import evaluate_calls
    from nanosnp_tpu.io.fasta import FastaReference

    ref = FastaReference(os.path.join(world, "ref.fa"))
    mbp = sum(e.length for e in ref.entries) / 1e6

    stages = {}
    sdir = os.path.join(out_dir, ".stages")
    for f in sorted(os.listdir(sdir)):
        j = json.load(open(os.path.join(sdir, f)))
        name = f[: -len(".done")]
        stages[name] = {
            "seconds": round(j.get("seconds", 0.0), 2),
            "s_per_mbp": round(j.get("seconds", 0.0) / mbp, 3),
            "metrics": j.get("metrics", {}),
        }

    truth = open(os.path.join(world, "truth.vcf")).read().splitlines()
    res = {}
    for name in ("pileup", "merge"):
        p = os.path.join(out_dir, f"{name}.vcf")
        if os.path.exists(p):
            res[name] = evaluate_calls(
                open(p).read().splitlines(), truth).summary()

    stage_total = sum(s["seconds"] for s in stages.values())
    return {
        "tag": tag,
        "world": {"mbp": round(mbp, 1), "path": world},
        "platform": platform,
        "threads": threads,
        "wall_s": round(wall, 1),
        "stage_total_s": round(stage_total, 1),
        "stage_total_s_per_mbp": round(stage_total / mbp, 3),
        "stages": stages,
        "f1": res,
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--world", required=True)
    ap.add_argument("--out", default=None, help="JSON output path")
    ap.add_argument("--out-dir", default=None, help="pipeline work dir")
    ap.add_argument("--platform", default="tpu", choices=["tpu", "cpu"])
    ap.add_argument("--threads", type=int, default=4)
    ap.add_argument("--tag", default="")
    ap.add_argument("--contigs", nargs="*", default=None)
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args(argv)

    out_dir = args.out_dir or os.path.join(args.world,
                                           f"out_{args.platform}")
    wall = run_call(args.world, out_dir, args.platform, args.threads,
                    contigs=args.contigs, resume=not args.no_resume)
    rec = collect(args.world, out_dir, wall, args.platform, args.threads,
                  args.tag)
    text = json.dumps(rec, indent=1)
    print(text)
    if args.out:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            f.write(text + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
