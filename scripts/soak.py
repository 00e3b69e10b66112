"""Chromosome-scale soak (VERDICT r3 #5): one contig at real chromosome
size through the full `call` CLI with RSS sampling.

Verifies the O(chunk) streaming claims past 20 Mbp: flat memory across
the run (RSS time series + per-stage peaks), `.nsi` sidecar behavior at
scale (build once, reopen skips the scan), per-stage wall, and an
extrapolated 30x whole-genome wall against the reference's documented
operating point (README.md:24-26: tens of hours at 40 threads for a
~3 Gbp ONT genome through samtools+whatshap+torch).

  python scripts/soak.py --out docs/evidence/soak_r4.json \
      [--world /tmp/w250] [--mbp 250] [--coverage 20] [--platform tpu]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

PILEUP_CKPT = "/root/reference/PileupModel/models/ont_pileup.chkpt"
HAPLO_CKPT = os.path.join(
    REPO, "nanosnp_tpu/models/weights/ont_haplotype_synthetic.npz")


def _tree_rss_mb(pid: int) -> float:
    """RSS of pid + descendants, MB."""
    total = 0
    try:
        pids = [pid]
        seen = set()
        while pids:
            p = pids.pop()
            if p in seen:
                continue
            seen.add(p)
            try:
                with open(f"/proc/{p}/status") as f:
                    for line in f:
                        if line.startswith("VmRSS:"):
                            total += int(line.split()[1])
                            break
                with open(f"/proc/{p}/task/{p}/children") as f:
                    pids += [int(c) for c in f.read().split()]
            except (FileNotFoundError, ProcessLookupError):
                pass
    except Exception:
        pass
    return total / 1024.0


def run_soak(world: str, out_dir: str, platform: str, threads: int,
             sample_s: float = 5.0):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    if platform == "cpu":
        env["JAX_PLATFORMS"] = "cpu"
        code = ("import jax; jax.config.update('jax_platforms','cpu'); "
                "import sys; from nanosnp_tpu.runtime.cli import main; "
                "sys.exit(main(sys.argv[1:]))")
    else:
        env["NSP_JAX_CACHE"] = "0"
        code = ("import sys; from nanosnp_tpu.runtime.cli import main; "
                "sys.exit(main(sys.argv[1:]))")
    cmd = [sys.executable, "-c", code, "call",
           "--bam", os.path.join(world, "reads.bam"),
           "--ref", os.path.join(world, "ref.fa"),
           "--pileup-model", PILEUP_CKPT,
           "--haplotype-model", HAPLO_CKPT,
           "--phaser", "native", "--threads", str(threads),
           "-o", out_dir]
    samples = []
    t0 = time.time()
    proc = subprocess.Popen(cmd, env=env, stdout=subprocess.DEVNULL,
                            stderr=subprocess.PIPE)

    def sampler():
        while proc.poll() is None:
            samples.append((round(time.time() - t0, 1),
                            round(_tree_rss_mb(proc.pid), 1)))
            time.sleep(sample_s)

    th = threading.Thread(target=sampler, daemon=True)
    th.start()
    _, err = proc.communicate()
    th.join(timeout=10)
    wall = time.time() - t0
    if proc.returncode != 0:
        raise RuntimeError(f"call failed rc={proc.returncode}: "
                           f"{err[-2000:].decode()}")
    return wall, samples


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--world", default="/tmp/w250")
    ap.add_argument("--mbp", type=float, default=250.0)
    ap.add_argument("--coverage", type=int, default=20)
    ap.add_argument("--platform", default="tpu", choices=["tpu", "cpu"])
    ap.add_argument("--threads", type=int, default=4)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    from make_world import make_world

    bam = os.path.join(args.world, "reads.bam")
    if not os.path.exists(bam):
        t0 = time.time()
        res = make_world(args.world, {"chrS": int(args.mbp * 1e6)},
                         coverage=args.coverage, read_len=3000, seed=21)
        print(f"[world] built in {time.time() - t0:.0f}s: {res}",
              flush=True)

    # .nsi behavior: first open builds the index, second open must skip
    # the whole-file scan (orders faster)
    from nanosnp_tpu.io.bam import BamFile

    nsi = bam + ".nsi"
    if os.path.exists(nsi):
        os.unlink(nsi)
    t0 = time.time()
    BamFile(bam).close()
    t_cold = time.time() - t0
    t0 = time.time()
    BamFile(bam).close()
    t_warm = time.time() - t0
    nsi_mb = os.path.getsize(nsi) / 1e6 if os.path.exists(nsi) else None
    nsi_txt = f"{nsi_mb:.1f} MB" if nsi_mb is not None else "absent"
    print(f"[nsi] cold open {t_cold:.1f}s, warm reopen {t_warm:.2f}s, "
          f"sidecar {nsi_txt}", flush=True)

    out_dir = os.path.join(args.world, f"out_{args.platform}")
    wall, samples = run_soak(args.world, out_dir, args.platform,
                             args.threads)

    stages = {}
    sdir = os.path.join(out_dir, ".stages")
    for f in sorted(os.listdir(sdir)):
        j = json.load(open(os.path.join(sdir, f)))
        stages[f[:-5]] = {"seconds": round(j.get("seconds", 0.0), 1),
                          "metrics": j.get("metrics", {})}

    from nanosnp_tpu.eval.f1 import evaluate_calls

    truth = open(os.path.join(args.world, "truth.vcf")).read().splitlines()
    f1 = {}
    for name in ("pileup", "merge"):
        p = os.path.join(out_dir, f"{name}.vcf")
        if os.path.exists(p):
            f1[name] = evaluate_calls(open(p).read().splitlines(),
                                      truth).summary()

    rss = [s[1] for s in samples] or [0]
    # flatness: peak vs the median of the steady region (skip warmup)
    steady = rss[len(rss) // 4:] or rss
    rec = {
        "world_mbp": args.mbp,
        "coverage": args.coverage,
        "platform": args.platform,
        "threads": args.threads,
        "wall_s": round(wall, 1),
        "s_per_mbp": round(wall / args.mbp, 3),
        "extrapolated_3gbp_30x_hours": round(
            wall / args.mbp * 3000 * (30 / args.coverage) / 3600, 2),
        "nsi": {"cold_open_s": round(t_cold, 1),
                "warm_reopen_s": round(t_warm, 2),
                "sidecar_mb": round(nsi_mb, 1) if nsi_mb else None},
        "rss_mb": {"peak": max(rss), "median_steady": sorted(steady)[
            len(steady) // 2], "n_samples": len(rss)},
        "rss_series_head": samples[:5],
        "rss_flat": max(rss) < 2.5 * sorted(steady)[len(steady) // 2],
        "stages": stages,
        "f1": f1,
        "reference_operating_point":
            "run_caller.sh on ~3 Gbp ONT 30x: tens of hours at 40 "
            "threads (samtools mpileup + whatshap dominate; "
            "/root/reference/README.md:24-26)",
    }
    text = json.dumps(rec, indent=1)
    print(text)
    if args.out:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        open(args.out, "w").write(text + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
