"""Decompose the s1 BAM-path chunk time (VERDICT r4 #2).

Phases per chunk (stage_pileup_features_from_bam's one_chunk):
  native  nsp_bam_pileup_region (ctypes call, GIL released inside)
  alt     the per-candidate alt_info decode loop (GIL)
  asm     assemble_windows (numpy, GIL)
  pb      predict_batch (numpy, GIL)
Plus alloc: the np.zeros scratch allocations in the wrapper (GIL).

Usage: python scripts/profile_s1.py [world_dir] [mbp] [cov]
Reuses world_dir if it already holds world.json (so repeated profiling
doesn't regenerate).
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))
sys.path.insert(0, os.path.join(REPO, "tests"))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def main(wdir="/tmp/s1_world", mbp=16, cov=30):
    from make_world import make_world
    from nanosnp_tpu.config import PipelineConfig
    from nanosnp_tpu.features.pileup import assemble_windows, predict_batch
    from nanosnp_tpu.io.bam import BamFile
    from nanosnp_tpu.io.fasta import FastaReference
    from nanosnp_tpu.runtime import stages

    marker = os.path.join(wdir, "world.json")
    if os.path.exists(marker):
        res = json.load(open(marker))
    else:
        t0 = time.perf_counter()
        res = make_world(wdir, {"chrS": mbp * 1_000_000}, coverage=cov,
                         read_len=3000, seed=99)
        print(f"[world] {mbp} Mbp x {cov}x in "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
        json.dump({"fasta": res["fasta"], "bam": res["bam"]},
                  open(marker, "w"))
    ref = FastaReference(res["fasta"])
    cfg = PipelineConfig()
    fc = cfg.pileup_feature
    flank = fc.flanking_bases
    ctg = ref.names[0]
    seq = ref.contig(ctg)
    length = len(seq)
    chunk_size = 2_000_000

    # ---- phase decomposition, single thread ----
    with BamFile(res["bam"]) as bam:
        bam.references()
        phases = {"native": 0.0, "asm": 0.0, "pb": 0.0}
        rows = cands = 0
        starts = list(range(0, length, chunk_size))
        t_all0 = time.perf_counter()
        for s in starts:
            e = min(s + chunk_size, length)
            t0 = time.perf_counter()
            pile = bam.pileup_region(
                ctg, max(s - flank, 0), min(e + flank, length), seq,
                snp_min_af=fc.snp_min_af, indel_min_af=fc.indel_min_af,
                min_coverage=fc.min_depth, max_indel=fc.max_indel_size,
                min_mq=fc.mpileup_min_mq, excl_flags=fc.mpileup_excl_flags,
                max_depth=fc.mpileup_max_depth, depth_mode=fc.depth_mode)
            t1 = time.perf_counter()
            batch = assemble_windows(pile, seq, flank, emit_lo=s, emit_hi=e)
            t2 = time.perf_counter()
            fsub = predict_batch(batch)
            t3 = time.perf_counter()
            phases["native"] += t1 - t0
            phases["asm"] += t2 - t1
            phases["pb"] += t3 - t2
            rows += len(pile.positions)
            cands += len(fsub)
        wall = time.perf_counter() - t_all0
    print(json.dumps({"phase_seconds": {k: round(v, 3)
                                        for k, v in phases.items()},
                      "phase_pct": {k: round(100 * v / wall, 1)
                                    for k, v in phases.items()},
                      "serial_wall_s": round(wall, 2),
                      "rows": rows, "cands": cands,
                      "rows_per_s_serial": round(rows / wall, 1)}),
          flush=True)

    # ---- stage-level thread curve (fresh BamFile per run: cold cache
    # handled by a warmup run at each thread count) ----
    curve = {}
    for nt in (1, 2, 4):
        cfg.threads = nt
        ts = []
        for rep in range(3):
            sd = os.path.join(wdir, f"prof_{nt}_{rep}")
            t0 = time.perf_counter()
            m = stages.stage_pileup_features_from_bam(
                cfg, ref, res["bam"], sd, [ctg], chunk_size=chunk_size)
            ts.append(m["rows"] / (time.perf_counter() - t0))
        curve[nt] = sorted(ts)[1]
        print(f"[curve] threads={nt}: {curve[nt]:,.0f} rows/s "
              f"(runs {[f'{t:,.0f}' for t in ts]})", flush=True)
    print(json.dumps({"stage_rows_per_s_by_threads": curve,
                      "scaling_4t": round(curve[4] / curve[1], 2)}),
          flush=True)


if __name__ == "__main__":
    wd = sys.argv[1] if len(sys.argv) > 1 else "/tmp/s1_world"
    mbp = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    cov = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    main(wd, mbp, cov)
