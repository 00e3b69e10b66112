"""Promotion gate for the v6 haplotype checkpoint (VERDICT r3 #2).

Runs the defer A/B (scripts/eval_defer_unphased.py worlds, same seeds) with
the CANDIDATE weights, loads the fresh v5 baseline
(docs/evidence/defer_ab_v5_r4.json) and the candidate trainer's own
f1_results.json (OOD ONT world), then checks every ship criterion from
scripts/train_haplotype_v6.py's docstring:

  (a) sparse merge_OFF F1 >= pileup baseline F1   [the headline fix:
      graceful degradation without the gate; v5: 0.349 vs 0.690]
  (b) mid + dense merge_ON F1 >= v5 - 0.01        [no material regression
      at the shipped operating point]
  (c) OOD ONT merge_off > ood pileup              [keep v5's win]

On PASS: copies the candidate npz over the shipped
nanosnp_tpu/models/weights/ont_haplotype_synthetic.npz, writes
docs/evidence/defer_ab_v6_r4.json (+ a v5-vs-v6 comparison table in the
JSON) and prints next steps. On FAIL: prints the failing criteria and
leaves the shipped checkpoint untouched.

Usage: python scripts/ship_haplotype_v6.py <train_out_dir> [ab_out_dir]
"""
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(train_dir, ab_dir=None):
    ab_dir = ab_dir or os.path.join(train_dir, "defer_ab")
    cand = os.path.join(train_dir, "ont_haplotype_synthetic.npz")
    f1_path = os.path.join(train_dir, "f1_results.json")
    if not (os.path.exists(cand) and os.path.exists(f1_path)):
        sys.exit(f"candidate incomplete: need {cand} and {f1_path}")
    with open(f1_path) as f:
        trainer_f1 = json.load(f)

    import hashlib
    with open(cand, "rb") as f:
        cand_sha = hashlib.sha256(f.read()).hexdigest()

    ab_json = os.path.join(ab_dir, "defer_ab.json")
    # stale-guard: an A/B produced from ANY other weights (earlier
    # candidate, or a user-passed ab_dir from a different run) must not
    # gate this one — match by content hash, not mtimes
    if os.path.exists(ab_json):
        with open(ab_json) as f:
            prev = json.load(f)
        if prev.get("weights_sha256") != cand_sha:
            print("[ship] defer_ab.json was produced by different weights "
                  f"(sha {str(prev.get('weights_sha256'))[:12]}... vs "
                  f"candidate {cand_sha[:12]}...) — rerunning", flush=True)
            os.remove(ab_json)
    if not os.path.exists(ab_json):
        print(f"[ship] running defer A/B -> {ab_dir}", flush=True)
        subprocess.run(
            [sys.executable,
             os.path.join(REPO, "scripts", "eval_defer_unphased.py"),
             ab_dir, "0.01", cand],
            check=True, cwd=REPO)
    with open(ab_json) as f:
        v6 = json.load(f)
    if v6.get("weights_sha256") != cand_sha:
        sys.exit(f"[ship] A/B weights hash mismatch after rerun: "
                 f"{v6.get('weights_sha256')} != {cand_sha}")
    with open(os.path.join(REPO, "docs", "evidence",
                           "defer_ab_v5_r4.json")) as f:
        v5 = json.load(f)

    checks = []

    def chk(name, ok, detail):
        checks.append((name, bool(ok), detail))
        print(f"[ship] {'PASS' if ok else 'FAIL'} {name}: {detail}",
              flush=True)

    sp6, sp5 = v6["sparse"], v5["sparse"]
    chk("a. sparse merge_off >= pileup",
        sp6["merge_off"]["f1"] >= sp6["pileup"]["f1"],
        f"merge_off {sp6['merge_off']['f1']:.3f} vs pileup "
        f"{sp6['pileup']['f1']:.3f} (v5 was {sp5['merge_off']['f1']:.3f})")
    for w in ("mid", "dense"):
        chk(f"b. {w} merge_on not below v5",
            v6[w]["merge_on"]["f1"] >= v5[w]["merge_on"]["f1"] - 0.01,
            f"{v6[w]['merge_on']['f1']:.3f} vs v5 "
            f"{v5[w]['merge_on']['f1']:.3f}")
    ood_m, ood_p = trainer_f1["ood_merge_off"], trainer_f1["ood_pileup"]
    chk("c. OOD ONT merge_off > pileup",
        ood_m["f1"] > ood_p["f1"],
        f"merge_off {ood_m['f1']:.3f} vs pileup {ood_p['f1']:.3f}")

    failed = [n for n, ok, _ in checks if not ok]
    if failed:
        print(f"[ship] NOT promoting v6 — failed: {failed}", flush=True)
        sys.exit(1)

    shipped = os.path.join(REPO, "nanosnp_tpu", "models", "weights",
                           "ont_haplotype_synthetic.npz")
    shutil.copyfile(cand, shipped)
    out = {
        "candidate": "v6",
        "checks": [{"name": n, "pass": ok, "detail": d}
                   for n, ok, d in checks],
        "trainer_f1": trainer_f1,
        "defer_ab_v6": v6,
        "v5_vs_v6": {
            w: {"merge_off_f1": [v5[w]["merge_off"]["f1"],
                                 v6[w]["merge_off"]["f1"]],
                "merge_on_f1": [v5[w]["merge_on"]["f1"],
                                v6[w]["merge_on"]["f1"]],
                "pileup_f1": [v5[w]["pileup"]["f1"], v6[w]["pileup"]["f1"]]}
            for w in ("sparse", "mid", "dense")},
    }
    ev = os.path.join(REPO, "docs", "evidence", "defer_ab_v6_r5.json")
    with open(ev, "w") as f:
        json.dump(out, f, indent=1)
    print(f"[ship] v6 PROMOTED -> {shipped}\n[ship] evidence -> {ev}",
          flush=True)


if __name__ == "__main__":
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    main(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else None)
