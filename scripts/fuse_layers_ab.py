"""On-chip A/B for the whole-encoder fusion kernel (NSP_FUSE_LAYERS).

Same-condition comparison (interleaved runs, shared RTT floor, chained
fori_loop timing — bench.py methodology) of the pileup model with the
two-layer fused kernel ON vs OFF, plus an argmax-identity check on the
production checkpoint. Writes docs/evidence/fuse_layers_ab_r5.json.

Usage: python scripts/fuse_layers_ab.py [reps]
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def main(reps=5):
    import jax
    import jax.numpy as jnp

    from nanosnp_tpu.config import PileupModelConfig
    from nanosnp_tpu.models.convert import load_pileup_checkpoint
    from nanosnp_tpu.models.pileup_model import pileup_predict

    assert jax.devices()[0].platform == "tpu", "needs the real chip"
    cfg = PileupModelConfig()
    params = jax.tree.map(jnp.asarray, load_pileup_checkpoint(
        "/root/reference/PileupModel/models/ont_pileup.chkpt"))
    batch = 16384
    iters = 20
    x = jnp.asarray(
        np.random.default_rng(0).integers(-40, 40, (batch, 33, 18)),
        jnp.float32)

    def make_many():
        @jax.jit
        def many(p, x, iters):
            def body(_, carry):
                x, acc = carry
                gt, zy = pileup_predict(p, x + acc * 1e-3, cfg,
                                        compute_dtype=jnp.bfloat16,
                                        use_pallas=True)
                return (x, gt.mean())

            _, acc = jax.lax.fori_loop(0, iters, body,
                                       (x, jnp.float32(0.0)))
            return acc

        return many

    # argmax identity between the two paths on the production ckpt
    outs = {}
    for flag in ("0", "1"):
        os.environ["NSP_FUSE_LAYERS"] = flag
        gt, zy = jax.jit(lambda p, x: pileup_predict(
            p, x, cfg, compute_dtype=jnp.bfloat16, use_pallas=True))(
                params, x[:4096])
        outs[flag] = (np.asarray(gt), np.asarray(zy))
    gt_match = (outs["0"][0].argmax(1) == outs["1"][0].argmax(1)).mean()
    zy_match = (outs["0"][1].argmax(1) == outs["1"][1].argmax(1)).mean()
    print(f"[ab] argmax identity: gt {gt_match:.6f} zy {zy_match:.6f}",
          flush=True)

    # interleaved timing, one compiled program per flag
    progs = {}
    for flag in ("0", "1"):
        os.environ["NSP_FUSE_LAYERS"] = flag
        m = make_many()
        float(m(params, x, jnp.int32(1)))   # compile + warm
        progs[flag] = m
    t1 = {f: min(self_t(progs[f], params, x, 1) for _ in range(3))
          for f in progs}
    rates = {f: [] for f in progs}
    for _ in range(reps):
        for f in ("0", "1"):
            tk = self_t(progs[f], params, x, iters + 1)
            rates[f].append(batch / max((tk - t1[f]) / iters, 1e-9))
    res = {}
    flops = _flops_per_site()
    for f in ("0", "1"):
        rs = sorted(rates[f])
        med = rs[len(rs) // 2]
        res["fused" if f == "1" else "split"] = {
            "sites_per_s": round(med, 1),
            "spread": [round(rs[0], 1), round(rs[-1], 1)],
            "mfu_pct": round(100 * med * flops / 197e12, 2),
        }
    res["argmax_identity"] = {"gt": float(gt_match), "zy": float(zy_match)}
    res["speedup"] = round(res["fused"]["sites_per_s"]
                           / res["split"]["sites_per_s"], 4)
    out = os.path.join(REPO, "docs", "evidence", "fuse_layers_ab_r5.json")
    with open(out, "w") as fh:
        json.dump(res, fh, indent=1)
    print(json.dumps(res, indent=1), flush=True)


def self_t(m, params, x, n):
    import jax.numpy as jnp

    t0 = time.perf_counter()
    float(m(params, x, jnp.int32(n)))
    return time.perf_counter() - t0


def _flops_per_site():
    per_t = 0
    for l in range(2):
        di = 18 if l == 0 else 128
        per_t += 2 * (2 * di * 4 * 64 + 2 * 64 * 4 * 64)
    return per_t * 33 + 33 * 2 * 128 * 128


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 5)
