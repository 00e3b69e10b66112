"""Unphased-site deferral gate (MergeConfig.defer_unphased_frac).

Candidates whose covering reads carry no HP tag have an all-zero hap
channel — the haplotype model is blind there (no reference counterpart;
rationale and the v3-retrain negative result that motivated a decode-time
gate are in scripts/train_haplotype_mixed.py). With the gate on, s5 emits
no CSV row for such sites, so merge.py's absent-site rule keeps the
pileup call. Default (0.0) must preserve reference behavior exactly.
"""
import numpy as np

import jax

from nanosnp_tpu import constants as C
from nanosnp_tpu.config import HaplotypeModelConfig, PipelineConfig
from nanosnp_tpu.io import bins
from nanosnp_tpu.io.fasta import FastaReference, write_fasta
from nanosnp_tpu.models.haplotype_model import init_haplotype_params
from nanosnp_tpu.runtime import stages

from test_s5_deep_buckets import _random_shard


def _cfg():
    cfg = PipelineConfig()
    cfg.inference.batch_size = 256
    cfg.inference.use_bf16 = False
    cfg.inference.use_pallas = False
    cfg.haplotype_model = HaplotypeModelConfig(hidden_size=8, lstm_layers=1)
    return cfg


def _world(tmp_path, rng, cfg, n=30, depth=20):
    flank = cfg.haplotype_feature.pileup_flanking_size
    adj = cfg.haplotype_feature.adjacent_size
    genome = {"chrU": "".join(rng.choice(list("ACGT"), size=20000))}
    write_fasta(str(tmp_path / "ref.fa"), genome)
    ref = FastaReference(str(tmp_path / "ref.fa"))
    shard = _random_shard(rng, "chrU", n, depth, flank, adj)
    # first half: untag every read so the candidate column's phased
    # fraction is 0 — quarter 1 uses 0 (seq-gap cells), quarter 2 uses 3
    # (the production untagged-read value, reference group-3 convention);
    # second half keeps the random 1/2/3 tags (fraction ~2/3 > threshold)
    h = shard.haplotype["hap"]
    q = n // 4
    h[:q] = np.where(h[:q] == C.PAD_VALUE, C.PAD_VALUE, 0)
    h[q: n // 2] = np.where(h[q: n // 2] == C.PAD_VALUE, C.PAD_VALUE, 3)
    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    bins.save_haplotype_shard(str(shard_dir / "chrU_d32x32"), shard)
    return ref, shard, shard_dir


def test_gate_off_is_reference_behavior(tmp_path):
    rng = np.random.default_rng(11)
    cfg = _cfg()
    # default is ON since r3; reference byte-parity requires explicit 0
    cfg.merge.defer_unphased_frac = 0.0
    ref, shard, shard_dir = _world(tmp_path, rng, cfg)
    params = init_haplotype_params(jax.random.key(2), cfg.haplotype_model)
    out = tmp_path / "hap.csv"
    m = stages.stage_haplotype_predict(cfg, ref, str(shard_dir), str(out),
                                       params)
    assert m["sites"] == len(shard)
    assert len(out.read_text().strip().splitlines()) == len(shard)


def test_gate_drops_only_unphased_candidates(tmp_path):
    rng = np.random.default_rng(11)
    cfg = _cfg()
    cfg.merge.defer_unphased_frac = 0.25
    ref, shard, shard_dir = _world(tmp_path, rng, cfg)
    params = init_haplotype_params(jax.random.key(2), cfg.haplotype_model)
    out = tmp_path / "hap.csv"
    m = stages.stage_haplotype_predict(cfg, ref, str(shard_dir), str(out),
                                       params)
    rows = out.read_text().strip().splitlines()
    n = len(shard)
    assert m["deferred"] == n // 2
    emitted = {int(r.split("\t")[1]) for r in rows}
    unphased = set(shard.candidate_positions[: n // 2].tolist())
    phased = set(shard.candidate_positions[n // 2:].tolist())
    assert emitted == phased
    assert not (emitted & unphased)


def test_merge_falls_back_to_pileup_on_deferred_site(tmp_path):
    """End of the chain: a deferred (absent) site with pileup QUAL in
    [13, 19] passes through with INFO=P — identical to merge.py's
    absent-site rule, which is the whole point of the gate."""
    from nanosnp_tpu.decode.merge import merge_calls
    import io

    pileup = [
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tSAMPLE\n",
        "chrU\t100\t.\tA\tG\t15.0\tPASS\t.\tGT:GQ:DP:AF\t0/1:15:20:0.4\n",
    ]
    out = io.StringIO()
    merge_calls(iter(pileup), iter([]), out)
    body = [l for l in out.getvalue().splitlines() if not l.startswith("#")]
    assert len(body) == 1
    f = body[0].split("\t")
    assert (f[1], f[7]) == ("100", "P")
