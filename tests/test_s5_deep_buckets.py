"""s5 deep-bucket paths: featurize sub-batching (fs < model batch with
device concat) and the remainder repeat-fill, vs a direct unpooled
reference computation on the same rows."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nanosnp_tpu import constants as C
from nanosnp_tpu.config import HaplotypeModelConfig, PipelineConfig
from nanosnp_tpu.features.haplotype import (haplotype_features,
                                            ref_window_codes,
                                            ref_position_codes)
from nanosnp_tpu.io import bins
from nanosnp_tpu.io.fasta import write_fasta
from nanosnp_tpu.models.haplotype_model import (haplotype_predict,
                                                init_haplotype_params)
from nanosnp_tpu.runtime import stages


def _random_shard(rng, contig, n, depth, flank, adj):
    l_p, l_h = 2 * flank + 1, 2 * adj + 1
    centers = np.sort(rng.choice(
        np.arange(l_p + 10, 20000 - l_p - 10), size=n, replace=False))
    gpos = centers[:, None] + np.arange(-adj, adj + 1)[None, :] * 2

    def view(L):
        seq = rng.integers(0, 5, size=(n, depth, L))
        # some depth raggedness: pad tail rows per site
        for i in range(n):
            d = int(rng.integers(depth // 2, depth + 1))
            seq[i, d:] = C.PAD_VALUE
        pad = seq == C.PAD_VALUE
        hap = np.where(pad, C.PAD_VALUE,
                       rng.integers(1, 4, size=(n, depth, L)))
        bq = np.where(pad, C.PAD_VALUE, rng.integers(0, 60, (n, depth, L)))
        mq = np.where(pad, C.PAD_VALUE, rng.integers(0, 254, (n, depth, L)))
        return {"sequences": seq.astype(np.int8),
                "hap": hap.astype(np.int8),
                "baseq": bq.astype(np.int8),
                "mapq": mq.astype(np.int16)}

    return bins.HaplotypeShard(
        contig=contig, candidate_positions=centers.astype(np.int64),
        group_positions=gpos.astype(np.int64),
        pileup=view(l_p), haplotype=view(l_h))


def test_legacy_int32_shard_loads_through_s5(tmp_path):
    """Shards written before the compact-dtype change (int32 throughout)
    must still flow through s5 unchanged (the stage narrows at transfer)."""
    import numpy as np

    rng = np.random.default_rng(5)
    cfg = PipelineConfig()
    cfg.inference.batch_size = 512
    cfg.inference.use_bf16 = False
    cfg.inference.use_pallas = False
    cfg.haplotype_model = HaplotypeModelConfig(hidden_size=8, lstm_layers=1)
    flank = cfg.haplotype_feature.pileup_flanking_size
    adj = cfg.haplotype_feature.adjacent_size
    genome = {"chrL": "".join(rng.choice(list("ACGT"), size=4000))}
    write_fasta(str(tmp_path / "ref.fa"), genome)
    from nanosnp_tpu.io.fasta import FastaReference

    ref = FastaReference(str(tmp_path / "ref.fa"))
    shard = _random_shard(rng, "chrL", 20, 24, flank, adj)
    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    # write the OLD layout by hand: int32 arrays, stock savez
    arrays = {"contig": np.array("chrL"),
              "candidate_positions": shard.candidate_positions,
              "group_positions": shard.group_positions}
    for k in bins._KEYS:
        arrays[f"pileup_{k}"] = shard.pileup[k].astype(np.int32)
        arrays[f"haplotype_{k}"] = shard.haplotype[k].astype(np.int32)
    np.savez_compressed(str(shard_dir / "chrL_d24x24.npz"), **arrays)

    params = init_haplotype_params(jax.random.key(1), cfg.haplotype_model)
    out_csv = tmp_path / "haplotype.csv"
    m = stages.stage_haplotype_predict(cfg, ref, str(shard_dir),
                                       str(out_csv), params)
    assert m["sites"] == 20
    assert len(out_csv.read_text().strip().splitlines()) == 20


def test_deep_bucket_pooling_matches_direct(tmp_path):
    rng = np.random.default_rng(99)
    cfg = PipelineConfig()
    cfg.inference.batch_size = 1024     # model batch
    cfg.inference.use_bf16 = False
    cfg.inference.use_pallas = False
    cfg.haplotype_model = HaplotypeModelConfig(hidden_size=16, lstm_layers=1)
    flank = cfg.haplotype_feature.pileup_flanking_size
    adj = cfg.haplotype_feature.adjacent_size

    depth = 180                         # -> bucket 192 -> fs 512 (2 parts
    #                                     per 1024-model batch + remainder)
    assert bins.depth_bucket(depth) == 192
    assert stages._featurize_sub_batch(cfg, 192) == 512

    genome = {"chrD": "".join(rng.choice(list("ACGT"), size=20000))}
    write_fasta(str(tmp_path / "ref.fa"), genome)
    from nanosnp_tpu.io.fasta import FastaReference

    ref = FastaReference(str(tmp_path / "ref.fa"))

    # > model_bs: one full batch needs TWO fs-parts (device concat), and
    # the 76-row tail exercises the repeat-fill remainder
    n = 1100
    shard = _random_shard(rng, "chrD", n, depth, flank, adj)
    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    bins.save_haplotype_shard(str(shard_dir / "chrD_d192x192"), shard)

    params = init_haplotype_params(jax.random.key(3), cfg.haplotype_model)
    out_csv = tmp_path / "haplotype.csv"
    m = stages.stage_haplotype_predict(cfg, ref, str(shard_dir),
                                       str(out_csv), params)
    assert m["sites"] == n
    rows = out_csv.read_text().strip().splitlines()
    assert len(rows) == n

    # direct (unpooled, unpadded-to-bucket) reference computation
    seq = ref.contig("chrD")
    db = 192

    def padded(view, L):
        d = getattr(shard, view)
        return [np.pad(d[k], ((0, 0), (0, db - depth), (0, 0)),
                       constant_values=C.PAD_VALUE).astype(np.float32)
                for k in ("sequences", "baseq", "mapq", "hap")]

    xp = haplotype_features(*[jnp.asarray(a) for a in padded("pileup", None)],
                            jnp.asarray(ref_window_codes(
                                seq, shard.candidate_positions, flank),
                                jnp.float32))
    xh = haplotype_features(
        *[jnp.asarray(a) for a in padded("haplotype", None)],
        jnp.asarray(ref_position_codes(seq, shard.group_positions),
                    jnp.float32))
    gt, _zy = haplotype_predict(params, xp, xh, cfg.haplotype_model)
    want_gt = np.asarray(gt).argmax(axis=1)

    got = {}
    for r in rows:
        ctg, pos, gtv, qual = r.split("\t")
        assert ctg == "chrD"
        got[int(pos)] = gtv
        assert float(qual) >= 0
    for i, p in enumerate(shard.candidate_positions):
        assert got[int(p)] == C.GT21_LABELS[want_gt[i]], i
