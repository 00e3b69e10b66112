"""End-to-end parity vs the REFERENCE'S OWN CODE.

Runs the reference PileupModel/predict.py (torch CPU, its real decode loop)
and scripts/merge.py on the same inputs as our pipeline and compares
outputs site-for-site. The reference needs PyTables, absent here — a thin
h5py-backed stub provides the two entry points its datasets use.
"""
import io
import os
import sys
import types

import numpy as np
import pytest

from synth import random_genome
from bamgen import random_reads, write_bam
from test_training import _plant_variants

from nanosnp_tpu.config import PipelineConfig
from nanosnp_tpu.io import bins
from nanosnp_tpu.io.fasta import FastaReference, write_fasta
from nanosnp_tpu.runtime import stages

torch = pytest.importorskip("torch")

REF_PILEUP_DIR = "/root/reference/PileupModel"
REF_SCRIPTS_DIR = "/root/reference/scripts"
REF_CKPT = f"{REF_PILEUP_DIR}/models/ont_pileup.chkpt"


class _H5Root:
    def __init__(self, h5):
        for name in h5.keys():
            setattr(self, name, h5[name])


class _H5File:
    def __init__(self, path):
        import h5py

        self._f = h5py.File(path, "r")
        self.root = _H5Root(self._f)

    def close(self):
        self._f.close()


def _install_tables_stub():
    mod = types.ModuleType("tables")
    mod.Filters = lambda **kw: None
    mod.open_file = lambda path, mode="r": _H5File(path)

    class _Atom:
        @staticmethod
        def from_dtype(dt):
            return None

    mod.Atom = _Atom
    mod.StringAtom = lambda itemsize: None
    sys.modules["tables"] = mod

    # the reference's optim.py imports the pip-only Ranger optimizer at
    # module level (Dockerfile:31-33); predict never uses it
    ranger = types.ModuleType("ranger")
    ranger.Ranger = object
    sys.modules["ranger"] = ranger


@pytest.fixture(scope="module")
def parity_world(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("parity")
    rng = np.random.default_rng(777)
    genome = random_genome(rng, {"chr20": 6000})
    fasta = tmp / "ref.fa"
    write_fasta(str(fasta), genome)
    reads = random_reads(rng, genome["chr20"], 0, n_reads=900, read_len=220,
                         mq_range=(25, 60))
    _plant_variants(rng, genome["chr20"], reads, n_sites=130)
    bam = tmp / "in.bam"
    write_bam(str(bam), [("chr20", 6000)], reads)

    cfg = PipelineConfig()
    cfg.inference.batch_size = 1024
    cfg.inference.use_bf16 = False      # f32 for closest prob parity
    cfg.inference.use_pallas = False
    ref = FastaReference(str(fasta))
    shard_dir = tmp / "shards"
    stages.stage_pileup_features_from_bam(cfg, ref, str(bam), str(shard_dir),
                                          ["chr20"])
    # also write the shard in the reference's HDF5 layout
    h5_dir = tmp / "h5_shards"
    h5_dir.mkdir()
    shard = bins.load_pileup_shard(str(shard_dir / "chr20.npz"))
    bins.save_pileup_shard_h5(str(h5_dir / "chr20.pd.bin"), shard)
    return dict(tmp=tmp, cfg=cfg, ref=ref, fasta=str(fasta),
                shard_dir=str(shard_dir), h5_dir=str(h5_dir),
                n_sites=len(shard))


def _run_reference_predict(world, out_vcf):
    _install_tables_stub()
    for p in (REF_PILEUP_DIR,):
        if p not in sys.path:
            sys.path.insert(0, p)
    import importlib

    for m in ("options", "utils", "optim", "model", "dataset", "predict"):
        if m in sys.modules:
            importlib.reload(sys.modules[m])
    import predict as ref_predict

    argv = sys.argv
    sys.argv = [
        "predict.py",
        "-config", f"{REF_PILEUP_DIR}/config/ont_pileup.yaml",
        "-model_path", REF_CKPT,
        "-data", world["h5_dir"],
        "-reference", world["fasta"],
        "-output", out_vcf,
        "--no_cuda",
    ]
    try:
        ref_predict.main()
    finally:
        sys.argv = argv


def test_pileup_vcf_matches_reference_predict_py(parity_world):
    import jax
    import jax.numpy as jnp

    from nanosnp_tpu.models.convert import load_pileup_checkpoint

    world = parity_world
    assert world["n_sites"] > 50
    tmp = world["tmp"]

    ref_vcf = str(tmp / "reference_pileup.vcf")
    _run_reference_predict(world, ref_vcf)

    ours_vcf = str(tmp / "ours_pileup.vcf")
    params = jax.tree.map(jnp.asarray, load_pileup_checkpoint(REF_CKPT))
    stages.stage_pileup_predict(world["cfg"], world["ref"],
                                world["shard_dir"], ours_vcf, params=params)

    with open(ref_vcf) as f:
        ref_rows = {(-1 if l.startswith("#") else 0, l.split("\t")[0],
                     l.split("\t")[1]): l.strip()
                    for l in f if not l.startswith("#")}
    with open(ours_vcf) as f:
        our_rows = {(0, l.split("\t")[0], l.split("\t")[1]): l.strip()
                    for l in f if not l.startswith("#")}

    assert set(ref_rows) == set(our_rows), (
        len(ref_rows), len(our_rows),
        list(set(ref_rows) ^ set(our_rows))[:5])
    n_exact = 0
    for k, want in ref_rows.items():
        got = our_rows[k]
        wf, gf = want.split("\t"), got.split("\t")
        # decode decisions identical
        assert gf[3] == wf[3] and gf[4] == wf[4], (want, got)
        assert gf[6] == wf[6], (want, got)
        assert gf[9].split(":")[0] == wf[9].split(":")[0], (want, got)
        # QUAL within rounding noise of f32 prob differences
        assert abs(float(gf[5]) - float(wf[5])) <= 0.05, (want, got)
        if got == want:
            n_exact += 1
    # the vast majority of rows must be byte-identical
    assert n_exact / len(ref_rows) > 0.9, (n_exact, len(ref_rows))


def test_merge_matches_reference_merge_py(parity_world, tmp_path):
    if REF_SCRIPTS_DIR not in sys.path:
        sys.path.insert(0, REF_SCRIPTS_DIR)
    import importlib

    if "merge" in sys.modules:
        importlib.reload(sys.modules["merge"])
    import merge as ref_merge

    world = parity_world
    tmp = world["tmp"]
    pileup_vcf = str(tmp / "ours_pileup.vcf")
    if not os.path.exists(pileup_vcf):
        pytest.skip("pileup parity test must run first")

    # synthetic haplotype calls over the pileup sites: mix of rescues,
    # rejections, hom-refs, multiallelics
    rng = np.random.default_rng(3)
    hap_rows = []
    with open(pileup_vcf) as f:
        for line in f:
            if line.startswith("#"):
                continue
            fx = line.split("\t")
            if rng.random() < 0.7:
                ref_b = fx[3]
                choice = rng.random()
                if choice < 0.3:
                    gt = ref_b + ref_b                  # hom ref -> drop
                elif choice < 0.6:
                    alt = rng.choice([b for b in "ACGT" if b != ref_b])
                    gt = ref_b + alt                    # het rescue
                elif choice < 0.8:
                    alt = rng.choice([b for b in "ACGT" if b != ref_b])
                    gt = alt + alt                      # hom alt
                else:
                    a1, a2 = rng.choice(
                        [b for b in "ACGT" if b != ref_b], 2, replace=False)
                    gt = a1 + a2                        # 1/2
                qual = float(np.round(rng.uniform(2, 35), 2))
                hap_rows.append(f"{fx[0]}\t{fx[1]}\t{gt}\t{qual}\n")
    hap_csv = tmp_path / "hap.csv"
    hap_csv.write_text("".join(hap_rows))

    ref_out = tmp_path / "ref_merge.vcf"
    args = types.SimpleNamespace(pileup_vcf=pileup_vcf,
                                 cat_predict=str(hap_csv),
                                 quality=19, output=str(ref_out))
    ref_merge.Run(args)

    from nanosnp_tpu.decode.merge import merge_calls

    our_out = io.StringIO()
    with open(pileup_vcf) as pv:
        merge_calls(pv, hap_rows, our_out, quality_threshold=19)

    want = ref_out.read_text()
    got = our_out.getvalue()
    assert got == want


def test_sortvcf_matches_reference(tmp_path):
    import importlib

    for p in (REF_PILEUP_DIR, "/root/reference/HaplotypeModel"):
        if p not in sys.path:
            sys.path.insert(0, p)
    import sortvcf as ref_sortvcf

    rng = np.random.default_rng(9)
    rows = ["##h\n", "#CHROM\tPOS\n"]
    for ctg in ["chr2", "chr10", "chrX", "weird_ctg", "chr1"]:
        for pos in rng.integers(1, 100000, 20):
            rows.append(f"{ctg}\t{pos}\t.\tA\tC\t30\tPASS\t.\tGT\t0/1\n")
    rng.shuffle(rows[2:])
    src = tmp_path / "in.vcf"
    src.write_text("".join(rows))
    ref_out = tmp_path / "ref_sorted.vcf"
    ref_sortvcf.sort_vcf_file(str(src), str(ref_out))

    from nanosnp_tpu.decode.sort import sort_vcf_lines

    with open(src) as f:
        ours = "".join(sort_vcf_lines(f))
    assert ours == ref_out.read_text()


def test_phasing_selector_matches_reference(tmp_path):
    if REF_SCRIPTS_DIR not in sys.path:
        sys.path.insert(0, REF_SCRIPTS_DIR)
    import select_high_quality_hetesnps as ref_sel

    rng = np.random.default_rng(10)
    rows = ["##h\n", "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n"]
    for ctg in ["chr1", "chr2"]:
        for pos in sorted(rng.integers(1, 100000, 60)):
            zy = rng.choice(["0/0", "0/1", "1/1", "1|2", "0|1"])
            q = float(np.round(rng.uniform(2, 40), 2))
            rows.append(f"{ctg}\t{pos}\t.\tA\tC\t{q}\tPASS\t.\tGT:GQ\t{zy}:1\n")
    src = tmp_path / "pileup.vcf"
    src.write_text("".join(rows))
    out_dir = tmp_path / "ref_out"
    out_dir.mkdir()
    ref_sel.select_high_quality_hetesnps(str(src), str(out_dir),
                                         support_quality=16)

    from nanosnp_tpu.decode.sort import select_phasing_hetesnps

    with open(src) as f:
        header, per_contig = select_phasing_hetesnps(f, 16)
    for ctg in ["chr1", "chr2"]:
        want_path = out_dir / f"{ctg}.splited.vcf"
        if not want_path.exists():
            assert ctg not in per_contig
            continue
        ours = "".join(header) + "".join(per_contig.get(ctg, []))
        assert ours == want_path.read_text()


def test_haplotype_csv_matches_reference_predict_dev(parity_world, tmp_path):
    """Run the reference predict_dev.py (its TestDataset featurization + torch
    model) on our haplotype shards in its HDF5 layout, with a shared random
    checkpoint; our s5 stage must produce the same calls."""
    import jax
    import jax.numpy as jnp

    _install_tables_stub()
    hap_dir = "/root/reference/HaplotypeModel"
    if hap_dir not in sys.path:
        sys.path.insert(0, hap_dir)
    # HaplotypeModel has its own options/utils/optim/model modules that
    # collide with PileupModel's; force re-import from its directory
    import importlib
    saved_mods = {}
    for m in ("options", "utils", "optim", "model_dev", "dataset_dev",
              "predict_dev", "get_truth", "lookahead", "novograd", "radam",
              "ranger21", "focal_loss"):
        if m in sys.modules:
            saved_mods[m] = sys.modules.pop(m)
    sys.path.remove(hap_dir)
    sys.path.insert(0, hap_dir)

    ranger21 = types.ModuleType("ranger21")
    ranger21.Ranger21 = object
    sys.modules["ranger21"] = ranger21
    torchnet = types.ModuleType("torchnet")
    torchnet_meter = types.ModuleType("torchnet.meter")
    torchnet_meter.ConfusionMeter = object
    torchnet.meter = torchnet_meter
    sys.modules["torchnet"] = torchnet
    sys.modules["torchnet.meter"] = torchnet_meter

    world = parity_world
    tmp = world["tmp"]

    # build a haplotype shard from the BAM via our extractor over a
    # variant-rich synthetic pileup VCF
    from nanosnp_tpu.runtime.extract import NativeBamExtractor

    cfg = world["cfg"]
    cfg.haplotype_feature.hete_support_quality = 2
    cfg.haplotype_feature.low_quality_threshold = 25
    pileup_vcf = str(tmp / "ours_pileup.vcf")
    if not os.path.exists(pileup_vcf):
        pytest.skip("pileup parity test must run first")
    extractor = NativeBamExtractor({"chr20": str(tmp / "in.bam")})
    hap_shards = tmp_path / "hap_shards"
    m4 = stages.stage_haplotype_features(cfg, world["ref"], pileup_vcf,
                                         extractor, str(hap_shards))
    extractor.close()
    if m4["groups"] == 0:
        pytest.skip("no haplotype groups formed on this synthetic world")

    h5_dir = tmp_path / "hap_h5"
    h5_dir.mkdir()
    for p in os.listdir(hap_shards):
        shard = bins.load_haplotype_shard(str(hap_shards / p))
        bins.save_haplotype_shard_h5(str(h5_dir / (p[:-4] + ".bin")), shard)

    # shared random checkpoint
    import utils as ref_utils
    import yaml as _yaml

    torch.manual_seed(12345)
    import model_dev as ref_model_dev

    config = ref_utils.AttrDict(_yaml.safe_load(
        open(f"{hap_dir}/config/ont_haplotype.yaml")))
    net = ref_model_dev.LSTMNetwork(config)
    ckpt_path = tmp_path / "shared.chkpt"
    torch.save(net.state_dict(), str(ckpt_path))

    import predict_dev as ref_predict_dev

    ref_csv = tmp_path / "ref_hap.csv"
    argv = sys.argv
    sys.argv = [
        "predict_dev.py",
        "-config", f"{hap_dir}/config/ont_haplotype.yaml",
        "-model_path", str(ckpt_path),
        "-bin_paths", str(h5_dir),
        "-reference_path", world["fasta"],
        "-output", str(ref_csv),
        "--no_cuda",
    ]
    try:
        ref_predict_dev.main()
    finally:
        sys.argv = argv
        sys.modules.update(saved_mods)

    # ours: convert the same weights, run s5
    from nanosnp_tpu.models.convert import haplotype_params_from_torch

    params = jax.tree.map(jnp.asarray, haplotype_params_from_torch(
        torch.load(str(ckpt_path), weights_only=False)))
    cfg.inference.use_bf16 = False
    cfg.inference.use_pallas = False
    # byte-parity vs the reference: the deferral gate (default-on since
    # r3) has no reference counterpart and this world's reads carry no HP
    # tags, so it would defer every site
    cfg.merge.defer_unphased_frac = 0.0
    our_csv = tmp_path / "our_hap.csv"
    stages.stage_haplotype_predict(cfg, world["ref"], str(hap_shards),
                                   str(our_csv), params)

    want = {}
    for line in ref_csv.read_text().splitlines():
        c, p, gt, q = line.split("\t")
        want[(c, int(p))] = (gt, float(q))
    got = {}
    for line in our_csv.read_text().splitlines():
        c, p, gt, q = line.split("\t")
        got[(c, int(p))] = (gt, float(q))
    assert set(want) == set(got), (len(want), len(got))
    n_gt_same = sum(1 for k in want if want[k][0] == got[k][0])
    # tightened from 0.98 after the round-2 s5 feature-order fix: with
    # identical (name-mapped) featurization the only differences left are
    # f32 softmax ties
    assert n_gt_same / len(want) > 0.995, (n_gt_same, len(want))
    for k in want:
        if want[k][0] == got[k][0]:
            assert abs(want[k][1] - got[k][1]) < 0.6, (k, want[k], got[k])

    # Decompose the residual (VERDICT r2 #3): argmax identity must hold
    # OUTSIDE measured softmax ties. For every divergent call, recompute
    # our model's full gt distribution and require the top-2 margin to sit
    # inside the f32 tie band — a divergence with a decisive margin would
    # be a real bug, not noise, and fails loudly here.
    diverged = [k for k in want if want[k][0] != got[k][0]]
    if diverged:
        from nanosnp_tpu.features.haplotype import (haplotype_features,
                                                    ref_position_codes,
                                                    ref_window_codes)
        from nanosnp_tpu.models.haplotype_model import haplotype_predict

        seq_arr = world["ref"].contig("chr20")
        fl = cfg.haplotype_feature.pileup_flanking_size
        probs = {}
        for p in os.listdir(hap_shards):
            shard = bins.load_haplotype_shard(str(hap_shards / p))
            if len(shard) == 0:
                continue
            views = []
            for view, refc in (
                    ("pileup", ref_window_codes(
                        seq_arr, shard.candidate_positions, fl)),
                    ("haplotype", ref_position_codes(
                        seq_arr, shard.group_positions))):
                d = getattr(shard, view)
                views.append(haplotype_features(
                    jnp.asarray(d["sequences"], jnp.float32),
                    jnp.asarray(d["baseq"], jnp.float32),
                    jnp.asarray(d["mapq"], jnp.float32),
                    jnp.asarray(d["hap"], jnp.float32),
                    jnp.asarray(refc, jnp.float32)))
            gt, _zy = haplotype_predict(params, views[0], views[1],
                                        cfg.haplotype_model)
            gt = np.asarray(gt)
            for i, pos in enumerate(shard.candidate_positions):
                probs[(shard.contig, int(pos))] = gt[i]
        margins = []
        for k in diverged:
            top2 = np.sort(probs[k])[-2:]
            margin = float(top2[1] - top2[0])
            margins.append(margin)
            assert margin < 5e-2, \
                ("non-tie GT divergence (real bug?)", k, margin,
                 want[k], got[k])
        print(f"[parity] {len(diverged)}/{len(want)} GT calls diverge; "
              f"all inside the tie band (max top-2 margin "
              f"{max(margins):.2e})")
    else:
        print(f"[parity] 0/{len(want)} GT calls diverge (exact argmax "
              f"identity)")
