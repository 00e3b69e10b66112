"""Legacy cat-model flow end to end through the CLI: tagged BAM ->
split-bam --by-tag -> legacy-make-groups (per tag) -> legacy-predict
(CatModel) + legacy-heuristic, bin round-trip included."""
import os

import numpy as np
import pytest

import jax

from bamgen import write_bam
from diploid import diploid_reads, make_diploid
from synth import random_genome
from nanosnp_tpu.io.fasta import write_fasta
from nanosnp_tpu.legacy.bins import load_legacy_bin, save_legacy_bin
from nanosnp_tpu.runtime.cli import main as cli_main


@pytest.fixture(scope="module")
def legacy_world(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("legacy")
    rng = np.random.default_rng(404)
    L = 30_000
    genome = random_genome(rng, {"chrL": L})
    write_fasta(str(tmp / "ref.fa"), genome)
    truth, h1, h2 = make_diploid(rng, genome["chrL"], n_het=L // 120,
                                 n_hom=L // 500, spacing=50)
    reads = diploid_reads(rng, h1, h2, 0, n_reads=L * 25 // 250,
                          read_len=250, err=0.04, tag_rate=1.0)
    write_bam(str(tmp / "t.bam"), [("chrL", L)], reads)

    # pileup VCF: every true het is a strong support; every 4th site is
    # also a low-quality candidate needing the legacy model's second look
    lines = ["##fileformat=VCFv4.2",
             "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS"]
    for i, t in enumerate(sorted(truth, key=lambda t: t.pos1)):
        if t.hom:
            continue
        qual = 8.0 if i % 4 == 0 else 30.0
        lines.append(f"chrL\t{t.pos1}\t.\t{t.ref}\t{t.alt}\t{qual}\t.\t."
                     f"\tGT:GQ\t0/1:{int(qual)}")
    (tmp / "pileup.vcf").write_text("\n".join(lines) + "\n")
    return tmp


def test_legacy_flow_end_to_end(legacy_world, tmp_path):
    tmp = legacy_world
    split_dir = tmp_path / "split"
    assert cli_main(["split-bam", "--bam", str(tmp / "t.bam"),
                     "-o", str(split_dir), "--by-tag"]) == 0
    assert (split_dir / "h1.bam").exists() and (split_dir / "h2.bam").exists()

    bins1 = tmp_path / "bins_tag1"
    bins2 = tmp_path / "bins_tag2"
    for tag_bam, out in ((split_dir / "h1.bam", bins1),
                         (split_dir / "h2.bam", bins2)):
        assert cli_main(["legacy-make-groups",
                         "--pileup-vcf", str(tmp / "pileup.vcf"),
                         "--bam", str(tag_bam), "-o", str(out)]) == 0
    assert (bins1 / "chrL.bin").exists() and (bins2 / "chrL.bin").exists()

    b = load_legacy_bin(str(bins1 / "chrL.bin"))
    n = len(b["position"])
    assert n > 0
    assert b["edge_matrix"].shape == (n, 25, 10)
    assert b["pair_route"].shape == (n, 25, 10)
    assert b["read_matrix"].shape[0] == n and b["read_matrix"].shape[2] == 11
    assert b["surrounding_read_matrix"].shape[2] == 11
    # every group's center column must have observations in each kept row
    mid = b["read_matrix"][:, :, 5]
    real_rows = mid != -2
    assert (np.where(real_rows, mid != 0, True)).all()

    # round-trip identity
    rt = tmp_path / "rt.bin"
    arrays = {k: list(v) for k, v in b.items()}
    arrays["position"] = [str(p) for p in b["position"]]
    arrays["group_positions"] = [list(map(str, g))
                                 for g in b["group_positions"]]
    save_legacy_bin(str(rt), arrays)
    b2 = load_legacy_bin(str(rt))
    np.testing.assert_array_equal(b["edge_matrix"], b2["edge_matrix"])
    np.testing.assert_array_equal(b["read_matrix"], b2["read_matrix"])

    # CatModel inference over the dual bins
    from nanosnp_tpu.legacy.catmodel import init_catmodel_params
    from nanosnp_tpu.train.train_pileup import save_params_npz

    model = tmp_path / "cat.npz"
    save_params_npz(str(model), init_catmodel_params(jax.random.key(2)))
    out_dir = tmp_path / "pred"
    assert cli_main(["legacy-predict", "--data-tag1", str(bins1),
                     "--data-tag2", str(bins2), "--model", str(model),
                     "-o", str(out_dir)]) == 0
    calls = (out_dir / "legacy_calls.tsv").read_text().strip().splitlines()
    assert len(calls) > 0
    for row in calls[:5]:
        ctg, pos, gt, qual = row.split("\t")
        assert ctg == "chrL" and int(pos) > 0 and len(gt) == 2
        assert float(qual) >= 0

    # heuristic caller over the same bins
    h_dir = tmp_path / "heur"
    assert cli_main(["legacy-heuristic", "--data", str(bins1),
                     "-o", str(h_dir)]) == 0
    homo = (h_dir / "legacy_homozygous.txt").read_text().splitlines()
    # a per-HP bin is (almost) all homozygous along its haplotype: the
    # heuristic must call a clear majority of sites homo
    assert len(homo) > 0.5 * n


def test_legacy_train_end_to_end(legacy_world, tmp_path):
    """legacy-train: dual bins + truth -> loss decreases and a usable
    checkpoint lands (reference HaplotypeModel/train.py role)."""
    tmp = legacy_world
    # reuse the predict-flow bins (rebuilt here to keep fixtures simple)
    split_dir = tmp_path / "split"
    cli_main(["split-bam", "--bam", str(tmp / "t.bam"),
              "-o", str(split_dir), "--by-tag"])
    bins1, bins2 = tmp_path / "b1", tmp_path / "b2"
    for tag_bam, out in ((split_dir / "h1.bam", bins1),
                         (split_dir / "h2.bam", bins2)):
        cli_main(["legacy-make-groups", "--pileup-vcf",
                  str(tmp / "pileup.vcf"), "--bam", str(tag_bam),
                  "-o", str(out)])

    # truth VCF + confident bed over the whole contig
    truth_lines = ["##fileformat=VCFv4.2",
                   "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS"]
    for t in sorted(legacy_world_truth(tmp), key=lambda t: t.pos1):
        gt = "1/1" if t.hom else "0/1"
        truth_lines.append(
            f"chrL\t{t.pos1}\t.\t{t.ref}\t{t.alt}\t50\tPASS\t.\tGT\t{gt}")
    (tmp_path / "truth.vcf").write_text("\n".join(truth_lines) + "\n")
    (tmp_path / "conf.bed").write_text("chrL\t0\t30000\n")

    out_dir = tmp_path / "train_out"
    rc = cli_main(["legacy-train", "--data-tag1", str(bins1),
                   "--data-tag2", str(bins2), "--ref", str(tmp / "ref.fa"),
                   "--truth-vcf", str(tmp_path / "truth.vcf"),
                   "--bed", str(tmp_path / "conf.bed"),
                   "--epochs", "1", "--batch-size", "16",
                   "-o", str(out_dir)])
    assert rc == 0
    assert (out_dir / "catmodel.npz").exists()

    from nanosnp_tpu.train.train_pileup import load_checkpoint
    params, _ = load_checkpoint(str(out_dir / "catmodel.npz"))
    assert "res_blocks" in params and len(params["res_blocks"]) == 6
    assert params["out"]["w"].shape[-1] == 10

    # the config_prev 15-class cal_label variant (dataset.py:26-57):
    # GT21 indices 0-14 are exactly the unordered pair space, so the
    # same truth labels train a 15-way head
    out15 = tmp_path / "train15"
    rc = cli_main(["legacy-train", "--data-tag1", str(bins1),
                   "--data-tag2", str(bins2), "--ref", str(tmp / "ref.fa"),
                   "--truth-vcf", str(tmp_path / "truth.vcf"),
                   "--bed", str(tmp_path / "conf.bed"),
                   "--epochs", "1", "--batch-size", "16",
                   "--gt-classes", "15", "-o", str(out15)])
    assert rc == 0
    params15, _ = load_checkpoint(str(out15 / "catmodel.npz"))
    assert params15["out"]["w"].shape[-1] == 15


def test_legacy_eval_and_filter_labels(legacy_world, tmp_path):
    """legacy-eval (reference eval.py) + legacy-filter-labels (reference
    filter_catmodel_label.py) over the same dual-tag labeled world."""
    tmp = legacy_world
    split_dir = tmp_path / "split"
    cli_main(["split-bam", "--bam", str(tmp / "t.bam"),
              "-o", str(split_dir), "--by-tag"])
    bins1, bins2 = tmp_path / "b1", tmp_path / "b2"
    for tag_bam, out in ((split_dir / "h1.bam", bins1),
                         (split_dir / "h2.bam", bins2)):
        cli_main(["legacy-make-groups", "--pileup-vcf",
                  str(tmp / "pileup.vcf"), "--bam", str(tag_bam),
                  "-o", str(out)])
    truth_lines = ["##fileformat=VCFv4.2",
                   "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS"]
    for t in sorted(legacy_world_truth(tmp), key=lambda t: t.pos1):
        gt = "1/1" if t.hom else "0/1"
        truth_lines.append(
            f"chrL\t{t.pos1}\t.\t{t.ref}\t{t.alt}\t50\tPASS\t.\tGT\t{gt}")
    (tmp_path / "truth.vcf").write_text("\n".join(truth_lines) + "\n")
    (tmp_path / "conf.bed").write_text("chrL\t0\t30000\n")

    from nanosnp_tpu.legacy.catmodel import init_catmodel_params
    from nanosnp_tpu.train.train_pileup import save_params_npz

    model = tmp_path / "cat.npz"
    save_params_npz(str(model), init_catmodel_params(jax.random.key(5)))
    out_dir = tmp_path / "eval_out"
    rc = cli_main(["legacy-eval", "--data-tag1", str(bins1),
                   "--data-tag2", str(bins2), "--model", str(model),
                   "--ref", str(tmp / "ref.fa"),
                   "--truth-vcf", str(tmp_path / "truth.vcf"),
                   "--bed", str(tmp_path / "conf.bed"),
                   "--batch-size", "64", "-o", str(out_dir)])
    assert rc == 0
    rows = (out_dir / "legacy_eval.tsv").read_text().strip().splitlines()
    assert rows[0].startswith("# Contig")
    assert len(rows) > 1
    for row in rows[1:4]:
        ctg, pos, truth_gt, pred, qual, flag = row.split("\t")
        assert ctg == "chrL" and len(truth_gt) == 2 and len(pred) == 2
        assert flag in ("-", "False")
        assert (flag == "-") == (truth_gt == pred)

    f_dir = tmp_path / "filter_out"
    rc = cli_main(["legacy-filter-labels", "--data-tag1", str(bins1),
                   "--data-tag2", str(bins2), "--ref", str(tmp / "ref.fa"),
                   "--truth-vcf", str(tmp_path / "truth.vcf"),
                   "--bed", str(tmp_path / "conf.bed"),
                   "-o", str(f_dir)])
    assert rc == 0
    assert (f_dir / "filtered_positions.txt").exists()


def test_consensus_label_mismatch_oracle():
    """Vectorized labelcheck vs a scalar restatement of the reference rule
    (filter_catmodel_label.py:221-247)."""
    from nanosnp_tpu.legacy.labelcheck import consensus_label_mismatches
    from nanosnp_tpu.legacy.train import cal_label

    rng = np.random.default_rng(77)
    n, d, L = 60, 12, 11
    col = 2    # the reference's hardcoded column
    r1 = rng.choice([-2, -1, 0, 1, 2, 3, 4], size=(n, d, L),
                    p=[.15, .05, .1, .3, .1, .1, .2]).astype(np.int64)
    r2 = rng.permuted(r1, axis=1)
    gt = rng.integers(0, 15, size=n)
    checked, mism = consensus_label_mismatches(r1, r2, gt, col)

    for s in range(n):
        def frac(r):
            c = r[s, :, col]
            den = (c != -2).sum() + 1e-9
            return np.array([(c == v).sum() / den for v in (1, 2, 3, 4, -1)])
        f1, f2 = frac(r1), frac(r2)
        both = f1.max() >= 0.70 and f2.max() >= 0.70
        assert checked[s] == both
        if both:
            implied = cal_label(int(f1.argmax()), int(f2.argmax()))
            assert mism[s] == (implied != gt[s])
        else:
            assert not mism[s]


def legacy_world_truth(tmp):
    """The fixture's diploid truth, regenerated deterministically."""
    rng = np.random.default_rng(404)
    L = 30_000
    genome = random_genome(rng, {"chrL": L})
    truth, _, _ = make_diploid(rng, genome["chrL"], n_het=L // 120,
                               n_hom=L // 500, spacing=50)
    return truth


def test_cal_label_matches_reference_table():
    from nanosnp_tpu.legacy.train import cal_label

    # reference dataset.py:26-57 spot checks + symmetry + coverage
    assert cal_label(0, 0) == 0 and cal_label(1, 1) == 4
    assert cal_label(0, 4) == 11 and cal_label(4, 0) == 11
    assert cal_label(3, 4) == 14 and cal_label(2, 3) == 8
    seen = set()
    for a in range(5):
        for b in range(5):
            v = cal_label(a, b)
            assert v == cal_label(b, a)
            seen.add(v)
    assert seen == set(range(15))


def test_select_training_sites_balance():
    from nanosnp_tpu.legacy.train import select_training_sites

    rng = np.random.default_rng(1)
    n = 400
    labels = np.zeros((n, 3), np.int64)
    labels[:, 0] = 1
    labels[:, 1] = rng.integers(0, 10, n)
    labels[:50, 2] = 1          # 50 variants
    labels[50:, 2] = -1         # 350 non-variants
    idx = select_training_sites(labels, rng)
    assert len(idx) == 100      # variants + downsampled non-variants
    assert (labels[idx, 2] == 1).sum() == 50
