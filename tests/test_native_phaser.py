"""Native read-backed phaser (s3 without whatshap).

Accuracy oracle: the diploid synthetic world knows each read's true
haplotype and each het site's true phase, so we measure site-phase
agreement (up to a global flip per block) and read-partition purity.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

from bamgen import write_bam
from diploid import diploid_reads, make_diploid
from synth import random_genome

from nanosnp_tpu.config import PipelineConfig
from nanosnp_tpu.io.bam import BamFile
from nanosnp_tpu.io.fasta import FastaReference, write_fasta
from nanosnp_tpu.phase.native_phaser import phase_contig
from nanosnp_tpu.runtime import stages

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def phased_world(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("phaser")
    rng = np.random.default_rng(33)
    genome = random_genome(rng, {"chrP": 40_000})
    seq = genome["chrP"].replace("N", "C")
    genome = {"chrP": seq}
    fasta = tmp / "ref.fa"
    write_fasta(str(fasta), genome)
    truth, h1, h2 = make_diploid(rng, seq, n_het=500, n_hom=100, spacing=50)
    # tag_rate 1.0: every read records its true haplotype (the oracle);
    # the untagged copy is what the phaser sees
    reads = diploid_reads(rng, h1, h2, 0, n_reads=3_000, read_len=420,
                          err=0.04, tag_rate=1.0)
    tagged = tmp / "tagged.bam"
    write_bam(str(tagged), [("chrP", len(seq))], reads)
    true_hp = [r.hp for r in reads]
    for r in reads:
        r.hp = None
    untagged = tmp / "untagged.bam"
    write_bam(str(untagged), [("chrP", len(seq))], reads)
    hets = [t for t in sorted(truth, key=lambda t: t.pos1) if not t.hom]
    return dict(tmp=tmp, fasta=str(fasta), tagged=str(tagged),
                untagged=str(untagged), hets=hets, true_hp=true_hp,
                n_reads=len(reads))


def test_phase_contig_site_and_read_accuracy(phased_world):
    w = phased_world
    hets = w["hets"]
    pos = np.array([t.pos1 for t in hets], dtype=np.int64)
    refs = [t.ref for t in hets]
    alts = [t.alt for t in hets]
    with BamFile(w["untagged"]) as bam:
        res = phase_contig(bam, "chrP", pos, refs, alts,
                           window_bp=8_000, overlap_bp=2_000, min_mq=0)
        # row-aligned oracle: the tagged BAM holds each read's true hap;
        # row order of read_matrices is deterministic for identical read
        # content, so rows correspond across the two files
        mats_u = bam.read_matrices("chrP", pos, min_mq=0)
    with BamFile(w["tagged"]) as tbam:
        mats_t = tbam.read_matrices("chrP", pos, min_mq=0)
    assert mats_u["sequences"].shape == mats_t["sequences"].shape

    phased = res.hap_of_alt != 0
    assert phased.mean() > 0.95, f"only {phased.mean():.2%} of hets phased"

    # site accuracy per block, up to a global flip
    true_hap_of_alt = np.array([t.hap for t in hets], dtype=np.int8)
    site_ok = 0
    site_n = 0
    for block in np.unique(res.block_ids[phased]):
        sel = phased & (res.block_ids == block)
        agree = (res.hap_of_alt[sel] == true_hap_of_alt[sel]).mean()
        site_ok += max(agree, 1 - agree) * sel.sum()
        site_n += sel.sum()
    assert site_n > 0
    assert site_ok / site_n > 0.97, f"site phase accuracy {site_ok/site_n:.3f}"

    # read partition purity (up to the same global flip per block; with one
    # dominant block a single global flip suffices)
    rid_to_row = {int(r): i for i, r in enumerate(mats_u["read_ids"])}
    pairs = [(hp, int(mats_t["hap_tags"][rid_to_row[rid]]))
             for rid, hp in res.read_hp.items() if rid in rid_to_row]
    assert len(pairs) > 0.8 * w["n_reads"] * 0.5   # most multi-site reads tagged
    got = np.array([p[0] for p in pairs])
    want = np.array([p[1] for p in pairs])
    agree = (got == want).mean()
    assert max(agree, 1 - agree) > 0.95, f"read purity {max(agree, 1-agree):.3f}"


def test_cli_call_with_native_phaser(phased_world, tmp_path):
    """Full 6-stage CLI run with --phaser native on an untagged BAM: s3
    must phase+partition natively and s4/s5 consume the partition."""
    import json
    import pickle

    import jax
    import jax.numpy as jnp

    from nanosnp_tpu.models.haplotype_model import init_haplotype_params

    w = phased_world
    cfg = PipelineConfig()
    hp = init_haplotype_params(jax.random.key(0), cfg.haplotype_model)
    ck = tmp_path / "hap.ckpt"
    with open(ck, "wb") as f:
        pickle.dump({"params": jax.tree.map(np.asarray, hp),
                     "step": 0, "epoch": 0}, f)
    cfgy = tmp_path / "cfg.yaml"
    cfgy.write_text("haplotype_feature:\n  hete_support_quality: 2\n"
                    "  low_quality_threshold: 25\n"
                    "inference:\n  batch_size: 512\n")
    code = ("import jax; jax.config.update('jax_platforms','cpu'); "
            "import sys; from nanosnp_tpu.runtime.cli import main; "
            "sys.exit(main(sys.argv[1:]))")
    out = tmp_path / "run"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, "-c", code, "call", "--config", str(cfgy),
         "--bam", w["untagged"], "--ref", w["fasta"],
         "--pileup-model",
         "/root/reference/PileupModel/models/ont_pileup.chkpt",
         "--haplotype-model", str(ck), "--phaser", "native",
         "--contigs", "chrP", "-o", str(out)],
        env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-3000:]
    s3 = json.load(open(out / ".stages" / "s3_phasing.done"))
    assert s3["metrics"]["engine"] == "native"
    assert s3["metrics"]["phased_sites"] > 50
    assert s3["metrics"]["tagged_reads"] > 500
    assert (out / "phase_native" / "chrP.phased.vcf").exists()
    phased_rows = [l for l in open(out / "phase_native" / "chrP.phased.vcf")
                   if "|" in l.split("\t")[-1]]
    assert phased_rows and all("PS" in l for l in phased_rows)
    # s4 consumed the partition: shards carry HP 1/2 groups
    from nanosnp_tpu.io import bins

    shards = bins.list_shards(str(out / "haplotype_shards"))
    assert shards
    sh = bins.load_haplotype_shard(shards[0])
    haps = sh.pileup["hap"]
    assert (haps == 1).any() and (haps == 2).any()
    assert (out / "merge.vcf").exists()


def test_phase_window_invariants_fuzz():
    """_phase_window on random allele matrices: signs in {-1,0,1},
    uninformative sites stay 0, components consistent, and the MEC local
    search never degrades below the all-plus assignment's objective."""
    from nanosnp_tpu.phase.native_phaser import _phase_window

    rng = np.random.default_rng(123)
    for trial in range(30):
        R = int(rng.integers(1, 60))
        P = int(rng.integers(1, 40))
        A = rng.choice([-1, 0, 1], size=(R, P),
                       p=[0.2, 0.6, 0.2]).astype(np.int8)
        s, comp, n_weak = _phase_window(A)
        assert set(np.unique(s)) <= {-1, 0, 1}
        informative = (A != 0).any(axis=0)
        assert (s[~informative] == 0).all()
        assert (comp[~informative] == -1).all()
        assert (comp[informative] >= 0).all()
        # objective: sum over reads of |A @ s| must beat the trivial
        # all-(+1) orientation (local search started from a greedy chain)
        def objective(sv):
            return float(np.abs(A.astype(np.float64) @ sv).sum())
        triv = np.where(informative, 1.0, 0.0)
        assert objective(s.astype(np.float64)) >= objective(triv) - 1e-9


def test_phase_contig_empty_and_single_site(phased_world):
    """Degenerate inputs: no sites, one site, sites with no coverage."""
    w = phased_world
    with BamFile(w["untagged"]) as bam:
        r0 = phase_contig(bam, "chrP", np.zeros(0, dtype=np.int64), [], [])
        assert len(r0.read_hp) == 0 and r0.n_blocks == 0
        r1 = phase_contig(bam, "chrP", np.array([500], dtype=np.int64),
                          ["A"], ["T"], min_mq=0)
        assert set(r1.hap_of_alt) <= {0, 1, 2}
        # positions beyond the contig: no reads -> everything unphased
        r2 = phase_contig(bam, "chrP",
                          np.array([1_000_000, 1_000_050], dtype=np.int64),
                          ["A", "C"], ["T", "G"], min_mq=0)
        assert (r2.hap_of_alt == 0).all() and not r2.read_hp


def test_min_block_sites_suppresses_singletons(tmp_path):
    """A het linked to no other het by any read forms a singleton block;
    by default (min_block_sites=2) it must stay unphased and tag no reads
    (whatshap semantics: a variant is only phased when a read connects it
    to another variant). min_block_sites=1 restores phase-everything."""
    rng = np.random.default_rng(7)
    L = 9_000
    seq = "".join("ACGT"[int(b)] for b in rng.integers(0, 4, L))
    # linked pair at 1001/1101 (reads span both); singleton at 6001
    # (nothing else within a read length)
    hets = [(1001, "A", "T"), (1101, "A", "T"), (6001, "A", "T")]
    h1 = list(seq); h2 = list(seq)
    for pos1, ref, alt in hets:
        h1[pos1 - 1] = ref
        h2[pos1 - 1] = alt
    from bamgen import Read
    reads = []
    for i in range(60):
        hap = 1 + (i % 2)
        src = h1 if hap == 1 else h2
        start = int(rng.integers(850, 1000)) if i < 40 else \
            int(rng.integers(5850, 6000))
        frag = "".join(src[start: start + 300])
        reads.append(Read(name=f"r{i}", ref_id=0, start0=start,
                          cigar=[("M", 300)], seq=frag, quals=[30] * 300))
    reads.sort(key=lambda r: r.start0)
    bam = tmp_path / "s.bam"
    write_bam(str(bam), [("chrS", L)], reads)
    pos = np.array([h[0] for h in hets], dtype=np.int64)
    refs = [h[1] for h in hets]
    alts = [h[2] for h in hets]
    with BamFile(str(bam)) as bf:
        res = phase_contig(bf, "chrS", pos, refs, alts, min_mq=0)
        res1 = phase_contig(bf, "chrS", pos, refs, alts, min_mq=0,
                            min_block_sites=1)
    # default: the linked pair phases, the singleton does not
    assert res.hap_of_alt[0] != 0 and res.hap_of_alt[1] != 0
    assert res.hap_of_alt[2] == 0
    # no read is tagged purely by the singleton site
    singleton_reads = {i for i, r in enumerate(reads) if r.start0 > 5000}
    assert not any(rid in singleton_reads for rid in res.read_hp)
    # min_block_sites=1: pre-r3 behavior phases the singleton too
    assert res1.hap_of_alt[2] != 0
