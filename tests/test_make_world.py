"""The vectorized chromosome-scale world generator (scripts/make_world.py)
must produce BAMs the native engine reads identically to the Python
writer's, with the stated diploid truth visible in the pileup."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

from make_world import make_world

from nanosnp_tpu.io.bam import BamFile
from nanosnp_tpu.io.fasta import FastaReference


def test_world_pileup_sees_truth(tmp_path):
    res = make_world(str(tmp_path / "w"), {"ctgZ": 400_000}, coverage=24,
                     read_len=1500, seed=9)
    ref = FastaReference(res["fasta"])
    seq = ref.contig("ctgZ")
    truth = {}
    for line in open(res["truth"]):
        if line.startswith("#"):
            continue
        f = line.split("\t")
        truth[int(f[1])] = (f[3], f[4], f[9].strip())

    with BamFile(res["bam"]) as bf:
        refs = bf.references()
        assert refs == [("ctgZ", 400_000)]
        pile = bf.pileup_region("ctgZ", 0, len(seq), seq)

    # coverage approximately as requested away from the edges
    mid = (pile.positions > 5000) & (pile.positions < 395_000)
    med_depth = np.median(pile.depths[mid])
    assert 18 <= med_depth <= 28, med_depth

    # candidate filter recovers most het/hom truth sites (SNV af >= 0.12
    # at 24x is nearly certain; a small miss rate from read errors is ok)
    cand = set(pile.positions[pile.is_candidate].tolist())
    hits = sum(1 for p in truth if p in cand)
    assert hits / len(truth) > 0.95, (hits, len(truth))

    # non-truth candidate (error-driven) rate stays low
    n_false = sum(1 for p in pile.positions[pile.is_candidate]
                  if int(p) not in truth)
    assert n_false / len(pile.positions) < 0.03


def test_world_cigar_forms_parse(tmp_path):
    """Indel-bearing reads (aM kI bM / aM kD bM) must round-trip the
    native record parser: read counts and spans stay consistent."""
    res = make_world(str(tmp_path / "w2"), {"c": 120_000}, coverage=12,
                     read_len=900, seed=4)
    ref = FastaReference(res["fasta"])
    with BamFile(res["bam"]) as bf:
        pile = bf.pileup_region("c", 0, 120_000, ref.contig("c"))
    assert len(pile.positions) > 100_000
    assert int(res["n_reads"]) == 120_000 * 12 // 900
