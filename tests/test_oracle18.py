"""Triple-implementation differential: the native BAM engine vs the
independent column-major oracle (tests/oracle18.py) on indel-heavy
ONT-like worlds. See oracle18's docstring for why a third implementation
exists (VERDICT r2 #1: the engine had only ever been validated against
this repo's own mpileup text simulator)."""
import numpy as np
import pytest

from synth import random_genome
from bamgen import random_reads, write_bam
from diploid import make_diploid
from ontsim import ont_reads, random_profile
from oracle18 import oracle_pileup

pytest.importorskip("nanosnp_tpu.io.bam")
from nanosnp_tpu.io.bam import BamFile


def _compare(reads, genome, bam_path, max_depth=144):
    seq = np.frombuffer(genome.encode(), dtype=np.uint8).copy()
    want = oracle_pileup(reads, genome, max_depth=max_depth,
                         min_coverage=6)
    with BamFile(bam_path) as bam:
        got = bam.pileup_region("chrZ", 0, len(seq), seq,
                                max_depth=max_depth, min_coverage=6)
    got_rows = {int(p): i for i, p in enumerate(got.positions)}
    n_checked = n_cand = 0
    for pos1, (t, depth, cand, alt_info) in want.items():
        if genome[pos1 - 1].upper() not in "ACGT":
            continue   # engine emits no row for N reference bases
        if depth == 0 and pos1 not in got_rows:
            continue   # all-N column: no mpileup row
        assert pos1 in got_rows, pos1
        i = got_rows[pos1]
        np.testing.assert_array_equal(got.counts[i], t, err_msg=str(pos1))
        assert got.depths[i] == depth, pos1
        assert bool(got.is_candidate[i]) == cand, pos1
        if cand:
            assert got.alt_info[i] == alt_info, (pos1, got.alt_info[i],
                                                 alt_info)
            n_cand += 1
        n_checked += 1
    # engine must not emit extra covered rows the oracle lacks
    for p in got_rows:
        assert p in want or genome[p - 1].upper() not in "ACGT", p
    return n_checked, n_cand


def test_engine_vs_independent_oracle_ont_world(tmp_path):
    rng = np.random.default_rng(77)
    genome = random_genome(rng, {"chrZ": 4000})
    truth, h1, h2 = make_diploid(rng, genome["chrZ"], n_het=40, n_hom=15)
    prof = random_profile(rng, "ox")
    reads = ont_reads(rng, h1, h2, 0, n_reads=4000 * 25 // 200,
                      read_len=200, prof=prof)
    bam = tmp_path / "o.bam"
    write_bam(str(bam), [("chrZ", 4000)], reads)
    n, c = _compare(reads, genome["chrZ"], str(bam))
    assert n > 3000 and c > 30, (n, c)


@pytest.mark.parametrize("seed", [5, 6])
def test_engine_vs_independent_oracle_random_reads(tmp_path, seed):
    rng = np.random.default_rng(seed)
    genome = random_genome(rng, {"chrZ": 1500})
    reads = random_reads(rng, genome["chrZ"], 0, n_reads=250,
                         read_len=150, mq_range=(10, 60))
    bam = tmp_path / "r.bam"
    write_bam(str(bam), [("chrZ", 1500)], reads)
    n, c = _compare(reads, genome["chrZ"], str(bam))
    assert n > 1000, n


def test_engine_vs_independent_oracle_depth_capped(tmp_path):
    """Column-cap interplay with indels: capped-out anchor bases must not
    record their following ins/del in either implementation."""
    rng = np.random.default_rng(9)
    genome = random_genome(rng, {"chrZ": 800})
    truth, h1, h2 = make_diploid(rng, genome["chrZ"], n_het=10, n_hom=5)
    prof = random_profile(rng, "cap")
    reads = ont_reads(rng, h1, h2, 0, n_reads=800 * 60 // 150,
                      read_len=150, prof=prof)
    bam = tmp_path / "c.bam"
    write_bam(str(bam), [("chrZ", 800)], reads)
    n, _ = _compare(reads, genome["chrZ"], str(bam), max_depth=25)
    assert n > 500, n
