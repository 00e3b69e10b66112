"""Crash-mid-pipeline resume: SIGKILL a `call` run between stages, rerun
the same command, and require the final outputs to be byte-identical to an
uninterrupted run.

This is the integration-level proof of the .done-marker resume contract
(reference make_predict_data.sh pattern, SURVEY §5.3): a stage killed
mid-flight leaves partial artifacts on disk, and the rerun must redo that
stage from scratch without duplicating or mixing stale output.
"""
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

from bamgen import write_bam
from diploid import diploid_reads, make_diploid
from synth import random_genome

from nanosnp_tpu.io.fasta import write_fasta

PILEUP_CKPT = "/root/reference/PileupModel/models/ont_pileup.chkpt"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HAP_CKPT = os.path.join(REPO, "nanosnp_tpu", "models", "weights",
                        "ont_haplotype_synthetic.npz")


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("crash_world")
    rng = np.random.default_rng(4242)
    genome = random_genome(rng, {"chrA": 30_000, "chrB": 20_000})
    fasta = tmp / "ref.fa"
    write_fasta(str(fasta), genome)
    reads = []
    for i, (name, seq) in enumerate(genome.items()):
        _, h1, h2 = make_diploid(rng, seq, n_het=len(seq) // 150,
                                 n_hom=len(seq) // 450, spacing=60)
        reads += diploid_reads(rng, h1, h2, ref_id=i,
                               n_reads=len(seq) * 18 // 220,
                               read_len=220, err=0.05)
    bam = tmp / "sample.bam"
    write_bam(str(bam), [(n, len(s)) for n, s in genome.items()], reads)
    return dict(tmp=tmp, fasta=str(fasta), bam=str(bam),
                contigs=list(genome))


def _cli_cmd(args):
    code = ("import jax; jax.config.update('jax_platforms','cpu'); "
            "import sys; from nanosnp_tpu.runtime.cli import main; "
            "sys.exit(main(sys.argv[1:]))")
    return [sys.executable, "-c", code] + args


def _env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _body(path):
    with open(path) as f:
        return [l for l in f if not l.startswith("#")]


def _base(w, out):
    return ["call", "--bam", w["bam"], "--ref", w["fasta"],
            "--pileup-model", PILEUP_CKPT,
            "--haplotype-model", HAP_CKPT,
            "--phaser", "native",
            "--contigs"] + w["contigs"] + ["-o", str(out)]


@pytest.mark.parametrize("kill_after", ["s1_pileup_features",
                                        "s4_haplotype_features"])
def test_kill_and_resume_matches_clean_run(world, tmp_path, kill_after):
    w = world
    clean = tmp_path / f"clean_{kill_after}"
    r = subprocess.run(_cli_cmd(_base(w, clean)), env=_env(),
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-3000:]
    want_merge = _body(clean / "merge.vcf")
    want_pileup = _body(clean / "pileup.vcf")
    assert want_merge and want_pileup

    out = tmp_path / f"crash_{kill_after}"
    proc = subprocess.Popen(_cli_cmd(_base(w, out)), env=_env(),
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL)
    marker = out / ".stages" / f"{kill_after}.done"
    deadline = time.monotonic() + 600
    while time.monotonic() < deadline:
        if marker.exists():
            break
        if proc.poll() is not None:
            pytest.fail(f"pipeline exited before {kill_after} completed")
        time.sleep(0.05)
    else:
        proc.kill()
        pytest.fail(f"timed out waiting for {marker}")
    # the next stage is now mid-flight (or about to start); kill hard so
    # partial artifacts stay on disk exactly as a crash would leave them
    proc.send_signal(signal.SIGKILL)
    proc.wait(timeout=60)
    assert not (out / "merge.vcf").exists() or _body(out / "merge.vcf") == []

    r = subprocess.run(_cli_cmd(_base(w, out)), env=_env(),
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-3000:]
    assert _body(out / "pileup.vcf") == want_pileup
    assert _body(out / "merge.vcf") == want_merge
