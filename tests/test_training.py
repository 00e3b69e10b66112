"""Training-path tests: truth splitting, label joins, and a smoke training
run on synthetic planted variants (loss decreases, accuracy beats chance)."""
import numpy as np
import pytest
import jax

from synth import random_genome
from bamgen import random_reads, simulate_mpileup

from nanosnp_tpu.config import PileupModelConfig, TrainConfig, PipelineConfig
from nanosnp_tpu.features.pileup import assemble_windows, parse_mpileup_text
from nanosnp_tpu.train import data as D
from nanosnp_tpu.train.train_pileup import train_pileup


def test_split_truth_vcf():
    lines = [
        "##x\n",
        "chr1\t100\t.\tA\tC\t30\tPASS\t.\tGT\t0/1\n",
        "chr1\t200\t.\tG\tT\t30\tPASS\t.\tGT\t1|1\n",
        "chr1\t300\t.\tG\tT,*\t30\tPASS\t.\tGT\t1/2\n",   # fixable
        "chr1\t400\t.\tG\tT,*,A\t30\tPASS\t.\tGT\t1/2\n", # not fixable
        "chr2\t50\t.\tT\tA\t30\tPASS\t.\tGT\t./1\n",      # . -> 0
    ]
    got = D.split_truth_vcf(lines)
    assert [t.pos for t in got["chr1"]] == [100, 200, 300]
    t = got["chr1"][2]
    assert (t.alt, t.gt1, t.gt2) == ("T,", 0, 1)
    assert got["chr2"][0].gt1 == 0 and got["chr2"][0].gt2 == 1


def test_extend_bed_merge():
    got = D.extend_bed_intervals([("c", 100, 110), ("c", 150, 160),
                                  ("c", 400, 410)], extend=31)
    assert got == [("c", 69, 191), ("c", 369, 441)]


def _plant_variants(rng, genome_seq, reads, n_sites=25):
    """Plant strong het/hom SNVs into reads; returns truth rows."""
    L = len(genome_seq)
    sites = np.sort(rng.choice(np.arange(60, L - 60), size=n_sites,
                               replace=False))
    truth = []
    for pos0 in sites:
        ref = genome_seq[pos0].upper()
        if ref not in "ACGT":
            continue
        alt = rng.choice([b for b in "ACGT" if b != ref])
        hom = rng.random() < 0.4
        truth.append(D.TruthSite(int(pos0) + 1, ref, alt,
                                 1 if hom else 0, 1))
        for r in reads:
            # find query index aligned to pos0
            rpos, qpos = r.start0, 0
            qi = None
            for op, ln in r.cigar:
                if op in "M=X":
                    if rpos <= pos0 < rpos + ln:
                        qi = qpos + (pos0 - rpos)
                        break
                    rpos += ln
                    qpos += ln
                elif op in "DN":
                    rpos += ln
                elif op in "IS":
                    qpos += ln
            if qi is not None and (hom or rng.random() < 0.5):
                r.seq = r.seq[:qi] + alt + r.seq[qi + 1:]
    return truth


def test_train_arrays_and_smoke_training(tmp_path):
    rng = np.random.default_rng(90)
    genome = random_genome(rng, {"chrT": 6000})
    seq = np.frombuffer(genome["chrT"].encode(), dtype=np.uint8).copy()
    reads = random_reads(rng, genome["chrT"], 0, n_reads=900, read_len=250,
                         mq_range=(30, 60))
    truth = _plant_variants(rng, genome["chrT"], reads, n_sites=40)
    lines = simulate_mpileup(genome, {"chrT": reads})
    pile = parse_mpileup_text(lines, "chrT", seq)
    batch = assemble_windows(pile, seq)
    assert len(batch) > 30

    arrays = D.build_pileup_train_arrays(batch, truth, rng=rng)
    n_var = arrays.is_variant.sum()
    n_ref = (~arrays.is_variant).sum()
    assert n_var > 10
    assert n_ref <= 5 * n_var + 1  # subsample bound

    dec = D.decode_90dim_labels(arrays.label)
    # variant rows must not be labeled homo-ref
    assert (dec["zy"][arrays.is_variant] != 0).all()
    assert (dec["zy"][~arrays.is_variant] == 0).all()

    # smoke training: a few steps on a small model must reduce loss
    mcfg = PileupModelConfig(hidden_size=16, output_size=32, inner_size=32,
                             n_layers=1, dropout=0.0)
    tcfg = TrainConfig(batch_size=32, seed=1)
    tcfg.optim.lr = 3e-3
    tcfg.optim.type = "adam"

    losses = []

    def it():
        for x, gt, zy in D.batch_iterator(arrays, 32, rng=rng, epochs=30):
            yield x, gt, zy

    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        state = train_pileup(it(), mcfg, tcfg, steps_per_epoch=10**9,
                             out_dir=str(tmp_path), log_every=5,
                             max_steps=60)
    assert state.step == 60
    logs = [l for l in buf.getvalue().splitlines() if "loss " in l]
    first = float(logs[0].split("loss ")[1].split()[0])
    last = float(logs[-1].split("loss ")[1].split()[0])
    assert last < first, (first, last)

    # checkpoint round-trip
    from nanosnp_tpu.train.train_pileup import load_checkpoint

    params, blob = load_checkpoint(str(tmp_path / "last.ckpt"))
    assert blob["step"] == 60
    assert "encoder" in params


@pytest.mark.parametrize("opt_type", ["ranger", "ranger21"])
def test_ranger_optimizers_converge(opt_type):
    """Both Ranger flavors (reference PileupModel/optim.py:97-102 /
    HaplotypeModel/optim.py:104-125, pip packages in Dockerfile:27-29)
    optimize a toy least-squares problem."""
    import jax.numpy as jnp
    import optax

    from nanosnp_tpu.config import OptimConfig
    from nanosnp_tpu.train.optim import (build_optimizer,
                                         wrap_params_for_lookahead)

    cfg = OptimConfig(type=opt_type, lr=5e-2, begin_to_adjust_lr=1000)
    cfg.ranger21_epochs = 1
    tx = build_optimizer(cfg, steps_per_epoch=100)
    rng = np.random.default_rng(3)
    # row-zero-mean target: gradient centralization projects out each
    # row's mean-gradient, so a target with nonzero row means is
    # unreachable by construction — that's GC working, not a bug
    W_np = rng.normal(size=(8, 4))
    W_true = jnp.asarray(W_np - W_np.mean(axis=1, keepdims=True),
                         jnp.float32)
    X = jnp.asarray(rng.normal(size=(64, 8)), jnp.float32)
    Y = X @ W_true
    params = {"w": jnp.zeros((8, 4)), "b": jnp.zeros((4,))}
    params = wrap_params_for_lookahead(params, True)

    def loss_fn(p):
        return jnp.mean((X @ p["w"] + p["b"] - Y) ** 2)

    state = tx.init(params)

    @jax.jit
    def step(p, s):
        l, g = jax.value_and_grad(loss_fn)(p.fast)
        up, s = tx.update(g, s, p)
        return optax.apply_updates(p, up), s, l

    l0 = float(loss_fn(params.fast))
    for _ in range(500):
        params, state, loss = step(params, state)
    assert float(loss) < 0.2 * l0, (opt_type, l0, float(loss))


def test_gradient_centralization_and_norm_loss_components():
    import jax.numpy as jnp

    from nanosnp_tpu.train.optim import gradient_centralization, norm_loss

    gc = gradient_centralization()
    g2 = jnp.asarray(np.random.default_rng(0).normal(size=(4, 6)),
                     jnp.float32)
    g1 = jnp.ones((5,))
    out, _ = gc.update({"w": g2, "b": g1}, gc.init(None))
    # per-row zero mean for ndim>1; 1-D untouched
    np.testing.assert_allclose(np.asarray(out["w"]).mean(axis=1), 0,
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out["b"]), np.ones(5))

    nl = norm_loss(0.1)
    big = {"w": jnp.full((1, 4), 10.0)}     # ||p|| >> 1
    small = {"w": jnp.full((1, 4), 0.01)}   # ||p|| << 1
    zero_u = {"w": jnp.zeros((1, 4))}
    up_big, _ = nl.update(zero_u, nl.init(None), big)
    up_small, _ = nl.update(zero_u, nl.init(None), small)
    # pre-negation update: positive along p when ||p||>1 (shrinks after
    # scale_by_learning_rate's -lr), negative when ||p||<1 (grows)
    assert float(up_big["w"][0, 0]) > 0
    assert float(up_small["w"][0, 0]) < 0
