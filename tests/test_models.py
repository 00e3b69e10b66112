"""Numerical parity of the JAX models against torch oracles.

The torch oracles are constructed here from torch.nn primitives configured
like the reference models (PileupModel/model.py, HaplotypeModel/model_dev.py)
and, for the pileup model, loaded with the reference's production checkpoint.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nanosnp_tpu.config import PileupModelConfig, HaplotypeModelConfig
from nanosnp_tpu.models.bilstm import init_bilstm_params, bilstm_encoder
from nanosnp_tpu.models.convert import (
    lstm_layers_from_torch,
    load_pileup_checkpoint,
    haplotype_params_from_torch,
)
from nanosnp_tpu.models.pileup_model import init_pileup_params, pileup_forward, pileup_predict
from nanosnp_tpu.models.haplotype_model import (
    init_haplotype_params,
    haplotype_predict,
)

torch = pytest.importorskip("torch")

REF_CKPT = "/root/reference/PileupModel/models/ont_pileup.chkpt"

# Parity policy (round-1 review: a 1-in-N flaky parity suite gets ignored).
# Strict elementwise parity against the torch oracle is only meaningful on
# the f32 CPU path — TPU/bf16 runs assert behavior instead: argmax (decode
# decision) agreement on all but borderline sites plus a bounded impact on
# the emitted Phred quality.
#
# Even on CPU, *both* stacks' f32 matmul reduction order depends on the
# thread-pool partitioning (XLA:CPU and torch pick splits by core
# availability), so elementwise diffs move with machine load: observed
# 2.2e-5 under an idle box and >3e-5 when the suite shares the host with a
# benchmark run. The strict tolerance is therefore set above the
# scheduling-noise band (probabilities live in [0,1]; 2e-4 is still ~40x
# tighter than any decode-visible effect), and the decode-level invariants —
# exact argmax agreement and sub-0.5 Phred movement — are asserted
# unconditionally.
STRICT = jax.default_backend() == "cpu"
STRICT_ATOL = 2e-4


def _phred(p):
    p = np.clip(p, 1e-10, 1 - 1e-10)
    return np.maximum(-10 * np.log10(np.e) * np.log((1 - p) / p) + 10, 0)


def assert_model_parity(got, want, atol, label=""):
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    if STRICT:
        np.testing.assert_allclose(got, want, atol=max(atol, STRICT_ATOL),
                                   err_msg=label)
        assert (got.argmax(1) == want.argmax(1)).all(), label
        q_got = _phred(got.max(1))
        q_want = _phred(want.max(1))
        assert np.abs(q_got - q_want).max() < 0.5, label
        return
    # platform-tolerant behavioral check: decode decisions agree except
    # where the oracle itself is within bf16 noise of a tie (measured flip
    # margins reach ~0.03), and the Phred quality the decoder would emit
    # moves by < 1 unit (measured max ~0.37 under bf16)
    agree = got.argmax(1) == want.argmax(1)
    top2 = np.sort(want, axis=1)[:, -2:]
    margin = top2[:, 1] - top2[:, 0]
    borderline = margin < 5e-2
    assert (agree | borderline).all(), (
        f"{label}: argmax changed on non-borderline sites "
        f"(n={int((~agree & ~borderline).sum())})")
    q_got = _phred(got.max(1))
    q_want = _phred(want.max(1))
    assert np.abs(q_got - q_want).max() < 1.0, label


def test_bilstm_matches_torch_lstm():
    rng = np.random.default_rng(101)
    torch.manual_seed(0)
    lstm = torch.nn.LSTM(input_size=18, hidden_size=64, num_layers=2,
                         batch_first=True, bidirectional=True)
    sd = lstm.state_dict()
    layers = lstm_layers_from_torch(sd, "", 2)
    x = rng.standard_normal((7, 33, 18)).astype(np.float32)
    with torch.no_grad():
        want, _ = lstm(torch.from_numpy(x))
    got = bilstm_encoder(jax.tree.map(jnp.asarray, layers), jnp.asarray(x))
    atol = STRICT_ATOL if STRICT else 5e-2  # see parity-policy note above
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=atol)


def _torch_pileup_oracle():
    """Reference-shaped torch modules loaded with the production checkpoint."""
    ck = torch.load(REF_CKPT, map_location="cpu", weights_only=False)

    lstm = torch.nn.LSTM(input_size=18, hidden_size=64, num_layers=2,
                         batch_first=True, bidirectional=True)
    proj = torch.nn.Linear(128, 128)
    dense = torch.nn.Linear(128, 256)
    heads = {h: torch.nn.Linear(256, n) for h, n in
             [("genotype_layer", 21), ("zygosity_layer", 3),
              ("indel1_layer", 33), ("indel2_layer", 33)]}

    enc = ck["encoder"]
    lstm.load_state_dict({k[len("lstm."):]: v for k, v in enc.items()
                          if k.startswith("lstm.")})
    proj.load_state_dict({k[len("output_proj."):]: v for k, v in enc.items()
                          if k.startswith("output_proj.")})
    fwd = ck["forward_layer"]
    dense.load_state_dict({k[len("dense."):]: v for k, v in fwd.items()
                           if k.startswith("dense.")})
    for name, mod in heads.items():
        mod.load_state_dict({k[len(name) + 1:]: v for k, v in fwd.items()
                             if k.startswith(name + ".")})

    def predict(x):
        with torch.no_grad():
            out, _ = lstm(torch.from_numpy(x))
            out = proj(out)
            out = torch.tanh(dense(out))[:, 16, :]
            gt = torch.softmax(heads["genotype_layer"](out), 1)
            zy = torch.softmax(heads["zygosity_layer"](out), 1)
        return gt.numpy(), zy.numpy()

    return predict


def test_pileup_model_matches_reference_checkpoint():
    rng = np.random.default_rng(102)
    cfg = PileupModelConfig()
    params = jax.tree.map(jnp.asarray, load_pileup_checkpoint(REF_CKPT))
    oracle = _torch_pileup_oracle()

    # counts-like inputs in the real data range (int counts, ref-negation)
    x = rng.integers(-40, 40, size=(256, 33, 18)).astype(np.float32)
    want_gt, want_zy = oracle(x)
    got_gt, got_zy = pileup_predict(params, jnp.asarray(x), cfg)
    assert_model_parity(got_gt, want_gt, atol=3e-5, label="gt")
    assert_model_parity(got_zy, want_zy, atol=3e-5, label="zy")


def test_haplotype_model_matches_torch():
    rng = np.random.default_rng(103)
    cfg = HaplotypeModelConfig()
    torch.manual_seed(1)

    class Branch(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.lstm = torch.nn.LSTM(input_size=105, hidden_size=256, num_layers=3,
                                      batch_first=True, bidirectional=True)
            self.output_proj = torch.nn.Linear(512, 256)

        def forward(self, x):
            out, _ = self.lstm(x)
            return self.output_proj(out)

    p_enc, h_enc = Branch(), Branch()
    dense = torch.nn.Linear(512, 256)
    gt_head, zy_head = torch.nn.Linear(256, 10), torch.nn.Linear(256, 3)

    sd = {}
    for prefix, mod in [("pileup_encoder.", p_enc), ("haplotype_encoder.", h_enc)]:
        for k, v in mod.state_dict().items():
            sd[prefix + k] = v
    for prefix, mod in [("forward_layer.dense", dense),
                        ("forward_layer.genotype_layer", gt_head),
                        ("forward_layer.zygosity_layer", zy_head)]:
        for k, v in mod.state_dict().items():
            sd[prefix + "." + k] = v
    params = jax.tree.map(jnp.asarray, haplotype_params_from_torch(sd))

    xp = rng.standard_normal((5, 33, 105)).astype(np.float32)
    xh = rng.standard_normal((5, 11, 105)).astype(np.float32)
    with torch.no_grad():
        ep = p_enc(torch.from_numpy(xp))[:, 16, :]
        eh = h_enc(torch.from_numpy(xh))[:, 5, :]
        feat = torch.tanh(dense(torch.cat([ep, eh], dim=1)))
        want_gt = torch.softmax(gt_head(feat), 1).numpy()
        want_zy = torch.softmax(zy_head(feat), 1).numpy()

    got_gt, got_zy = haplotype_predict(params, jnp.asarray(xp), jnp.asarray(xh), cfg)
    assert_model_parity(got_gt, want_gt, atol=7e-5, label="hap gt")
    assert_model_parity(got_zy, want_zy, atol=7e-5, label="hap zy")


def test_init_shapes_and_jit():
    rng = np.random.default_rng(104)
    cfg = PileupModelConfig()
    params = init_pileup_params(jax.random.key(0), cfg)
    x = jnp.asarray(rng.standard_normal((4, 33, 18)), jnp.float32)
    gt, zy, id1, id2 = jax.jit(
        lambda p, x: pileup_forward(p, x, cfg))(params, x)
    assert gt.shape == (4, 21) and zy.shape == (4, 3)
    assert id1.shape == (4, 33) and id2.shape == (4, 33)

    hcfg = HaplotypeModelConfig()
    hparams = init_haplotype_params(jax.random.key(1), hcfg)
    gt, zy = haplotype_predict(
        hparams,
        jnp.asarray(rng.standard_normal((4, 33, 105)), jnp.float32),
        jnp.asarray(rng.standard_normal((4, 11, 105)), jnp.float32),
        hcfg,
    )
    assert gt.shape == (4, 10) and zy.shape == (4, 3)
    np.testing.assert_allclose(np.asarray(gt.sum(1)), 1.0, atol=1e-5)


def test_shipped_haplotype_checkpoint_loads():
    """The checked-in fp16 npz haplotype weights load through the standard
    checkpoint loader and drive the model (shape + normalization sanity)."""
    import os

    from nanosnp_tpu.train.train_pileup import load_checkpoint

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "nanosnp_tpu", "models", "weights",
        "ont_haplotype_synthetic.npz")
    params, _ = load_checkpoint(path)
    cfg = HaplotypeModelConfig()
    rng = np.random.default_rng(5)
    xp = jnp.asarray(rng.standard_normal((3, 33, 105)), jnp.float32)
    xh = jnp.asarray(rng.standard_normal((3, 11, 105)), jnp.float32)
    gt, zy = haplotype_predict(params, xp, xh, cfg)
    assert gt.shape == (3, 10) and zy.shape == (3, 3)
    np.testing.assert_allclose(np.asarray(gt.sum(1)), 1.0, atol=1e-5)
