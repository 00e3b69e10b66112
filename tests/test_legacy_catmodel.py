"""JAX CatModel vs the reference torch CatModel (model.py:201-360),
weights converted from a randomly initialized torch instance — the same
oracle strategy the production haplotype model uses (no trained legacy
checkpoint exists anywhere in the reference)."""
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nanosnp_tpu.legacy.catmodel import (build_g_images, calculate_percentage,
                                         catmodel_forward, catmodel_predict,
                                         init_catmodel_params,
                                         load_catmodel_torch)

REF_DIR = "/root/reference/HaplotypeModel"


def _torch_catmodel():
    torch = pytest.importorskip("torch")
    import types

    # the reference's optim.py imports the pip-only Ranger optimizer at
    # module level; CatModel never uses it
    for name in ("ranger", "ranger21"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.Ranger = object
            mod.Ranger21 = object
            sys.modules[name] = mod
    if REF_DIR not in sys.path:
        sys.path.insert(0, REF_DIR)
    try:
        from model import CatModel
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference CatModel unimportable: {e}")
    torch.manual_seed(0)
    m = CatModel(nc0=5, nc1=5, nc2=2, nclass=10, nh=256)
    m.eval()
    return torch, m


def _rand_inputs(rng, n=6, md=20):
    g0 = rng.choice([-2, -1, 0, 1, 2, 3, 4], size=(n, 2 * md, 11)).astype(np.float32)
    g1 = rng.choice([-2, -1, 0, 1, 2, 3, 4], size=(n, 2 * md, 11)).astype(np.float32)
    def image(reads, phase_split):
        bq = rng.integers(0, 40, reads.shape).astype(np.float32)
        mq = rng.integers(0, 60, reads.shape).astype(np.float32)
        mask = (reads != -2).astype(np.float32)
        ph = np.broadcast_to(
            np.where(np.arange(reads.shape[1])[None, :, None] < phase_split,
                     1.0, 2.0), reads.shape).astype(np.float32)
        return np.stack([reads, bq, mq, mask, ph], axis=3)
    return image(g0, md), image(g1, md)


def test_percentage_matches_reference_semantics():
    rng = np.random.default_rng(3)
    ts = rng.choice([-2, -1, 0, 1, 2, 3, 4], size=(11, 4, 20))
    got = np.asarray(calculate_percentage(jnp.asarray(ts, jnp.float32)))
    denom = (ts != -2).sum(2) + 1e-9
    for k, code in enumerate((1, 2, 3, 4, -1)):
        np.testing.assert_allclose(got[..., k], (ts == code).sum(2) / denom,
                                   rtol=1e-6)


def test_catmodel_matches_torch_reference():
    torch, ref = _torch_catmodel()
    params = load_catmodel_torch(ref.state_dict())
    rng = np.random.default_rng(17)
    g0, g1 = _rand_inputs(rng)
    with torch.no_grad():
        want = ref.predict(torch.tensor(g0), torch.tensor(g1),
                           torch.zeros(1), torch.zeros(1)).numpy()
    got = np.asarray(catmodel_predict(params, jnp.asarray(g0),
                                      jnp.asarray(g1)))
    np.testing.assert_allclose(got, want, atol=2e-4)
    assert (np.argmax(got, 1) == np.argmax(want, 1)).all()


def test_catmodel_init_and_train_step_shapes():
    rng = np.random.default_rng(23)
    params = init_catmodel_params(jax.random.key(0))
    g0, g1 = _rand_inputs(rng, n=4)
    logits, updated = catmodel_forward(params, jnp.asarray(g0),
                                       jnp.asarray(g1), train=True,
                                       dropout_rng=jax.random.key(1))
    assert logits.shape == (4, 10)
    # train mode must move the BN running stats
    b0 = params["res_blocks"][0]["bn1"]["mean"]
    b1 = updated["res_blocks"][0]["bn1"]["mean"]
    assert not np.allclose(np.asarray(b0), np.asarray(b1))


def test_build_g_images_layout():
    n, d, p = 3, 12, 11
    t1 = {"read": np.full((n, d, p), 1, np.int32),
          "baseq": np.full((n, d, p), 7, np.int32),
          "mapq": np.full((n, d, p), 9, np.int32)}
    t2 = {"read": np.full((n, d, p), -2, np.int32),
          "baseq": np.full((n, d, p), 0, np.int32),
          "mapq": np.full((n, d, p), 0, np.int32)}
    img = build_g_images(t1, t2, max_depth=20)
    assert img.shape == (n, 40, p, 5)
    assert (img[:, :12, :, 0] == 1).all() and (img[:, 12:20, :, 0] == -2).all()
    assert (img[:, :20, :, 4] == 1).all() and (img[:, 20:, :, 4] == 2).all()
    # mask channel: real rows 1, padded rows 0 in tag1; tag2 all pad
    assert (img[:, :12, :, 3] == 1).all() and (img[:, 20:, :, 3] == 0).all()


def test_catmodel_pallas_path_matches_scan_interpret():
    """use_pallas (fused kernels, interpret mode on CPU) must reproduce
    the scan path — this is the TPU inference configuration."""
    rng = np.random.default_rng(29)
    params = init_catmodel_params(jax.random.key(5))
    g0, g1 = _rand_inputs(rng, n=4)
    want = np.asarray(catmodel_predict(params, jnp.asarray(g0),
                                       jnp.asarray(g1)))
    got, _ = catmodel_forward(params, jnp.asarray(g0), jnp.asarray(g1),
                              use_pallas=True, pallas_interpret=True)
    got = np.asarray(jax.nn.softmax(got, axis=-1))
    np.testing.assert_allclose(got, want, atol=2e-5)
