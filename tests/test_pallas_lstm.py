"""Pallas fused-LSTM kernel vs the lax.scan implementation (interpret mode
on CPU; the compiled path runs on real TPU via bench)."""
import numpy as np
import jax
import jax.numpy as jnp

from nanosnp_tpu.models.bilstm import init_bilstm_params, bilstm_encoder
from nanosnp_tpu.ops.pallas_lstm import bilstm_layer_pallas


def _xp_from_layer(layer, x):
    """Input projections exactly as models/bilstm._bilstm_layer builds them."""
    xp = jnp.einsum("nld,zdk->znlk", x, layer["w_ih"],
                    preferred_element_type=jnp.float32)
    xp = xp + layer["b"][:, None, None, :]
    return jnp.stack([xp[0].transpose(1, 0, 2),
                      xp[1].transpose(1, 0, 2)[::-1]], axis=1)  # [L,2,N,4H]


def test_pallas_layer_matches_scan_interpret():
    rng = np.random.default_rng(0)
    layers = init_bilstm_params(jax.random.key(0), 18, 16, 1)
    x = jnp.asarray(rng.standard_normal((12, 33, 18)), jnp.float32)

    want = bilstm_encoder(layers, x)  # [N, L, 2H]

    xp = _xp_from_layer(layers[0], x)
    hs = bilstm_layer_pallas(xp, layers[0]["w_hh"], block_n=8, interpret=True,
                             compute_dtype=jnp.float32)
    fwd = hs[:, 0].transpose(1, 0, 2)
    bwd = hs[::-1, 1].transpose(1, 0, 2)
    got = jnp.concatenate([fwd, bwd], axis=-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_pallas_layer_pads_ragged_batch():
    rng = np.random.default_rng(1)
    layers = init_bilstm_params(jax.random.key(1), 8, 8, 1)
    x = jnp.asarray(rng.standard_normal((5, 11, 8)), jnp.float32)  # 5 % 8 != 0
    want = bilstm_encoder(layers, x)
    xp = _xp_from_layer(layers[0], x)
    hs = bilstm_layer_pallas(xp, layers[0]["w_hh"], block_n=8, interpret=True,
                             compute_dtype=jnp.float32)
    got = jnp.concatenate([hs[:, 0].transpose(1, 0, 2),
                           hs[::-1, 1].transpose(1, 0, 2)], axis=-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_pallas_encoder_multilayer_interpret():
    """Full encoder fast path vs scan: multi-layer, both seq lengths."""
    rng = np.random.default_rng(2)
    for seq_len, n_layers, hidden in [(33, 2, 16), (11, 3, 8)]:
        layers = init_bilstm_params(jax.random.key(3), 10, hidden, n_layers)
        x = jnp.asarray(rng.standard_normal((9, seq_len, 10)), jnp.float32)
        want = bilstm_encoder(layers, x)
        from nanosnp_tpu.ops.pallas_lstm import bilstm_encoder_pallas

        got = bilstm_encoder_pallas(layers, x, compute_dtype=jnp.float32,
                                    block_n=8, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)
        ctr = bilstm_encoder_pallas(layers, x, compute_dtype=jnp.float32,
                                    block_n=8, interpret=True,
                                    center_only=True)
        np.testing.assert_allclose(np.asarray(ctr),
                                   np.asarray(want[:, seq_len // 2, :]),
                                   atol=2e-5)


def _scan_layer_from_xp(layer, xp):
    """Reference recurrence on prebuilt xp [L,2,N,4H] (scan path)."""
    import jax
    w_hh = layer["w_hh"]
    n = xp.shape[2]
    hidden = w_hh.shape[1]
    h0 = jnp.zeros((2, n, hidden), jnp.float32)
    c0 = jnp.zeros((2, n, hidden), jnp.float32)

    def step(carry, xt):
        h, c = carry
        gates = xt + jnp.einsum("znh,zhk->znk", h, w_hh,
                                preferred_element_type=jnp.float32)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    _, hs = jax.lax.scan(step, (h0, c0), xp)
    return hs


def test_pallas_recurrence_vjp_matches_scan_grads():
    """The Pallas backward kernel (custom VJP) must produce the same
    gradients w.r.t. the input projections and the recurrent weights as
    autodiff through the scan path (interpret mode, f32)."""
    rng = np.random.default_rng(7)
    layers = init_bilstm_params(jax.random.key(5), 6, 8, 1)
    layer = layers[0]
    x = jnp.asarray(rng.standard_normal((5, 9, 6)), jnp.float32)
    xp = _xp_from_layer(layer, x)
    g_out = jnp.asarray(rng.standard_normal((9, 2, 5, 8)), jnp.float32)

    def loss_scan(xp_, w_):
        hs = _scan_layer_from_xp({"w_hh": w_}, xp_)
        return jnp.sum(hs * g_out)

    def loss_pallas(xp_, w_):
        hs = bilstm_layer_pallas(xp_, w_, block_n=8, interpret=True,
                                 compute_dtype=jnp.float32)
        return jnp.sum(hs * g_out)

    want_dxp, want_dw = jax.grad(loss_scan, argnums=(0, 1))(
        xp, layer["w_hh"])
    got_dxp, got_dw = jax.grad(loss_pallas, argnums=(0, 1))(
        xp, layer["w_hh"])
    np.testing.assert_allclose(np.asarray(got_dxp), np.asarray(want_dxp),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_dw), np.asarray(want_dw),
                               atol=1e-5, rtol=1e-5)


def test_pallas_train_step_grads_full_model():
    """End-to-end: grads of the pileup model loss with use_pallas=True
    (interpret) equal the scan-path grads."""
    from nanosnp_tpu.config import PileupModelConfig
    from nanosnp_tpu.models.pileup_model import init_pileup_params, pileup_forward
    from nanosnp_tpu.train.losses import label_smoothing_loss

    rng = np.random.default_rng(8)
    # dropout 0.0 + a dropout_rng: forces the TRAINING branch (the
    # inference fast path has no VJP) while keeping both paths
    # deterministic and identical
    cfg = PileupModelConfig(hidden_size=8, output_size=16, inner_size=16,
                            n_layers=2, dropout=0.0)
    params = init_pileup_params(jax.random.key(9), cfg)
    x = jnp.asarray(rng.standard_normal((6, 33, 18)), jnp.float32)
    gt_t = jnp.asarray(rng.integers(0, 21, 6))
    drng = jax.random.key(4)

    def loss(p, use_pallas):
        gt, zy, _, _ = pileup_forward(p, x, cfg, all_heads=False,
                                      dropout_rng=drng,
                                      use_pallas=use_pallas,
                                      pallas_interpret=True)
        return label_smoothing_loss(gt, gt_t, 0.1)

    g_scan = jax.grad(lambda p: loss(p, False))(params)
    g_pallas = jax.grad(lambda p: loss(p, True))(params)
    for a, b in zip(jax.tree.leaves(g_scan), jax.tree.leaves(g_pallas)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-5, rtol=1e-4)


def test_pallas_encoder_fused_matches_unfused():
    """Fused in-projection kernels vs the streaming-xp path (interpret).

    Covers both output modes: full sequence (intermediate layers stream
    bf16 in production; f32 here for exact comparison) and center-only
    (the blocked single-write kernel)."""
    from nanosnp_tpu.ops.pallas_lstm import bilstm_encoder_pallas

    rng = np.random.default_rng(7)
    layers = init_bilstm_params(jax.random.key(9), 18, 16, 2)
    x = jnp.asarray(rng.standard_normal((12, 33, 18)), jnp.float32)
    for center_only in (False, True):
        want = bilstm_encoder_pallas(layers, x, compute_dtype=jnp.float32,
                                     block_n=8, interpret=True,
                                     center_only=center_only, fused=False)
        got = bilstm_encoder_pallas(layers, x, compute_dtype=jnp.float32,
                                    block_n=8, interpret=True,
                                    center_only=center_only, fused=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)


def test_pallas_encoder_two_layer_fusion_gate():
    """The r5 whole-encoder fusion (both layers in one kernel, VMEM
    inter-layer slab) must equal the per-layer kernel path exactly, and
    NSP_FUSE_LAYERS=0 must route back to the split kernels."""
    import os

    from nanosnp_tpu.ops.pallas_lstm import bilstm_encoder_pallas

    rng = np.random.default_rng(11)
    layers = init_bilstm_params(jax.random.key(13), 18, 16, 2)
    x = jnp.asarray(rng.standard_normal((17, 33, 18)), jnp.float32)
    old = os.environ.get("NSP_FUSE_LAYERS")
    try:
        os.environ["NSP_FUSE_LAYERS"] = "0"
        split = bilstm_encoder_pallas(layers, x, compute_dtype=jnp.float32,
                                      block_n=8, interpret=True,
                                      center_only=True)
        os.environ["NSP_FUSE_LAYERS"] = "1"
        fused2 = bilstm_encoder_pallas(layers, x, compute_dtype=jnp.float32,
                                       block_n=8, interpret=True,
                                       center_only=True)
    finally:
        if old is None:
            os.environ.pop("NSP_FUSE_LAYERS", None)
        else:
            os.environ["NSP_FUSE_LAYERS"] = old
    np.testing.assert_allclose(np.asarray(fused2), np.asarray(split),
                               atol=2e-5)
    # scan-path oracle
    want = bilstm_encoder(layers, x)[:, 33 // 2, :]
    np.testing.assert_allclose(np.asarray(fused2), np.asarray(want),
                               atol=2e-5)
