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
