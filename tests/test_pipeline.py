"""Pipeline-parallel decoder forward (parallel/pipeline.py): the GPipe
schedule over a `stage` mesh axis must reproduce the plain full-layer forward
exactly (f32) on the virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_model_parity import CFG
from time_r1_tpu.models.qwen25vl import init_params
from time_r1_tpu.models.qwen25vl.language import decoder_forward
from time_r1_tpu.parallel.pipeline import make_pp_mesh, pp_decoder_layers


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs ≥2 virtual devices")
@pytest.mark.parametrize("n_micro", [1, 2, 4])
def test_pp_matches_plain_forward(n_micro):
    cfg = CFG.text  # tiny: 2 layers → 2 stages × 1 layer
    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)["text"]
    rng = np.random.default_rng(0)
    B, S, H = 4, 12, cfg.hidden_size
    embeds = jnp.asarray(rng.normal(size=(B, S, H)).astype(np.float32))
    pos = jnp.broadcast_to(jnp.arange(S)[None, None, :], (3, B, S)).astype(jnp.int32)
    mask = np.ones((B, S), np.int32)
    mask[1, :3] = 0  # left padding on one row
    mask = jnp.asarray(mask)

    want, _ = decoder_forward(params, cfg, embeds, pos, attention_mask=mask)

    mesh = make_pp_mesh(2)
    hidden = pp_decoder_layers(params["layers"], cfg, embeds, pos, mask, mesh, n_micro=n_micro)
    # pp covers the layers; apply the final norm like decoder_forward does
    from time_r1_tpu.models.qwen25vl.language import _rms_norm

    got = _rms_norm(hidden, params["norm"]["scale"], cfg.rms_norm_eps)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >= 4 virtual devices")
def test_pp_tp_forward_matches_plain():
    """TP inside each GPipe stage (2 stages × TP 2): the microbatched
    pipelined forward with Megatron-split layers must match the plain
    decoder bitwise-ish."""
    from time_r1_tpu.models.qwen25vl.language import decoder_forward
    from time_r1_tpu.parallel.pipeline import make_pp_mesh, pp_decoder_layers

    cfg = CFG.text
    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)["text"]
    rng = np.random.default_rng(23)
    B, S = 4, 24
    embeds = jnp.asarray(rng.normal(size=(B, S, cfg.hidden_size)).astype(np.float32))
    pos = jnp.broadcast_to(jnp.arange(S)[None, None, :], (3, B, S)).astype(jnp.int32)
    mask = np.ones((B, S), np.int32)
    mask[1, S - 5 :] = 0
    mask = jnp.asarray(mask)

    want, _ = decoder_forward(params, cfg, embeds, pos, attention_mask=mask, use_flash=False)
    mesh = make_pp_mesh(2, tp=2)
    got = pp_decoder_layers(params["layers"], cfg, embeds, pos, mask, mesh, n_micro=2)
    # pp_decoder_layers returns pre-final-norm hidden; apply the norm to match
    from time_r1_tpu.models.qwen25vl.language import _rms_norm

    got = _rms_norm(got, params["norm"]["scale"], cfg.rms_norm_eps)
    valid = np.asarray(mask, bool)
    np.testing.assert_allclose(
        np.asarray(got)[valid], np.asarray(want)[valid], rtol=3e-5, atol=3e-5
    )
