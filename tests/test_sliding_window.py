"""Sliding-window attention flag (main.py:51-60 parity): enabling a window
changes attention only beyond the window, only on the designated layers."""

import numpy as np

import jax
import jax.numpy as jnp

from time_r1_tpu.models.qwen25vl import Qwen25VLConfig, get_rope_index, init_params
from time_r1_tpu.models.qwen25vl.model import forward


def _cfg(window=None, max_window_layers=0):
    cfg = Qwen25VLConfig.tiny_test()
    if window is not None:
        cfg = cfg.with_sliding_window(True, window, max_window_layers)
    return cfg


def test_sliding_window_changes_long_range_only():
    base = _cfg()
    slid = _cfg(window=4, max_window_layers=0)  # all layers sliding
    params = init_params(base, jax.random.PRNGKey(0), dtype=jnp.float32)

    rng = np.random.default_rng(0)
    ids = rng.integers(2, 200, size=(1, 12)).astype(np.int64)
    pos, _ = get_rope_index(base, ids)

    lg_base, _ = forward(params, base, jnp.asarray(ids), jnp.asarray(pos))
    lg_slid, _ = forward(params, slid, jnp.asarray(ids), jnp.asarray(pos))

    a, b = np.asarray(lg_base), np.asarray(lg_slid)
    # positions with <window context see identical attention
    np.testing.assert_allclose(a[:, :4], b[:, :4], atol=1e-5)
    # later positions diverge (older keys masked out)
    assert np.abs(a[:, -1] - b[:, -1]).max() > 1e-4


def test_max_window_layers_keeps_bottom_layers_full():
    base = _cfg()
    # sliding only ABOVE layer 2 — tiny model has 2 layers → nothing slides
    slid_none = _cfg(window=4, max_window_layers=2)
    params = init_params(base, jax.random.PRNGKey(0), dtype=jnp.float32)
    rng = np.random.default_rng(1)
    ids = rng.integers(2, 200, size=(1, 10)).astype(np.int64)
    pos, _ = get_rope_index(base, ids)
    a, _ = forward(params, base, jnp.asarray(ids), jnp.asarray(pos))
    b, _ = forward(params, slid_none, jnp.asarray(ids), jnp.asarray(pos))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
