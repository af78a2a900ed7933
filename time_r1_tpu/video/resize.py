"""Device-side bicubic antialiased resize (N6: torchvision-resize capability).

The reference resizes decoded frames with torchvision's antialiased bicubic
(vision_process.py:398-403). That operation is a separable convolution with
the Catmull-Rom-style cubic kernel (A = -0.5, the PIL/torch-antialias filter),
with the support widened by the scale factor when downsampling.

TPU-native formulation: the per-axis tap weights depend only on
(in_size, out_size), so they are precomputed on host as DENSE (out, in)
matrices and the resize becomes two MXU matmuls per frame:
    out = clip(round(W_h @ img @ W_wᵀ))
— bandwidth-trivial, batched over (T, C), and fused by XLA with the
normalize/patchify that follows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _cubic(x: np.ndarray, a: float = -0.5) -> np.ndarray:
    ax = np.abs(x)
    ax2, ax3 = ax * ax, ax * ax * ax
    return np.where(
        ax <= 1.0,
        (a + 2) * ax3 - (a + 3) * ax2 + 1,
        np.where(ax < 2.0, a * ax3 - 5 * a * ax2 + 8 * a * ax - 4 * a, 0.0),
    )


@functools.lru_cache(maxsize=64)
def resize_weights(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) float32 antialiased bicubic weight matrix
    (PIL/torchvision-antialias semantics: support 2·max(scale,1), taps at
    pixel centers, weights normalized to 1)."""
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = 2.0 * filterscale
    w = np.zeros((out_size, in_size), np.float64)
    for i in range(out_size):
        center = (i + 0.5) * scale
        lo = max(int(center - support + 0.5), 0)
        hi = min(int(center + support + 0.5), in_size)
        taps = np.arange(lo, hi)
        k = _cubic((taps + 0.5 - center) / filterscale)
        s = k.sum()
        if s != 0:
            k = k / s
        w[i, lo:hi] = k
    return w.astype(np.float32)


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def _resize_device(frames: jnp.ndarray, wh: jnp.ndarray, ww: jnp.ndarray, out_h: int, out_w: int):
    # frames: (T, H, W, C) uint8 → (T, out_h, out_w, C) uint8
    x = frames.astype(jnp.float32)
    x = jnp.einsum("oh,thwc->towc", wh, x)
    x = jnp.einsum("pw,towc->topc", ww, x)
    x = jnp.clip(jnp.round(x), 0, 255)
    return x.astype(jnp.uint8)


def resize_frames_device(frames: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """(T, H, W, C) uint8 → (T, out_h, out_w, C) uint8 on the default device."""
    T, H, W, C = frames.shape
    if (H, W) == (out_h, out_w):
        return frames
    wh = jnp.asarray(resize_weights(H, out_h))
    ww = jnp.asarray(resize_weights(W, out_w))
    return np.asarray(_resize_device(jnp.asarray(frames), wh, ww, out_h, out_w))
