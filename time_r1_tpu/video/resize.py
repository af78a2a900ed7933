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


@functools.lru_cache(maxsize=64)
def resize_taps(in_size: int, out_size: int) -> tuple[np.ndarray, np.ndarray]:
    """Banded form of resize_weights: (starts (out,) int32, taps (out, K) f32)
    where K is the maximum support width. Row i of the dense matrix is zero
    outside [starts[i], starts[i]+K); taps holds exactly those values (zero-
    padded from the dense row), so banded evaluation computes the identical
    sum with ~2·support terms instead of in_size."""
    w = resize_weights(in_size, out_size)
    nz = w != 0.0
    starts = nz.argmax(axis=1).astype(np.int64)
    K = int(nz.sum(axis=1).max())
    # keep the window in-bounds; shifted-in entries are zeros of the dense row
    starts = np.minimum(starts, in_size - K)
    taps = np.stack([w[i, s : s + K] for i, s in enumerate(starts)])
    return starts.astype(np.int32), np.ascontiguousarray(taps, np.float32)


def _resize_axis_host(x: np.ndarray, starts: np.ndarray, taps: np.ndarray, axis: int):
    """Resize one axis of float32 `x` via the banded taps: K gather+FMA
    passes (K ≈ 2·support ≈ 8) instead of a dense in_size-wide contraction —
    the host is FLOP-bound on one core, and the dense matmul does ~45× the
    work for identical results (the skipped entries are exact zeros)."""
    out = None
    shape = [1] * x.ndim
    shape[axis] = -1
    for k in range(taps.shape[1]):
        seg = np.take(x, starts + k, axis=axis)
        seg *= taps[:, k].reshape(shape)
        out = seg if out is None else out + seg
    return out


_RESIZE_LIB = None


def _native_lib():
    """Build/load the tiny dependency-free banded-resize library (next to the
    FFmpeg decoder's; same build-on-first-use scheme as video/decoder.py)."""
    global _RESIZE_LIB
    if _RESIZE_LIB is not None:
        return _RESIZE_LIB
    import ctypes
    import os
    import subprocess

    native = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native")
    src = os.path.join(native, "resize.cpp")
    so = os.path.join(native, "libtimer1_resize.so")
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
        base = ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", src, "-o", so]
        # -march=native widens the banded loops to the host's vector ISA
        # (build-on-first-use runs on the target CPU); -ffp-contract=off
        # forbids FMA contraction so (v*rescale - mean)/std rounds exactly
        # like the numpy/torch two-step reference (GCC contracts across
        # statements by default at -O, which flips low-ulp bits). Fall back
        # to baseline codegen if the flags are rejected.
        try:
            subprocess.run(
                base[:1] + ["-march=native", "-ffp-contract=off"] + base[1:],
                check=True, capture_output=True, text=True,
            )
        except subprocess.CalledProcessError:
            subprocess.run(base, check=True, capture_output=True, text=True)
    lib = ctypes.CDLL(so)
    i64, f32p = ctypes.c_int64, ctypes.POINTER(ctypes.c_float)
    u8p, i32p = ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32)
    lib.t1_resize_frames.restype = ctypes.c_int
    lib.t1_resize_frames.argtypes = [
        u8p, i64, i64, i64, i64, u8p, i64, i64, i32p, f32p, i64, i32p, f32p, i64,
    ]
    lib.t1_patchify.restype = ctypes.c_int
    lib.t1_patchify.argtypes = [
        f32p, i64, i64, i64, i64, f32p, i64, i64, i64, f32p, f32p,
        ctypes.c_float, ctypes.c_int,
    ]
    _RESIZE_LIB = lib
    return lib


def resize_frames_host(frames: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """(T, H, W, C) uint8 → (T, out_h, out_w, C) uint8 on host, float32
    single-rounding semantics (torchvision antialias=True — the reference's
    resize, vision_process.py:398-403). Runs the native banded kernel
    (native/resize.cpp); falls back to the numpy banded passes when the
    toolchain is unavailable."""
    import ctypes

    T, H, W, C = frames.shape
    if (H, W) == (out_h, out_w):
        return frames
    sh, th = resize_taps(H, out_h)
    sw, tw = resize_taps(W, out_w)
    try:
        lib = _native_lib()
    except Exception:
        x = frames.astype(np.float32)
        x = _resize_axis_host(x, sh, th, axis=1)
        x = _resize_axis_host(x, sw, tw, axis=2)
        return np.clip(np.round(x), 0, 255).astype(np.uint8)
    frames = np.ascontiguousarray(frames)
    out = np.empty((T, out_h, out_w, C), np.uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    rc = lib.t1_resize_frames(
        frames.ctypes.data_as(u8p), T, H, W, C,
        out.ctypes.data_as(u8p), out_h, out_w,
        sh.ctypes.data_as(i32p), th.ctypes.data_as(f32p), th.shape[1],
        sw.ctypes.data_as(i32p), tw.ctypes.data_as(f32p), tw.shape[1],
    )
    assert rc == 0, rc
    return out


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def _resize_device(frames: jnp.ndarray, wh: jnp.ndarray, ww: jnp.ndarray, out_h: int, out_w: int):
    # frames: (T, H, W, C) uint8 → (T, out_h, out_w, C) uint8.
    # precision=HIGHEST: the TPU MXU's default f32 matmul precision is
    # bf16-class — measured ±2 gray-level drift vs torchvision on 22% of
    # pixels at the eval shape. HIGHEST keeps the resize float32-exact
    # (≤1 gray at ~3e-4 rate, round-half ulp ties only).
    x = frames.astype(jnp.float32)
    x = jnp.einsum("oh,thwc->towc", wh, x, precision=jax.lax.Precision.HIGHEST)
    x = jnp.einsum("pw,towc->topc", ww, x, precision=jax.lax.Precision.HIGHEST)
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
