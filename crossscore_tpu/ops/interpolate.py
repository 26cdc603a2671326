"""2D interpolation ops with torch-compatible coordinate semantics.

Three flavours are needed for behavioural parity with the reference:

1. ``interpolate_bilinear_align_corners`` — the multi-view positional encoding
   is resized with ``F.interpolate(mode=bilinear, align_corners=True)``
   (reference ``model/positional_encoding.py:61-69``). With align_corners=True
   the reference's ``+1e-4`` scale-factor epsilon only affects the *output size*
   computation, not the sampling grid, so taking the output size directly is
   exactly equivalent.
2. ``interpolate_bicubic`` — HF DINOv2 interpolates its patch position
   embeddings with bicubic/align_corners=False when the input resolution
   differs from the pretraining 518px.
3. ``resize_bilinear_antialias`` — torchvision ``T.Resize(antialias=True)``
   used by the host input pipeline; implemented with ``jax.image.resize``
   (equivalent triangle-filter antialiasing) and also exposed for numpy use.

All ops are separable gathers/matmuls with static shapes: XLA maps them to MXU
matmuls (weight matrices are tiny) or VPU gathers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnums=(1, 2))
def interpolate_bilinear_align_corners(
    src: jnp.ndarray, out_h: int, out_w: int
) -> jnp.ndarray:
    """Bilinear resize of (H, W, C) with torch ``align_corners=True`` semantics.

    src coordinate for output index i: ``i * (in-1)/(out-1)`` (0 when out==1).
    """
    in_h, in_w, _ = src.shape

    def axis_weights(in_size: int, out_size: int):
        if out_size == 1:
            coords = np.zeros((1,), dtype=np.float64)
        else:
            coords = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
        lo = np.clip(np.floor(coords).astype(np.int64), 0, in_size - 1)
        hi = np.clip(lo + 1, 0, in_size - 1)
        frac = (coords - lo).astype(np.float32)
        return lo, hi, jnp.asarray(frac)

    lo_h, hi_h, fh = axis_weights(in_h, out_h)
    lo_w, hi_w, fw = axis_weights(in_w, out_w)

    top = src[lo_h]  # (out_h, in_w, C)
    bot = src[hi_h]
    rows = top + (bot - top) * fh[:, None, None]
    left = rows[:, lo_w]  # (out_h, out_w, C)
    right = rows[:, hi_w]
    return left + (right - left) * fw[None, :, None]


def _cubic_kernel(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """torch/PIL cubic convolution kernel (Keys, a=-0.75 matches torch)."""
    t = np.abs(t)
    out = np.where(
        t <= 1,
        (a + 2) * t**3 - (a + 3) * t**2 + 1,
        np.where(t < 2, a * t**3 - 5 * a * t**2 + 8 * a * t - 4 * a, 0.0),
    )
    return out


def _bicubic_axis_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) interpolation matrix, align_corners=False."""
    scale = in_size / out_size
    coords = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
    base = np.floor(coords).astype(np.int64)
    mat = np.zeros((out_size, in_size), dtype=np.float32)
    for tap in range(-1, 3):
        idx = np.clip(base + tap, 0, in_size - 1)
        w = _cubic_kernel(coords - (base + tap))
        np.add.at(mat, (np.arange(out_size), idx), w.astype(np.float32))
    return mat


@functools.partial(jax.jit, static_argnums=(1, 2))
def interpolate_bicubic(src: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bicubic resize of (H, W, C), torch align_corners=False, no antialias."""
    in_h, in_w, _ = src.shape
    mh = jnp.asarray(_bicubic_axis_matrix(in_h, out_h))
    mw = jnp.asarray(_bicubic_axis_matrix(in_w, out_w))
    # NOTE: the environment's default matmul precision is reduced (bf16-style);
    # interpolation weights are parity-critical, so force full fp32.
    out = jnp.einsum("oi,iwc->owc", mh, src.astype(jnp.float32), precision="highest")
    out = jnp.einsum("pw,owc->opc", mw, out, precision="highest")
    return out.astype(src.dtype)


def interpolate_bilinear_align_corners_dyn(
    src: jnp.ndarray, out_h: int, out_w: int, valid_h, valid_w
) -> jnp.ndarray:
    """Traced-target-size variant for shape-bucketed inference.

    Returns a STATIC (out_h, out_w, C) array whose ``[:valid_h, :valid_w]``
    region equals ``interpolate_bilinear_align_corners(src, valid_h, valid_w)``
    — valid_* are TRACED ints, so one compiled graph serves every valid size
    within a bucket. Rows/cols beyond the valid region hold clamped-edge
    samples and must be masked downstream.
    """
    in_h, in_w, _ = src.shape

    def coords(in_size: int, out_size: int, valid):
        i = jnp.arange(out_size, dtype=jnp.float32)
        denom = jnp.maximum(valid - 1, 1).astype(jnp.float32)
        c = jnp.where(valid == 1, 0.0, i * (in_size - 1) / denom)
        lo = jnp.clip(jnp.floor(c).astype(jnp.int32), 0, in_size - 1)
        hi = jnp.clip(lo + 1, 0, in_size - 1)
        return lo, hi, c - lo.astype(jnp.float32)

    lo_h, hi_h, fh = coords(in_h, out_h, valid_h)
    lo_w, hi_w, fw = coords(in_w, out_w, valid_w)
    top = jnp.take(src, lo_h, axis=0)
    bot = jnp.take(src, hi_h, axis=0)
    rows = top + (bot - top) * fh[:, None, None]
    left = jnp.take(rows, lo_w, axis=1)
    right = jnp.take(rows, hi_w, axis=1)
    return left + (right - left) * fw[None, :, None]


def _cubic_kernel_jnp(t, a: float = -0.75):
    t = jnp.abs(t)
    return jnp.where(
        t <= 1,
        (a + 2) * t**3 - (a + 3) * t**2 + 1,
        jnp.where(t < 2, a * t**3 - 5 * a * t**2 + 8 * a * t - 4 * a, 0.0),
    )


def interpolate_bicubic_dyn(
    src: jnp.ndarray, out_h: int, out_w: int, valid_h, valid_w
) -> jnp.ndarray:
    """Traced-target-size bicubic (align_corners=False): static (out_h, out_w)
    output whose ``[:valid_h, :valid_w]`` equals
    ``interpolate_bicubic(src, valid_h, valid_w)``. The clipped-edge taps of
    the static matrix construction are reproduced by clipped gathers (clip +
    add is commutative over the 4 taps)."""
    in_h, in_w, _ = src.shape

    def axis_apply(x, axis: int, in_size: int, out_size: int, valid):
        scale = in_size / valid.astype(jnp.float32)
        c = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale - 0.5
        base = jnp.floor(c)
        acc = None
        for tap in range(-1, 3):
            idx = jnp.clip((base + tap).astype(jnp.int32), 0, in_size - 1)
            w = _cubic_kernel_jnp(c - (base + tap))
            wx = jnp.take(x, idx, axis=axis).astype(jnp.float32)
            shape = [1, 1, 1]
            shape[axis] = out_size
            term = wx * w.reshape(shape)
            acc = term if acc is None else acc + term
        return acc

    out = axis_apply(src, 0, in_h, out_h, valid_h)
    out = axis_apply(out, 1, in_w, out_w, valid_w)
    return out.astype(src.dtype)


def resize_bilinear_antialias(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Antialiased bilinear resize for host-side numpy images (H, W, C) or (H, W).

    Matches torchvision ``Resize(..., antialias=True)`` semantics (triangle
    filter scaled by the downsampling factor). Used by the input pipeline.
    """
    squeeze = img.ndim == 2
    if squeeze:
        img = img[:, :, None]
    in_h, in_w, _ = img.shape

    def axis_matrix(in_size: int, out_size: int) -> np.ndarray:
        scale = in_size / out_size
        support = max(scale, 1.0)
        coords = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
        lo = np.floor(coords - support).astype(np.int64)
        taps = int(np.ceil(2 * support)) + 2
        mat = np.zeros((out_size, in_size), dtype=np.float64)
        for tap in range(taps):
            idx = lo + tap
            w = np.maximum(0.0, 1.0 - np.abs((coords - idx) / support))
            # torch drops out-of-range taps (no edge clamping) and renormalises
            valid = (idx >= 0) & (idx < in_size)
            rows = np.arange(out_size)[valid]
            np.add.at(mat, (rows, idx[valid]), w[valid])
        mat /= mat.sum(axis=1, keepdims=True)
        return mat.astype(np.float32)

    mh = axis_matrix(in_h, out_h)
    mw = axis_matrix(in_w, out_w)
    out = np.einsum("oi,iwc->owc", mh, img.astype(np.float32))
    out = np.einsum("pw,owc->opc", mw, out)
    if squeeze:
        out = out[:, :, 0]
    return out
