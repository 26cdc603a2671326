"""Jigsaw (patch grid <-> image) reshapes.

The regression head emits ``patch_size**2`` pixel scores per ViT patch; the
jigsaw reassembly lays those per-patch tiles back out as a full-resolution
image (behavioural parity with reference ``utils/misc/image.py:8-21``).

Pure reshape/transpose: XLA lowers this to a free layout change fused into the
surrounding graph — no data movement kernel on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp


def jigsaw_to_image(x: jnp.ndarray, grid_size: tuple[int, int]) -> jnp.ndarray:
    """(B, N_patch, P_h, P_w) -> (B, N_patch_h*P_h, N_patch_w*P_w).

    ``grid_size = (N_patch_h, N_patch_w)`` with ``N_patch = N_patch_h * N_patch_w``.
    """
    b, num_patches, ph, pw = x.shape
    gh, gw = grid_size
    if num_patches != gh * gw:
        raise ValueError(f"num_patches {num_patches} != grid {gh}x{gw}")
    x = x.reshape(b, gh, gw, ph, pw)
    x = x.transpose(0, 1, 3, 2, 4)  # (B, gh, ph, gw, pw)
    return x.reshape(b, gh * ph, gw * pw)


def image_to_jigsaw(img: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """(B, H, W) -> (B, N_patch, P, P); exact inverse of :func:`jigsaw_to_image`."""
    b, h, w = img.shape
    p = patch_size
    if h % p or w % p:
        raise ValueError(f"image {h}x{w} not divisible by patch {p}")
    gh, gw = h // p, w // p
    x = img.reshape(b, gh, p, gw, p)
    x = x.transpose(0, 1, 3, 2, 4)  # (B, gh, gw, P, P)
    return x.reshape(b, gh * gw, p, p)
