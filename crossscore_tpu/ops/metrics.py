"""Evaluation metric math (parity with reference ``utils/evaluation/metric.py:5-30``).

All functions accept jnp or np arrays and stay inside jnp so they can be fused
into jitted eval steps.
"""

from __future__ import annotations

import jax.numpy as jnp


def psnr(a, b, return_map: bool = False):
    mse_map = jnp.square(a - b)
    psnr_map = -10.0 * jnp.log10(mse_map)
    return psnr_map if return_map else psnr_map.mean()


def mse2psnr(a):
    return -10.0 * jnp.log10(a)


def abs2psnr(a):
    """PSNR from an L1-style mean-absolute value (pairs with the L1 loss)."""
    return -10.0 * jnp.log10(jnp.square(a))


def psnr2mse(a):
    return jnp.power(10.0, -a / 10.0)


def correlation(a, b):
    """Pearson correlation between two equally-shaped maps (flattened)."""
    x = a.reshape(-1).astype(jnp.float32)
    y = b.reshape(-1).astype(jnp.float32)
    x = x - x.mean()
    y = y - y.mean()
    denom = jnp.sqrt(jnp.sum(x * x) * jnp.sum(y * y))
    return jnp.where(denom == 0, 0.0, jnp.sum(x * y) / denom)


def masked_correlation(a, b, w):
    """Pearson correlation over elements where ``w`` (broadcastable to ``a``)
    is non-zero. With a uniform weight this equals :func:`correlation`; used
    to exclude loader-padded duplicate items from eval metrics (the reference
    evaluates every item exactly once via DistributedSampler/drop-none,
    reference ``task/train.py:111``)."""
    x = a.astype(jnp.float32)
    y = b.astype(jnp.float32)
    w = jnp.broadcast_to(w, x.shape).astype(jnp.float32)
    n = jnp.maximum(jnp.sum(w), 1.0)
    mx = jnp.sum(x * w) / n
    my = jnp.sum(y * w) / n
    xc = (x - mx) * w
    yc = (y - my) * w
    # w is 0/1 so w^2 == w; cross terms carry a single w factor
    denom = jnp.sqrt(jnp.sum(xc * xc) * jnp.sum(yc * yc))
    return jnp.where(denom == 0, 0.0, jnp.sum(xc * (y - my)) / denom)
