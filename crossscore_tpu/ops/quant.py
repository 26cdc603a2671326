"""Dynamic int8 quantized matmul for the frozen backbone.

The reference runs the (frozen) DINOv2 backbone in fp16 AMP (reference
``task/core.py:39-42,119-161``, ``config/default.yaml:22``); its matmuls
dominate the per-map FLOPs (9 ViT forwards per score map). On v5e the int8
MXU path has 2x the bf16 peak (~394 vs ~197 TOP/s), and a frozen backbone is
the ideal quantization target: weights never change, and activations are
LayerNorm-bounded.

Scheme (standard W8A8 dynamic):
- weights: symmetric per-output-channel scales (absmax/127). The backbone is
  frozen, so XLA constant-folds the weight quantization after the first step.
- activations: symmetric per-row (per-token) scales computed on the fly —
  one absmax reduce over the feature axis; robust to outlier tokens without
  calibration data.
- matmul: int8 x int8 -> int32 on the MXU, dequantised by the rank-1 outer
  product of the two scale vectors, fused by XLA into the epilogue.

Used in the backbone only (``model.tpu.backbone_quant=int8``); the trainable
decoder/head stay bf16. Accuracy is pinned by tests/test_quant.py and an
int8 tolerance tier in the e2e suite.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

_EPS = 1e-8


def quantize_rowwise(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(..., K) -> int8 values and (..., 1) fp32 scales (symmetric absmax)."""
    ax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    s = jnp.maximum(ax, _EPS) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    return q, s


def quantize_colwise(w: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(K, N) -> int8 values and (1, N) fp32 per-output-channel scales."""
    aw = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0, keepdims=True)
    s = jnp.maximum(aw, _EPS) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    return q, s


def int8_matmul(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """x (..., K) @ w (K, N) via int8 MXU; returns x.dtype."""
    xq, sx = quantize_rowwise(x)
    wq, sw = quantize_colwise(w)
    y = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return (y.astype(jnp.float32) * sx * sw).astype(x.dtype)


class QuantDense(nn.Module):
    """Drop-in ``nn.Dense`` with the int8 compute path.

    Same parameter names/shapes as ``nn.Dense`` (kernel (K, N), bias (N,)),
    so checkpoint conversion and the param tree are unchanged — quantization
    is purely an execution-time choice.
    """

    features: int
    dtype: Any = jnp.float32
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (x.shape[-1], self.features)
        )
        y = int8_matmul(x.astype(self.dtype), kernel)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(y.dtype)
        return y


def make_dense(quant: str, features: int, dtype: Any, name: str):
    """Backbone Dense factory: bf16 (``none``) or int8 W8A8 (``int8``)."""
    if quant == "int8":
        return QuantDense(features, dtype=dtype, name=name)
    if quant in ("none", None, False):
        return nn.Dense(features, dtype=dtype, name=name)
    raise ValueError(f"unknown backbone_quant {quant!r} (expected none|int8)")
