"""Shared dense attention core (the XLA / non-fused path).

Single implementation used by both the backbone self-attention
(models/dinov2.py) and the cross-reference decoder (models/decoder.py);
softmax statistics always fp32, torch-MHA scaling (q scaled by
1/sqrt(head_dim)). The fused Pallas path lives in ops/flash_attention.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dense_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    kv_bias: jnp.ndarray | None = None,
    return_probs: bool = False,
):
    """(B, H, Nq, hd) x (B, H, Nk, hd) -> (B, H, Nq, hd) dense attention.

    ``kv_bias``: optional additive logits bias over the KV axis — (Nk,)
    shared, or (B, Nk) PER-ITEM (bucket-packed batches mixing shapes), or
    anything already broadcastable to (B, H, Nq, Nk). Used to mask padded
    tokens under shape-bucketed inference (0 valid / -large padded).
    """
    hd = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(hd, jnp.float32))
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if kv_bias is not None:
        if kv_bias.ndim == 2:  # (B, Nk) per-item
            kv_bias = kv_bias[:, None, None, :]
        logits = logits + kv_bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)
    if return_probs:
        return out, probs
    return out
