"""Context-parallel cross-attention: shard the reference-token axis over chips.

The cross-attention memory axis (K*N_patches reference tokens) is the natural
scaling dimension at 2x resolution / K=16 (SURVEY.md §2.5): ~88k tokens per
query set. This op shards that axis over a mesh axis; each chip runs the fused
flash kernel on its local KV shard and the partial results are combined with
the online-softmax correction across chips (pmax + psum over ICI) — the
context-parallel analogue of the in-kernel online softmax
(/opt/skills/guides/boom_attention_tricks.md §15, approach 2).

Communication cost per query position: O(head_dim + 2) floats (partial o, m,
l), independent of the KV length — far cheaper than all-gathering KV.

Usage (inside shard_map over a mesh with a ``ctx`` axis; pass ``check_vma=False``
to shard_map -- pallas_call outputs do not declare varying-mesh-axes info):

    out = context_parallel_cross_attention(q, k_shard, v_shard, axis_name="ctx")

``q`` is replicated across the ctx axis; ``k_shard``/``v_shard`` are the local
(B, H, Nk_local, hd) shards.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from crossscore_tpu.ops.flash_attention import _flash_fwd, pick_blocks


def _local_flash_with_stats(q, k, v):
    """Local flash attention returning (o, l, m) softmax statistics."""
    bq, bk = pick_blocks(q.shape[2], k.shape[2])
    return _flash_fwd(q, k, v, block_q=bq, block_k=bk)


def context_parallel_cross_attention(q, k_shard, v_shard, axis_name: str):
    """softmax(q k^T / sqrt(hd)) v with the KV axis sharded over ``axis_name``.

    Exact (not approximate): partial per-shard results are renormalised with
    the global max/sum, matching single-device attention bit-for-bit up to
    float addition order.
    """
    o_local, l_local, m_local = _local_flash_with_stats(q, k_shard, v_shard)
    # o_local rows are normalised by the LOCAL l; undo to get raw weighted sums
    o_raw = o_local.astype(jnp.float32) * l_local[..., None]

    m_global = jax.lax.pmax(m_local, axis_name=axis_name)
    alpha = jnp.exp(m_local - m_global)  # (B, H, Nq)
    l_corr = l_local * alpha
    o_corr = o_raw * alpha[..., None]

    l_global = jax.lax.psum(l_corr, axis_name=axis_name)
    o_global = jax.lax.psum(o_corr, axis_name=axis_name)
    l_safe = jnp.where(l_global == 0.0, 1.0, l_global)
    return (o_global / l_safe[..., None]).astype(q.dtype)
