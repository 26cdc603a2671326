"""Context-parallel cross-attention: shard the reference-token axis over chips.

The cross-attention memory axis (K*N_patches reference tokens) is the natural
scaling dimension at 2x resolution / K=16 (SURVEY.md §2.5): ~88k tokens per
query set. This op shards that axis over a mesh axis; each chip runs the fused
flash kernel on its local KV shard and the partial results are combined with
the online-softmax correction across chips (pmax + psum over ICI) — the
context-parallel analogue of the in-kernel online softmax
(/opt/skills/guides/boom_attention_tricks.md §15, approach 2).

Communication cost per query position: O(head_dim + 2) floats forward
(partial o, m, l) plus one psum of dq backward — independent of the KV
length, far cheaper than all-gathering KV.

Differentiable: a custom VJP recomputes per-shard score tiles with the GLOBAL
softmax statistics (the flash-backward identity ds = p*(dp - sum(o*do))), so
dk/dv stay local to each shard and only dq is psum-reduced.

Usage (inside shard_map over a mesh with a ``ctx`` axis; pass
``check_vma=False`` to shard_map — pallas_call outputs do not declare
varying-mesh-axes info):

    out = context_parallel_cross_attention(q, k_shard, v_shard, axis_name="ctx")

``q`` is replicated across the ctx axis; ``k_shard``/``v_shard`` are the local
(B, H, Nk_local, hd) shards.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from crossscore_tpu.ops.flash_attention import _flash_fwd, _bwd_xla, pick_blocks


def _local_flash_with_stats(q, k, v):
    """Local flash attention returning (o, l, m) softmax statistics."""
    bq, bk, bh = pick_blocks(q.shape[2], k.shape[2])
    return _flash_fwd(q, k, v, block_q=bq, block_k=bk, block_h=bh)


def _combine(q, k_shard, v_shard, axis_name: str):
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
    o = (o_global / l_safe[..., None]).astype(q.dtype)
    return o, l_safe, m_global


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def context_parallel_cross_attention(q, k_shard, v_shard, axis_name: str):
    """softmax(q k^T / sqrt(hd)) v with the KV axis sharded over ``axis_name``.

    Exact (not approximate): partial per-shard results are renormalised with
    the global max/sum, matching single-device attention up to float addition
    order. Differentiable (dq psum-reduced; dk/dv local).
    """
    o, _, _ = _combine(q, k_shard, v_shard, axis_name)
    return o


def _cp_fwd(q, k_shard, v_shard, axis_name):
    o, l_global, m_global = _combine(q, k_shard, v_shard, axis_name)
    return o, (q, k_shard, v_shard, o, l_global, m_global)


def _cp_bwd(axis_name, residuals, do):
    q, k_shard, v_shard, o, l_global, m_global = residuals
    # Under shard_map(check_vma=False) the output cotangent arrives SPLIT
    # across the ctx shards (it sums to the true cotangent): reassemble it.
    do = jax.lax.psum(do, axis_name=axis_name)
    # flash backward per shard with GLOBAL (l, m): p = exp(s - m_g)/l_g are the
    # true global attention weights restricted to this shard, so dk/dv are
    # exactly the local rows of the full gradients. dq is returned as the
    # per-shard PARTIAL sum — shard_map's transpose for the replicated q input
    # inserts the final psum.
    bq, bk, _ = pick_blocks(q.shape[2], k_shard.shape[2])
    dq_partial, dk, dv = _bwd_xla(
        (q, k_shard, v_shard, o, l_global, m_global), do, block_k=bk
    )
    return dq_partial, dk, dv


context_parallel_cross_attention.defvjp(_cp_fwd, _cp_bwd)
