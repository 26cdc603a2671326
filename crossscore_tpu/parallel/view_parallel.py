"""Reference-view parallelism: shard the K cross-reference views over chips.

The TPU-native scaling strategy for the high-K / high-resolution operating
points (BASELINE.json config 5, SURVEY.md §2.5): the frozen backbone is
*embarrassingly parallel* over views, so each chip encodes the query plus its
local K/n reference views, and the decoder's cross-attention combines the
sharded reference-token axis EXACTLY via the context-parallel softmax
(ops/context_parallel.py, pmax/psum over ICI). Per-chip work drops by ~K/n
for the backbone (the dominant FLOPs) with only O(head_dim) communication per
query token per decoder layer.

The model itself stays unchanged — ``attention_impl="cp:<axis>"`` switches the
decoder cross-attention to the context-parallel op; this module provides the
shard_map orchestration.

Usage::

    mesh = make_mesh(model_parallel=1)           # 1-D data mesh reused as ctx
    fn = make_view_parallel_apply(model, mesh)   # model built with cp impl
    out = fn(params, query, refs)                # refs (B, K, H, W, 3), K % n == 0
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, PartitionSpec as P


def make_view_parallel_apply(
    model,
    mesh: Mesh,
    axis_name: Optional[str] = None,
    need_attn_weights: bool = False,
):
    """Returns fn(params, query (B,H,W,3), refs (B,K,H,W,3)) -> score maps,
    with refs sharded over ``axis_name`` (defaults to the mesh's first axis).

    The model must be constructed with ``attention_impl=f"cp:{axis_name}"``.
    """
    axis_name = axis_name or mesh.axis_names[0]
    impl = model.cfg.attention_impl
    # the axis NAME must match too — a 'cp:view' model on a ('data',) mesh
    # would otherwise pass this guard and die deep in tracing with an
    # unbound-axis-name error from the softmax-combine collectives
    if not impl.startswith("cp:") or impl.split(":", 1)[1] != axis_name:
        raise ValueError(
            f"model.attention_impl must be 'cp:{axis_name}', got {impl!r}"
        )
    if need_attn_weights:
        raise NotImplementedError("attention-weight extraction is a single-device debug path")

    def body(params, query, refs_local):
        out = model.apply({"params": params}, query, refs_local)
        return out["score_map_ref_cross"]

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(), P(None, axis_name)),
        out_specs=P(),
        check_vma=False,  # pallas_call outputs don't declare vma
    )


def make_view_parallel_apply_tokens(
    model,
    mesh: Mesh,
    axis_name: Optional[str] = None,
):
    """Token-consuming twin of :func:`make_view_parallel_apply` — the
    cache x view-parallel serving composition: precomputed reference tokens
    (B, K, N, D) are sharded over the view axis and the decoder combines them
    via the same context-parallel softmax; only the query is encoded (on
    every chip — its cost is 1/K of the uncached VP step's per-chip work)."""
    axis_name = axis_name or mesh.axis_names[0]
    impl = model.cfg.attention_impl
    if not impl.startswith("cp:") or impl.split(":", 1)[1] != axis_name:
        raise ValueError(
            f"model.attention_impl must be 'cp:{axis_name}', got {impl!r}"
        )

    def body(params, query, tokens_local):
        out = model.apply({"params": params}, query, None, ref_tokens=tokens_local)
        return out["score_map_ref_cross"]

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(), P(None, axis_name)),
        out_specs=P(),
        check_vma=False,
    )
