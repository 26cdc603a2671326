"""CrossScoreNet: the full model as one jittable XLA graph.

Pipeline (behavioural parity with reference ``task/core.py:26-161`` and
``model/cross_reference.py:10-94``):

1. query (B, H, W, 3) + references (B, K, H, W, 3), ImageNet-normalised
2. all B*(1+K) images through the frozen DINOv2 encoder in ONE batched call
   (``stop_gradient`` replicates the reference's ``@torch.no_grad()``,
   ``task/core.py:119``); CLS stripped
3. fixed random multi-view PE added to query and reference tokens
4. 2-layer cross-reference decoder: query tokens self-attend, then
   cross-attend to all K*N reference tokens (fused Pallas flash kernel on TPU)
5. MLP head -> regression activation -> patch_size^2 scores per patch
6. jigsaw reassembly -> (B, H, W) score map

TPU-first: NHWC layout, bf16 compute (fp32 LN/softmax statistics), no Python
control flow that depends on data, static shapes per (H, W, K) bucket.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from crossscore_tpu.models.dinov2 import Dinov2Encoder, ViTConfig, VIT_PRESETS
from crossscore_tpu.models.positional import MultiViewPositionalEmbedding
from crossscore_tpu.models.decoder import CrossReferenceDecoder
from crossscore_tpu.models.regression import regression_activation
from crossscore_tpu.ops.jigsaw import jigsaw_to_image


def _normalize_u8(img: jnp.ndarray) -> jnp.ndarray:
    """Raw uint8 pixels -> ImageNet-normalised float32, on device.

    Mirrors the host normalise (native/fastimage.cpp ``rgb_from_u8`` mode 1)
    op-for-op in float32 — x*(1/255), (x-mean)/std — so a uint8-wire batch
    produces the same activations as the host-normalised float32 form to f32
    rounding. Downstream casts to the compute dtype exactly as before."""
    from crossscore_tpu.io.images import IMAGENET_MEAN, IMAGENET_STD

    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    return (img.astype(jnp.float32) * jnp.float32(1.0 / 255.0) - mean) / std


@dataclasses.dataclass(frozen=True)
class CrossScoreConfig:
    backbone: ViTConfig = VIT_PRESETS["dinov2-small"]
    patch_size: int = 14
    pe_h: int = 40
    pe_w: int = 40
    decoder_layers: int = 2
    decoder_heads: int = 8
    decoder_ffn_ratio: int = 1
    do_self_attn: bool = True
    do_short_cut: bool = True
    do_reference_cross: bool = True
    metric_type: str = "ssim"
    metric_min: int = 0
    metric_max: int = 1
    power_factor: Any = "default"
    compute_dtype: Any = jnp.float32
    attention_impl: str = "xla"  # xla | pallas
    remat_backbone: bool = False
    backbone_quant: str = "none"  # none | int8 (W8A8 on the int8 MXU path)
    mlp_impl: str = "xla"  # xla | fused (Pallas LN+fc1+gelu+fc2+residual)

    @staticmethod
    def from_config(cfg) -> "CrossScoreConfig":
        """Build from a composed YAML Config (crossscore_tpu.confsys)."""
        m = cfg.model
        preset = m.backbone.get("preset", "dinov2-small")
        impl = m.tpu.attention_impl
        if impl == "auto":
            impl = "pallas" if jax.default_backend() not in ("cpu",) else "xla"
        mlp_impl = str(m.tpu.get("mlp_impl", "auto"))
        if mlp_impl == "auto":
            mlp_impl = "fused" if jax.default_backend() not in ("cpu",) else "xla"
        # parity preset (model.tpu.parity=true): the one-flag operating point
        # for the BASELINE MAE<1e-3 check vs CrossScore-v1.0.0.ckpt — fp32
        # compute (the fused kernels keep the exact erf GELU in fp32), no
        # quantization. The default bf16 path's tanh-GELU alone deviates
        # ~1.4e-3 at model level, above that budget (PERFORMANCE.md).
        parity = bool(m.tpu.get("parity", False))
        compute_dtype = jnp.float32 if parity else jnp.dtype(m.tpu.compute_dtype)
        if parity and mlp_impl == "fused":
            mlp_impl = "fused_exact"
        return CrossScoreConfig(
            backbone=VIT_PRESETS[preset],
            patch_size=m.patch_size,
            pe_h=m.pos_enc.multi_view.h,
            pe_w=m.pos_enc.multi_view.w,
            decoder_layers=m.decoder.num_layers,
            decoder_heads=m.decoder.num_heads,
            decoder_ffn_ratio=m.decoder.ffn_ratio,
            do_self_attn=m.decoder_do_self_attn,
            do_short_cut=m.decoder_do_short_cut,
            do_reference_cross=m.do_reference_cross,
            metric_type=m.predict.metric.type,
            metric_min=m.predict.metric.min,
            metric_max=m.predict.metric.max,
            power_factor=m.predict.metric.power_factor,
            compute_dtype=compute_dtype,
            attention_impl=impl,
            remat_backbone=m.tpu.remat_backbone,
            backbone_quant="none" if parity else str(m.tpu.get("backbone_quant", "none")),
            mlp_impl=mlp_impl,
        )


class CrossScoreNet(nn.Module):
    cfg: CrossScoreConfig

    @nn.compact
    def __call__(
        self,
        query_img: jnp.ndarray,
        ref_imgs: Optional[jnp.ndarray],
        need_attn_weights: bool = False,
        need_attn_weights_head_id: int = 0,
        norm_img: bool = False,
        valid_hw=None,
        ref_tokens: Optional[jnp.ndarray] = None,
        ref_grid: Optional[tuple] = None,
        query_tokens: Optional[jnp.ndarray] = None,
        token_grid: Optional[tuple] = None,
    ) -> dict:
        """
        :param query_img: (B, H, W, 3) ImageNet-normalised (or [0,1] raw with
                          ``norm_img=True``, reference task/core.py:76-81)
        :param ref_imgs:  (B, K, H, W, 3) or None
        :param valid_hw: traced (h_valid, w_valid) for shape-bucketed
            inference — the images are bucket-padded right/bottom to the
            static (H, W); attention masks + valid-grid positional embeddings
            make the valid region of the output EXACTLY equal an unpadded run
            at (h_valid, w_valid). One compiled graph serves every shape in
            the bucket (the reference recompiles per aspect ratio,
            ``task/predict.py:69-93``). The returned score map stays
            bucket-sized; callers crop host-side.
        :param ref_tokens: optional precomputed reference backbone tokens
            (B, K, N_patch, D) — the cached-reference serving path: the frozen
            backbone makes reference embeddings deterministic per image, so a
            predict run re-encodes only the query (1 ViT forward per map
            instead of the reference's 1+K, ``task/core.py:119-161``).
            Mutually exclusive with ``ref_imgs``. Produced by
            :func:`encode_backbone_tokens` / ``data/token_cache.py``.
        :param ref_grid: static (gh_r, gw_r) patch grid of the cached
            reference tokens when it DIFFERS from the query's grid (the
            serving daemon's mixed-aspect case: fixed-shape reference set,
            arbitrary query aspect). Defaults to the query grid; only valid
            with ``ref_tokens``. The reference PE is interpolated to each
            view's OWN grid (reference model adds PE per view,
            task/core.py:87-98 — its views always share one shape, so this
            axis never appears there).
        :param query_tokens: optional precomputed QUERY backbone tokens
            (B, N_patch, D) — the decoder-only graph: with ``ref_tokens`` this
            skips the frozen backbone entirely. The token-space training path
            (``train/token_train``) feeds it crops sliced from full-image
            token grids; exactness vs encoding the same tokens in-graph is
            pinned in tests. Requires ``ref_tokens`` + ``token_grid``; pass
            ``query_img=None``.
        :param token_grid: static (gh, gw) patch grid of ``query_tokens``
            (the output score map is (B, gh*patch, gw*patch)).
        :return: dict with ``score_map_ref_cross`` (B, H, W) and optionally
                 ``attn_weights_map_ref_cross`` (B, gh, gw, K, gh, gw)
        """
        c = self.cfg
        if query_tokens is not None:
            if ref_tokens is None or token_grid is None:
                raise ValueError(
                    "query_tokens (the decoder-only graph) requires ref_tokens "
                    "and a static token_grid=(gh, gw)"
                )
            if query_img is not None:
                raise ValueError("pass query_img or query_tokens, not both")
            if norm_img:
                raise ValueError("norm_img is pixel-space; tokens are post-encode")
            if valid_hw is not None:
                raise ValueError(
                    "bucket masking (valid_hw) is pixel-space; token inputs "
                    "must be pre-sliced to their valid grid instead"
                )
            if token_grid[0] * token_grid[1] != query_tokens.shape[1]:
                raise ValueError(
                    f"query_tokens carry {query_tokens.shape[1]} patches but "
                    f"token_grid is {tuple(token_grid)}"
                )
        # wire-compact path (data.dataset.wire_uint8): pixels arrive as raw
        # uint8 and are ImageNet-normalised HERE, on device — the batch ships
        # at 1/4 the float32 bytes (host->device bandwidth is the sustained-
        # training bottleneck through thin links; PERFORMANCE.md r4). The f32
        # math mirrors the host normalise (native/fastimage.cpp rgb_from_u8
        # mode 1): x*(1/255), then (x-mean)/std, all in float32.
        if query_img is not None and query_img.dtype == jnp.uint8:
            if norm_img:
                raise ValueError("norm_img expects [0,1] float pixels, got uint8")
            query_img = _normalize_u8(query_img)
        if ref_imgs is not None and ref_imgs.dtype == jnp.uint8:
            if norm_img:
                raise ValueError("norm_img expects [0,1] float pixels, got uint8")
            ref_imgs = _normalize_u8(ref_imgs)
        if norm_img:
            # DELIBERATE DEVIATION: reference task/core.py:76-81 divides by the
            # ImageNet MEAN for both mean and std (it reuses img_mean for
            # img_std — a reference bug on a path it never exercises, since
            # both stacks always pass norm_img=False). We normalise correctly.
            from crossscore_tpu.io.images import IMAGENET_MEAN, IMAGENET_STD

            mean = jnp.asarray(IMAGENET_MEAN, query_img.dtype)
            std = jnp.asarray(IMAGENET_STD, query_img.dtype)
            query_img = (query_img - mean) / std
            if ref_imgs is not None:
                ref_imgs = (ref_imgs - mean) / std
        if query_tokens is not None:
            b = query_tokens.shape[0]
            hgt, wdt = token_grid[0] * c.patch_size, token_grid[1] * c.patch_size
        else:
            b, hgt, wdt, _ = query_img.shape
        p = c.patch_size
        gh, gw = hgt // p, wdt // p
        n_patch = gh * gw
        d = c.backbone.hidden_size
        dt = c.compute_dtype

        # --- frozen backbone over all (1+K) views in one batched call ---
        if ref_tokens is not None and ref_imgs is not None:
            raise ValueError("pass ref_imgs or ref_tokens, not both")
        if ref_tokens is not None:
            k_ref = ref_tokens.shape[1]
            all_imgs = query_img  # only the query needs encoding
        else:
            k_ref = 0 if ref_imgs is None else ref_imgs.shape[1]
            if ref_imgs is None:
                all_imgs = query_img
            else:
                # GROUPED batching (queries first, then all refs): the encoder
                # patch-embeds each group separately and concatenates TOKENS —
                # the (B*(1+K), H, W, 3) pixel stack never materialises
                # (saves ~3.7 ms/step of pad/relayout at B=24 K=5 518px)
                all_imgs = (query_img, ref_imgs.reshape(b * k_ref, hgt, wdt, 3))

        valid_grid = None
        enc_valid_grid = None
        tok_bias = None
        per_item = False
        if valid_hw is not None:
            per_item = hasattr(valid_hw, "ndim") and valid_hw.ndim == 2
            if per_item:
                # (B, 2) PER-ITEM valid sizes: bucket-packed batches mixing
                # shapes. The encoder sees one grid per VIEW (each item's K
                # refs share the item's shape, data/bucketing.py).
                gh_v = valid_hw[:, 0] // p  # (B,)
                gw_v = valid_hw[:, 1] // p
                valid_grid = (gh_v, gw_v)
                if ref_tokens is not None or k_ref == 0:
                    enc_valid_grid = valid_grid
                else:
                    # grouped encoder order: B queries, then B*K refs (each
                    # item's refs contiguous and sharing the item's shape)
                    enc_valid_grid = (
                        jnp.concatenate([gh_v, jnp.repeat(gh_v, k_ref)]),
                        jnp.concatenate([gw_v, jnp.repeat(gw_v, k_ref)]),
                    )
                rr = jnp.arange(gh)[None, :, None] < gh_v[:, None, None]
                cc = jnp.arange(gw)[None, None, :] < gw_v[:, None, None]
                # -1e30 not -inf/-0.7*fmax: kernels scale biases by log2(e)
                tok_bias = jnp.where(
                    (rr & cc).reshape(b, -1), 0.0, -1e30
                ).astype(jnp.float32)
            else:
                gh_v = valid_hw[0] // p
                gw_v = valid_hw[1] // p
                valid_grid = (gh_v, gw_v)
                enc_valid_grid = valid_grid
                rr = jnp.arange(gh)[:, None] < gh_v
                cc = jnp.arange(gw)[None, :] < gw_v
                tok_bias = jnp.where(
                    (rr & cc).reshape(-1), 0.0, -1e30
                ).astype(jnp.float32)

        # cp:<axis> is decoder-cross-attention-only; the backbone always runs
        # local attention (its views are whole per-chip under view parallelism)
        if query_tokens is not None:
            # decoder-only graph: both sides arrive as frozen-backbone tokens
            # (token-space training / fully-cached serving); the backbone
            # submodule is never constructed, its params stay untouched
            q_tok = jax.lax.stop_gradient(query_tokens.astype(dt))
            r_tok = ref_tokens.astype(dt)
        else:
            backbone_impl = "pallas" if c.attention_impl.startswith("cp:") else c.attention_impl
            tokens = Dinov2Encoder(
                c.backbone,
                dtype=dt,
                remat=c.remat_backbone,
                attention_impl=backbone_impl,
                quant=c.backbone_quant,
                mlp_impl=c.mlp_impl,
                name="backbone",
            )(all_imgs, enc_valid_grid)
            tokens = jax.lax.stop_gradient(tokens[:, 1:])  # strip CLS; frozen backbone
            if ref_tokens is not None:
                q_tok = tokens
                r_tok = ref_tokens.astype(dt)
            else:
                # grouped order: first B rows are the queries, the rest the refs
                q_tok = tokens[:b]
                r_tok = tokens[b:].reshape(b, k_ref, n_patch, d) if k_ref else None

        pos_enc = MultiViewPositionalEmbedding(c.pe_h, c.pe_w, d, dtype=dt, name="pos_enc")

        feat_query = pos_enc(q_tok, 1, gh, gw, valid_grid)

        results: dict = {}
        if c.do_reference_cross and k_ref > 0:
            if ref_grid is not None and ref_tokens is None:
                raise ValueError("ref_grid is only meaningful with ref_tokens")
            n_patch_r = r_tok.shape[2] if ref_tokens is not None else n_patch
            gh_r, gw_r = ref_grid if ref_grid is not None else (gh, gw)
            if gh_r * gw_r != n_patch_r:
                raise ValueError(
                    f"ref_tokens carry {n_patch_r} patches per view but the "
                    f"reference grid is {(gh_r, gw_r)}"
                    + ("" if ref_grid is not None else
                       " (the query's grid — pass ref_grid=(gh_r, gw_r) when "
                       "the cached reference shape differs from the query's)")
                )
            if (gh_r, gw_r) != (gh, gw) and valid_hw is not None:
                raise ValueError(
                    "shape-bucketed serving (valid_hw) requires the query and "
                    "cached-reference grids to match — bucket padding masks "
                    "assume one shared grid per item"
                )
            feat_ref = r_tok.reshape(b, k_ref * n_patch_r, d)
            feat_ref = pos_enc(feat_ref, k_ref, gh_r, gw_r, valid_grid)

            cross_bias = None
            if tok_bias is not None:
                # same mask per view (each item's refs share the item's shape)
                reps = (1, k_ref) if per_item else k_ref
                cross_bias = jnp.tile(tok_bias, reps)

            decoded, mha_weights = CrossReferenceDecoder(
                d_model=d,
                num_heads=c.decoder_heads,
                num_layers=c.decoder_layers,
                ffn_ratio=c.decoder_ffn_ratio,
                do_self_attn=c.do_self_attn,
                do_short_cut=c.do_short_cut,
                dtype=dt,
                attention_impl=c.attention_impl,
                name="decoder",
            )(
                feat_query,
                feat_ref,
                need_weights=need_attn_weights,
                need_weights_head_id=need_attn_weights_head_id,
                self_bias=tok_bias,
                cross_bias=cross_bias,
            )

            # --- head: Linear -> LeakyReLU -> Linear -> regression activation ---
            y = nn.Dense(d, dtype=dt, name="head_fc1")(decoded)
            y = nn.leaky_relu(y)  # default negative_slope 0.01, matches torch
            y = nn.Dense(p * p, dtype=dt, name="head_fc2")(y)
            act = regression_activation(c.metric_type, c.metric_min, c.metric_max, c.power_factor)
            # jigsaw BEFORE the fp32 cast: the reassembly is a pure
            # permutation, so act(jigsaw(y)) == jigsaw(act(y)) exactly, and
            # the physical transpose moves half the bytes in bf16 (the r3
            # train trace showed ~1.2 ms of f32 (24,37,14,37,14) copies)
            score_map = jigsaw_to_image(y.reshape(b, n_patch, p, p), (gh, gw))
            results["score_map_ref_cross"] = act(score_map.astype(jnp.float32))

            if need_attn_weights and mha_weights is not None:
                results["attn_weights_map_ref_cross"] = mha_weights.reshape(
                    b, gh, gw, k_ref, gh_r, gw_r
                )
        return results


def make_backbone_encoder(cfg: CrossScoreConfig):
    """Returns ``encode(params, imgs) -> (B, N_patch, D)`` running ONLY the
    frozen backbone (CLS stripped), with the same impl knobs as the full net —
    the producer side of the cached-reference serving path (the consumer is
    ``CrossScoreNet(..., ref_tokens=...)``). ``params`` is the FULL model
    param tree; the backbone subtree is selected here."""
    backbone_impl = (
        "pallas" if cfg.attention_impl.startswith("cp:") else cfg.attention_impl
    )
    enc = Dinov2Encoder(
        cfg.backbone,
        dtype=cfg.compute_dtype,
        remat=False,
        attention_impl=backbone_impl,
        quant=cfg.backbone_quant,
        mlp_impl=cfg.mlp_impl,
    )

    def encode(params, imgs, valid_hw=None):
        """``valid_hw`` (B, 2): per-image valid pixel extents for BUCKET-PADDED
        inputs (shape-bucketed serving) — tokens of padded patches are masked
        out of the encoder's attention and get no position embedding, so the
        valid tokens equal an unpadded encode exactly (the same guarantee the
        full net gives, models/dinov2.py valid_grid)."""
        if imgs.dtype == jnp.uint8:
            # wire-compact path (data.dataset.wire_uint8): normalise on
            # device, same as the full net's __call__ above
            imgs = _normalize_u8(imgs)
        valid_grid = None
        if valid_hw is not None:
            p = cfg.patch_size
            valid_grid = (valid_hw[:, 0] // p, valid_hw[:, 1] // p)
        tokens = enc.apply({"params": params["backbone"]}, imgs, valid_grid)
        return jax.lax.stop_gradient(tokens[:, 1:])

    return encode


def trainable_mask(params: dict, pe_trainable: bool = False) -> dict:
    """Pytree mask: True for trainable leaves (decoder + head), False for the
    frozen backbone (reference ``task/core.py:41-42,494``). The multi-view PE
    follows ``model.pos_enc.multi_view.req_grad`` (default false in
    ``config/model/model.yaml``; when true the reference trains it, since
    AdamW takes all requires-grad params)."""

    def mark(path_prefix: str, tree):
        if isinstance(tree, dict):
            return {k: mark(f"{path_prefix}/{k}", v) for k, v in tree.items()}
        if path_prefix.startswith("/backbone"):
            return False
        if path_prefix.startswith("/pos_enc"):
            return pe_trainable
        return True

    return mark("", params)
