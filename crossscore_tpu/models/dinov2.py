"""DINOv2-style ViT patch encoder, built natively in Flax for TPU.

Architectural parity with HuggingFace ``Dinov2Model`` (the reference loads
``facebook/dinov2-small`` and freezes it, reference ``task/core.py:39-42``):
patch-embed conv (14x14/s14), CLS token, learned position embeddings with
bicubic interpolation for non-native resolutions, pre-LN transformer blocks
with LayerScale, exact-GELU MLP, final LayerNorm.

TPU-first design decisions:
- NHWC image layout; the patch-embed conv is expressed as a reshape + one big
  (B*N, P*P*3) x (P*P*3, D) matmul, which XLA tiles straight onto the MXU
  (no im2col scratch, patches are a free relayout).
- qkv is a single fused (D, 3D) matmul per block.
- LayerNorm/softmax statistics in fp32; matmuls run in the configured compute
  dtype (bf16 in production).
- The whole encoder is a `lax.scan`-free stack of 12 blocks — XLA pipelines
  them; with `remat=True` each block is rematerialised to save HBM when the
  encoder is part of a training graph.

Weight conversion from the HF torch checkpoint lives in
``crossscore_tpu/io/torch_convert.py``.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from crossscore_tpu.ops.interpolate import interpolate_bicubic


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    hidden_size: int = 384
    num_layers: int = 12
    num_heads: int = 6
    mlp_ratio: int = 4
    patch_size: int = 14
    layerscale_init: float = 1.0
    layer_norm_eps: float = 1e-6
    image_size: int = 518  # native pos-emb grid = image_size // patch_size


VIT_PRESETS: dict[str, ViTConfig] = {
    "dinov2-small": ViTConfig(hidden_size=384, num_layers=12, num_heads=6),
    "dinov2-base": ViTConfig(hidden_size=768, num_layers=12, num_heads=12),
    "dinov2-large": ViTConfig(hidden_size=1024, num_layers=24, num_heads=16),
    # tiny preset for CI / smoke runs
    "dinov2-test": ViTConfig(hidden_size=64, num_layers=2, num_heads=4, image_size=56),
}


def _ln(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray, eps: float) -> jnp.ndarray:
    """LayerNorm with fp32 statistics regardless of compute dtype."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


class LayerNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,))
        bias = self.param("bias", nn.initializers.zeros, (dim,))
        return _ln(x, scale, bias, self.eps)


class ViTAttention(nn.Module):
    """Multi-head self-attention with a fused qkv projection.

    ``attention_impl="pallas"`` routes the softmax(QK^T)V core through the
    fused flash kernel (faster than the dense XLA path at 1370 tokens /
    head_dim 64 on v5e, and O(N) memory instead of O(N^2)).
    ``quant="int8"`` puts the projections on the int8 MXU path (frozen
    backbone only, see ops/quant.py)."""

    cfg: ViTConfig
    dtype: Any = jnp.float32
    attention_impl: str = "xla"
    quant: str = "none"

    @nn.compact
    def __call__(self, x, kv_bias=None):
        from crossscore_tpu.ops.quant import make_dense

        d = self.cfg.hidden_size
        h = self.cfg.num_heads
        hd = d // h
        b, n, _ = x.shape

        from crossscore_tpu.ops.flash_attention import pick_qkv_hpack

        qkv = make_dense(self.quant, 3 * d, self.dtype, "qkv")(x)
        hpack = pick_qkv_hpack(h, hd)
        if self.attention_impl == "pallas" and (hpack * hd) % 128 == 0:
            # layout-native kernel: consumes the fused projection output and
            # writes (B, N, D) directly — no head transposes/pads touch HBM.
            # (Mosaic needs 128-lane blocks; tiny presets fall through below.)
            from crossscore_tpu.ops.flash_attention import (
                flash_qkv_self_attention, flash_qkv_self_attention_masked,
            )

            if kv_bias is None:
                out = flash_qkv_self_attention(qkv, h, 0, hpack)
            else:
                out = flash_qkv_self_attention_masked(qkv, kv_bias, h, 0, hpack)
        else:
            qkv = qkv.reshape(b, n, 3, h, hd)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            q = q.transpose(0, 2, 1, 3)  # (B, H, N, hd)
            k = k.transpose(0, 2, 1, 3)
            v = v.transpose(0, 2, 1, 3)
            if self.attention_impl == "pallas":
                from crossscore_tpu.ops.flash_attention import (
                    flash_cross_attention, flash_cross_attention_masked, pick_blocks,
                )

                if kv_bias is None:
                    out = flash_cross_attention(q, k, v, *pick_blocks(n, n))
                elif kv_bias.ndim == 2:
                    # per-item masks need the layout-native kernel; this
                    # head-major branch only serves presets whose head pack
                    # misses the 128-lane block — dense is fine there
                    from crossscore_tpu.ops.attention import dense_attention

                    out = dense_attention(q, k, v, kv_bias=kv_bias)
                else:
                    out = flash_cross_attention_masked(
                        q, k, v, kv_bias, *pick_blocks(n, n)
                    )
            elif self.attention_impl.startswith("tp:"):
                # tensor parallelism: heads sharded over the mesh axis, the
                # kernel shard_map'd per device (GSPMD can't partition it)
                if kv_bias is not None:
                    raise NotImplementedError(
                        "shape-bucketed masking under tp: attention"
                    )
                from crossscore_tpu.ops.flash_attention import tp_flash_cross_attention

                out = tp_flash_cross_attention(q, k, v, self.attention_impl[3:])
            else:
                from crossscore_tpu.ops.attention import dense_attention

                out = dense_attention(q, k, v, kv_bias=kv_bias)
            out = out.transpose(0, 2, 1, 3).reshape(b, n, d)
        return make_dense(self.quant, d, self.dtype, "out")(out)


class _DenseParams(nn.Module):
    """Declares nn.Dense-compatible params (kernel/bias, same initializers)
    without running the matmul — the fused-MLP kernel consumes them raw while
    the param tree (and torch-checkpoint conversion) stays identical."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (in_features, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class _LayerNormParams(nn.Module):
    @nn.compact
    def __call__(self, dim: int):
        scale = self.param("scale", nn.initializers.ones, (dim,))
        bias = self.param("bias", nn.initializers.zeros, (dim,))
        return scale, bias


class ViTBlock(nn.Module):
    cfg: ViTConfig
    dtype: Any = jnp.float32
    attention_impl: str = "xla"
    quant: str = "none"
    mlp_impl: str = "xla"  # xla | fused (one Pallas LN+fc1+gelu+fc2+residual)

    @nn.compact
    def __call__(self, x, kv_bias=None):
        from crossscore_tpu.ops.quant import make_dense

        c = self.cfg
        ls1 = self.param("ls1", nn.initializers.constant(c.layerscale_init), (c.hidden_size,))
        ls2 = self.param("ls2", nn.initializers.constant(c.layerscale_init), (c.hidden_size,))

        y = LayerNorm(c.layer_norm_eps, name="ln1")(x)
        y = ViTAttention(c, self.dtype, self.attention_impl, self.quant, name="attn")(
            y, kv_bias
        )

        x = x + y * ls1.astype(x.dtype)

        if self.mlp_impl.startswith("fused") and self.quant == "none":
            # NOTE: folding the attention LayerScale+residual into the kernel
            # too (fused_res_ln_mlp) measured SLOWER end-to-end — backbone
            # 81.9 -> 82.8 ms, full step 93.6 -> ~98 (PERFORMANCE.md). The
            # separate-residual form lets XLA fuse the residual into the
            # attention out-projection epilogue instead.
            # mlp_impl="fused_exact" keeps the exact erf GELU on bf16 too
            # (default "fused" uses the tanh form there — PERFORMANCE.md).
            from crossscore_tpu.ops.fused_mlp import fused_ln_mlp

            gelu = "exact" if self.mlp_impl == "fused_exact" else "tanh"
            lns, lnb = _LayerNormParams(name="ln2")(c.hidden_size)
            w1, b1 = _DenseParams(c.mlp_ratio * c.hidden_size, name="fc1")(c.hidden_size)
            w2, b2 = _DenseParams(c.hidden_size, name="fc2")(c.mlp_ratio * c.hidden_size)
            return fused_ln_mlp(x, lns, lnb, w1, b1, w2, b2, ls2,
                                c.layer_norm_eps, gelu)

        y = LayerNorm(c.layer_norm_eps, name="ln2")(x)
        y = make_dense(self.quant, c.mlp_ratio * c.hidden_size, self.dtype, "fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = make_dense(self.quant, c.hidden_size, self.dtype, "fc2")(y)
        x = x + y * ls2.astype(x.dtype)
        return x


class Dinov2Encoder(nn.Module):
    """Frozen DINOv2-style backbone: (B, H, W, 3) -> (B, 1+N, D) tokens.

    Output token 0 is CLS (callers typically strip it, mirroring reference
    ``task/core.py:142``).
    """

    cfg: ViTConfig
    dtype: Any = jnp.float32
    remat: bool = False
    attention_impl: str = "xla"
    quant: str = "none"
    mlp_impl: str = "xla"

    @nn.compact
    def __call__(self, images, valid_grid=None) -> jnp.ndarray:
        """``images``: (B, H, W, 3), or a TUPLE of same-(H, W) image batches —
        the batches are patch-embedded separately and concatenated at the
        TOKEN level. The caller's query+references stack then never exists as
        one pixel array: the r3 train trace showed ~3.7 ms/step of pad/concat/
        relayout copies building the (B*(1+K), 518, 518, 3) input (232 MB
        bf16) that a (B*(1+K), 1369, D) token concat (151 MB) avoids.

        ``valid_grid``: traced (gh_v, gw_v) for shape-bucketed inference —
        images are bucket-padded right/bottom; position embeddings are sampled
        for the VALID grid and tokens from padded patches are masked out of
        every self-attention (their residual-stream values stay garbage but
        cannot influence valid tokens). With a tuple input, per-item grids
        follow the concatenated batch order."""
        c = self.cfg
        groups = images if isinstance(images, (tuple, list)) else (images,)
        hgt, wdt = groups[0].shape[1:3]
        p = c.patch_size
        gh, gw = hgt // p, wdt // p
        n = gh * gw
        native = c.image_size // p

        # --- patch embedding as a strided conv ---
        # The round-1 reshape+matmul form looked free but physically RE-TILES
        # on TPU (a profiler trace showed ~4.2 ms/forward of layout
        # copies/reshapes around it at the bench point, PERFORMANCE.md); the
        # strided conv runs the im2col inside the MXU pipeline. Params stay
        # nn.Dense-shaped ((P*P*3, D) kernel) so checkpoints/conversion are
        # unchanged; VALID conv with stride P gives torch's floor semantics
        # for non-multiple sizes (e.g. 518x918 predict images).
        kernel, bias = _DenseParams(c.hidden_size, name="patch_proj")(p * p * 3)
        embeds = []
        for g in groups:
            e = jax.lax.conv_general_dilated(
                g[:, : gh * p, : gw * p].astype(self.dtype),
                kernel.reshape(p, p, 3, c.hidden_size).astype(self.dtype),
                window_strides=(p, p),
                padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            embeds.append(
                (e + bias.astype(self.dtype)).reshape(g.shape[0], n, c.hidden_size)
            )
        x = embeds[0] if len(embeds) == 1 else jnp.concatenate(embeds, axis=0)
        b = x.shape[0]

        # --- CLS + position embeddings ---
        cls_token = self.param(
            "cls_token", nn.initializers.truncated_normal(0.02), (1, 1, c.hidden_size)
        )
        pos_embed = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(0.02),
            (1, 1 + native * native, c.hidden_size),
        )
        if valid_grid is not None and jnp.ndim(valid_grid[0]) == 1:
            # PER-ITEM valid grids (bucket-packed batches mixing shapes):
            # one dynamic interpolation per image, vmapped over the batch
            from crossscore_tpu.ops.interpolate import interpolate_bicubic_dyn

            grid = pos_embed[0, 1:].reshape(native, native, c.hidden_size)
            patch_pos = jax.vmap(
                lambda vh, vw: interpolate_bicubic_dyn(grid, gh, gw, vh, vw)
            )(valid_grid[0], valid_grid[1]).reshape(b, n, c.hidden_size)
        elif valid_grid is not None:
            from crossscore_tpu.ops.interpolate import interpolate_bicubic_dyn

            grid = pos_embed[0, 1:].reshape(native, native, c.hidden_size)
            patch_pos = interpolate_bicubic_dyn(
                grid, gh, gw, valid_grid[0], valid_grid[1]
            ).reshape(1, n, c.hidden_size)
        elif (gh, gw) == (native, native):
            patch_pos = pos_embed[:, 1:]
        else:
            grid = pos_embed[0, 1:].reshape(native, native, c.hidden_size)
            patch_pos = interpolate_bicubic(grid, gh, gw).reshape(1, n, c.hidden_size)
        x = x + patch_pos.astype(self.dtype)
        cls = (cls_token + pos_embed[:, :1]).astype(self.dtype)
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, c.hidden_size)), x], axis=1)

        kv_bias = None
        if valid_grid is not None:
            # -1e30 (not -0.7*fmax): the kernels scale the bias by log2(e),
            # which must not overflow fp32; exp2(-1e30 * log2e) is still 0.
            if jnp.ndim(valid_grid[0]) == 1:  # per-item: (B, 1+N) bias
                rr = jnp.arange(gh)[None, :, None] < valid_grid[0][:, None, None]
                cc = jnp.arange(gw)[None, None, :] < valid_grid[1][:, None, None]
                tok_valid = jnp.concatenate(
                    [jnp.ones((b, 1), bool), (rr & cc).reshape(b, -1)], axis=1
                )  # CLS + patches
            else:
                rr = jnp.arange(gh)[:, None] < valid_grid[0]
                cc = jnp.arange(gw)[None, :] < valid_grid[1]
                tok_valid = jnp.concatenate(
                    [jnp.ones((1,), bool), (rr & cc).reshape(-1)]
                )  # CLS + patches
            kv_bias = jnp.where(tok_valid, 0.0, -1e30).astype(jnp.float32)

        # --- transformer blocks ---
        block_cls = ViTBlock
        if self.remat:
            block_cls = nn.remat(ViTBlock)
        for i in range(c.num_layers):
            x = block_cls(c, self.dtype, self.attention_impl, self.quant,
                          self.mlp_impl, name=f"block_{i}")(x, kv_bias)

        return LayerNorm(c.layer_norm_eps, name="final_ln")(x)
