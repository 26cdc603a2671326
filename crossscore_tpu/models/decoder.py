"""Cross-reference transformer decoder.

Behavioural parity with the reference's customised fork of torch's
``TransformerDecoder`` (reference ``model/customised_transformer/transformer.py:20-268``):

- post-norm layers (norm_first=False): ``x = norm1(x + sa(x))``,
  ``x = norm2(x + mha(x, mem))``, ``x = norm3(x + ff(x))``
- optional self-attention (``do_self_attn``) and residual (``do_short_cut``) flags
- ReLU feed-forward with ``dim_feedforward == hidden`` (reference
  ``model/cross_reference.py:28-39``), dropout 0
- optionally returns the LAST layer's per-head cross-attention weights for ONE
  selected head (reference ``transformer.py:175-178``) — debug-only, unfused path.

TPU-first design:
- attention runs through a pluggable impl: ``"xla"`` (dense einsum, fp32
  softmax — XLA fuses it) or ``"pallas"`` (fused flash kernel streaming the
  K*N_patches reference axis with online softmax, crossscore_tpu/ops/flash_attention.py).
- q/k/v projections are separate Dense layers whose torch equivalent is the
  packed ``in_proj_weight`` (split 3-ways on conversion).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from crossscore_tpu.models.dinov2 import LayerNorm
from crossscore_tpu.ops.attention import dense_attention  # noqa: F401 (re-export)


class HeadProj(nn.Module):
    """Linear projection producing HEAD-MAJOR output (B, H, N, hd) directly.

    Parameter-compatible with ``nn.Dense`` (kernel (D_in, D), bias (D,)) so
    torch-checkpoint conversion is unchanged; the head split/transpose is
    expressed INSIDE the projection einsum, which XLA emits as one matmul
    with the target layout instead of matmul + relayout copies (the decoder's
    k/v operate on B*K*N ~ 88k tokens — the copies were measurable)."""

    features: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = self.num_heads
        hd = self.features // h
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (x.shape[-1], self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        k3 = kernel.reshape(x.shape[-1], h, hd).astype(self.dtype)
        y = jnp.einsum("bnd,dhf->bhnf", x.astype(self.dtype), k3)
        return y + bias.reshape(h, 1, hd).astype(self.dtype)


class HeadOutProj(nn.Module):
    """Out-projection consuming head-major (B, H, N, hd) -> (B, N, D);
    param-compatible with ``nn.Dense`` (kernel (D, D), bias (D,))."""

    features: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = self.num_heads
        hd = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (h * hd, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        k3 = kernel.reshape(h, hd, self.features).astype(self.dtype)
        y = jnp.einsum("bhnf,hfd->bnd", x.astype(self.dtype), k3)
        return y + bias.astype(self.dtype)


class HeadLaneProj(nn.Module):
    """Projection emitting TOKEN-MAJOR lane-packed heads (B, N, H*hd_pad):
    each head's hd columns are zero-padded to ``hd_pad`` so ``128 // hd_pad``
    heads fill one 128-lane block — the layout the layout-native cross kernel
    consumes with zero relayouts. Zero pad lanes are exact (QK adds 0, PV
    emits 0). ``prescale`` multiplies kernel+bias in fp32 — used to fold the
    true softmax scale into q when the kernel divides by sqrt(hd_pad).
    Parameter-compatible with ``nn.Dense`` (kernel (D_in, features))."""

    features: int  # H * true head dim
    num_heads: int
    hd_pad: int
    dtype: Any = jnp.float32
    prescale: float = 1.0

    @nn.compact
    def __call__(self, x):
        h = self.num_heads
        hd = self.features // h
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (x.shape[-1], self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        pad = self.hd_pad - hd
        k3 = (kernel.astype(jnp.float32) * self.prescale).reshape(x.shape[-1], h, hd)
        k3 = jnp.pad(k3, ((0, 0), (0, 0), (0, pad)))
        b2 = jnp.pad((bias.astype(jnp.float32) * self.prescale).reshape(h, hd),
                     ((0, 0), (0, pad)))
        y = jax.lax.dot_general(
            x.astype(self.dtype),
            k3.reshape(x.shape[-1], h * self.hd_pad).astype(self.dtype),
            (((x.ndim - 1,), (0,)), ((), ())),
        )
        return y + b2.reshape(-1).astype(self.dtype)


class HeadLaneOutProj(nn.Module):
    """Out-projection consuming lane-packed (B, N, H*hd_pad) -> (B, N, D);
    padded rows of the kernel are zero so pad lanes contribute nothing.
    Parameter-compatible with ``nn.Dense`` (kernel (H*hd, D))."""

    features: int
    num_heads: int
    head_dim: int  # true head dim
    hd_pad: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h, hd = self.num_heads, self.head_dim
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (h * hd, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        k3 = kernel.reshape(h, hd, self.features)
        k3 = jnp.pad(k3, ((0, 0), (0, self.hd_pad - hd), (0, 0)))
        y = jax.lax.dot_general(
            x.astype(self.dtype),
            k3.reshape(h * self.hd_pad, self.features).astype(self.dtype),
            (((x.ndim - 1,), (0,)), ((), ())),
        )
        return y + bias.astype(self.dtype)


class TorchStyleMHA(nn.Module):
    """torch.nn.MultiheadAttention-equivalent (batch_first, same q/k/v dims)."""

    d_model: int
    num_heads: int
    dtype: Any = jnp.float32
    attention_impl: str = "xla"  # xla | pallas

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,
        key: jnp.ndarray,
        value: jnp.ndarray,
        need_weights: bool = False,
        kv_bias=None,
        kv_valid: int = 0,
    ):
        b, nq, _ = query.shape
        nk = key.shape[1]
        h = self.num_heads
        hd = self.d_model // h

        # layout-native path (default pallas route): token-major lane-packed
        # projections + the cross kernel — no head-major relayouts touch HBM,
        # and hd is zero-padded to a 128-divisor (48 -> 64 for CrossScore's
        # decoder) so two heads fill each lane block. Measured vs the
        # head-major kernel in PERFORMANCE.md.
        hd_pad = next((p for p in (64, 128) if hd <= p), None)
        use_ln = (
            self.attention_impl == "pallas"
            and not need_weights
            and hd_pad is not None
            and h % (128 // hd_pad) == 0
        )
        if kv_valid > 0 and not use_ln:
            # pre-padded KV rows are only masked by the layout-native kernels;
            # any other path would attend over them
            raise ValueError("kv_valid requires the layout-native pallas path")
        if use_ln:
            from crossscore_tpu.ops.flash_attention import (
                flash_cross_attention_ln, flash_cross_attention_ln_masked,
                pick_cross_ln_blocks, pick_cross_ln_prepad,
            )

            # kernel divides by sqrt(hd_pad); fold the true-scale correction
            # into the q projection (fp32, exact)
            prescale = (hd_pad ** 0.5) / (hd ** 0.5)
            qp = HeadLaneProj(self.d_model, h, hd_pad, dtype=self.dtype,
                              prescale=prescale, name="q_proj")(query)
            kp = HeadLaneProj(self.d_model, h, hd_pad, dtype=self.dtype,
                              name="k_proj")(key)
            vp = HeadLaneProj(self.d_model, h, hd_pad, dtype=self.dtype,
                              name="v_proj")(value)
            if kv_valid > 0:
                # key/value arrive PRE-padded to a block multiple (decoder
                # memory padded once for the whole stack); the kernels mask
                # rows past kv_valid and skip their own pad/slice
                bq, bk, _ = pick_cross_ln_prepad(nq, kv_valid)
            else:
                bq, bk = pick_cross_ln_blocks(nq, nk)
            # hd_true=hd would contract only the 48 true lanes of the 64-pad
            # packing (exact — pad lanes are zero). Measured SLOWER on the
            # real kernel (19.38 vs 18.39 ms/layer at the production bwd
            # config, tools/bwd_microbench.py r4): the MXU charges sub-128
            # contractions the same at depth 48 as 64, and the narrow strided
            # slices add overhead — so the default stays full-width.
            # The mechanism is kept (exactness pinned in
            # test_hd_true_matches_padded_path) for future geometries where
            # the pad fraction is larger.
            hd_true = 0
            if kv_bias is not None:
                o = flash_cross_attention_ln_masked(qp, kp, vp, kv_bias, h,
                                                    hd_pad, bq, bk, hd_true)
            else:
                o = flash_cross_attention_ln(qp, kp, vp, h, hd_pad, bq, bk,
                                             kv_valid, hd_true)
            out = HeadLaneOutProj(self.d_model, h, hd, hd_pad,
                                  dtype=self.dtype, name="out_proj")(o)
            return out, None

        q = HeadProj(self.d_model, h, dtype=self.dtype, name="q_proj")(query)
        k = HeadProj(self.d_model, h, dtype=self.dtype, name="k_proj")(key)
        v = HeadProj(self.d_model, h, dtype=self.dtype, name="v_proj")(value)

        probs = None
        if need_weights:
            out, probs = dense_attention(q, k, v, kv_bias=kv_bias, return_probs=True)
        elif kv_bias is not None:
            # shape-bucketed inference: padded tokens masked via additive bias
            if self.attention_impl == "pallas" and kv_bias.ndim == 1:
                from crossscore_tpu.ops.flash_attention import (
                    flash_cross_attention_masked, pick_blocks,
                )

                out = flash_cross_attention_masked(q, k, v, kv_bias, *pick_blocks(nq, nk))
            else:
                # per-item (B, Nk) masks are served by the layout-native path
                # above; reaching here means an exotic head config — dense
                out = dense_attention(q, k, v, kv_bias=kv_bias)
        elif self.attention_impl.startswith("cp:"):
            # context parallel: k/v are the LOCAL shard of the reference axis;
            # exact global softmax via pmax/psum over the named mesh axis
            # (must run under shard_map — see parallel/view_parallel.py)
            from crossscore_tpu.ops.context_parallel import context_parallel_cross_attention

            out = context_parallel_cross_attention(
                q, k, v, axis_name=self.attention_impl.split(":", 1)[1]
            )
        elif self.attention_impl == "pallas":
            from crossscore_tpu.ops.flash_attention import flash_cross_attention, pick_blocks

            out = flash_cross_attention(q, k, v, *pick_blocks(nq, nk))
        elif self.attention_impl.startswith("tp:"):
            # tensor parallelism: heads sharded over the mesh axis, the flash
            # kernel shard_map'd per device (GSPMD can't partition pallas_call)
            from crossscore_tpu.ops.flash_attention import tp_flash_cross_attention

            out = tp_flash_cross_attention(q, k, v, self.attention_impl[3:])
        else:
            out = dense_attention(q, k, v)

        out = HeadOutProj(self.d_model, h, dtype=self.dtype, name="out_proj")(out)
        return out, probs  # probs: (B, H, Nq, Nk) or None


class DecoderLayer(nn.Module):
    d_model: int
    num_heads: int
    dim_feedforward: int
    do_self_attn: bool = True
    do_short_cut: bool = True
    dtype: Any = jnp.float32
    attention_impl: str = "xla"
    layer_norm_eps: float = 1e-5  # torch default

    @nn.compact
    def __call__(self, x, memory, need_weights: bool = False,
                 self_bias=None, cross_bias=None, memory_valid: int = 0):
        mha_weights = None

        # cp:<axis> only applies to the cross-attention (the reference-token
        # axis is the sharded one); query self-attention stays local
        local_impl = "xla" if self.attention_impl.startswith("cp:") else self.attention_impl

        if self.do_self_attn:
            sa_out, _ = TorchStyleMHA(
                self.d_model, self.num_heads, self.dtype, local_impl, name="self_attn"
            )(x, x, x, need_weights=False, kv_bias=self_bias)
            x = x + sa_out if self.do_short_cut else sa_out
            x = LayerNorm(self.layer_norm_eps, name="norm1")(x)

        mha_out, mha_weights = TorchStyleMHA(
            self.d_model, self.num_heads, self.dtype, self.attention_impl, name="cross_attn"
        )(x, memory, memory, need_weights=need_weights, kv_bias=cross_bias,
          kv_valid=memory_valid)
        x = x + mha_out if self.do_short_cut else mha_out
        x = LayerNorm(self.layer_norm_eps, name="norm2")(x)

        y = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(x)
        y = nn.relu(y)
        y = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(y)
        x = LayerNorm(self.layer_norm_eps, name="norm3")(x + y)
        return x, mha_weights


class CrossReferenceDecoder(nn.Module):
    """Stack of decoder layers; returns last layer's selected-head weights."""

    d_model: int
    num_heads: int = 8
    num_layers: int = 2
    ffn_ratio: int = 1
    do_self_attn: bool = True
    do_short_cut: bool = True
    dtype: Any = jnp.float32
    attention_impl: str = "xla"

    @nn.compact
    def __call__(
        self,
        tgt: jnp.ndarray,
        memory: jnp.ndarray,
        need_weights: bool = False,
        need_weights_head_id: int = 0,
        self_bias=None,
        cross_bias=None,
    ):
        x = tgt
        mha_weights: Optional[jnp.ndarray] = None

        # Pre-pad the (shared) memory ONCE to a cross-kernel block multiple:
        # each layer's k/v projections then emit already-block-shaped tensors
        # and the fwd/bwd kernels mask rows past memory_valid instead of
        # padding per projection (was 8 HBM pad/slice passes per train step
        # at the production shape 6845 -> 7168; PERFORMANCE.md r3 table).
        memory_valid = 0
        hd = self.d_model // self.num_heads
        hd_pad = next((p for p in (64, 128) if hd <= p), None)
        if (
            self.attention_impl == "pallas"
            and not need_weights
            and cross_bias is None
            and hd_pad is not None
            and self.num_heads % (128 // hd_pad) == 0
        ):
            from crossscore_tpu.ops.flash_attention import pick_cross_ln_prepad

            nk = memory.shape[1]
            _, _, nk_p = pick_cross_ln_prepad(tgt.shape[1], nk)
            if nk_p != nk:
                memory = jnp.pad(memory, ((0, 0), (0, nk_p - nk), (0, 0)))
                memory_valid = nk

        for i in range(self.num_layers):
            x, w = DecoderLayer(
                self.d_model,
                self.num_heads,
                self.ffn_ratio * self.d_model,
                self.do_self_attn,
                self.do_short_cut,
                self.dtype,
                self.attention_impl,
                name=f"layer_{i}",
            )(x, memory, need_weights=need_weights,
              self_bias=self_bias, cross_bias=cross_bias,
              memory_valid=memory_valid)
            if w is not None:
                mha_weights = w[:, need_weights_head_id]  # (B, Nq, Nk), last layer wins
        return x, mha_weights
