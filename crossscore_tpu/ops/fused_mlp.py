"""Fused LayerNorm -> fc1 -> exact GELU -> fc2 -> LayerScale -> residual.

One Pallas kernel computes the entire second half of a ViT block
(reference ``Dinov2Layer``: HF ``modeling_dinov2.py`` mlp+layerscale2, mirrored
at ``crossscore_tpu/models/dinov2.py::ViTBlock``):

    out = x + ls2 * ( gelu( ln(x) @ W1 + b1 ) @ W2 + b2 )

Why a kernel: the unfused graph makes four full HBM round-trips over
(B*N, 4D)-sized intermediates per layer — the LN output, the fc1 output, the
GELU output, and the fc2 output — plus re-reads ``x`` for the residual. At the
bench point (72 views x 1370 tokens x D=384) that is ~0.7-1 ms/layer of pure
bandwidth (tools/model_breakdown.py). Here a row block of ``x`` is read ONCE,
both weight matrices stay resident in VMEM across the whole grid (W1+W2 at
D=384 are ~2.4 MB bf16, constant index maps so Mosaic never re-DMAs them), and
only the final residual-added block is written back.

Numerics match the unfused path: LN statistics in fp32, matmuls bf16 x bf16
with fp32 accumulation (``preferred_element_type``), exact (erf-based) GELU in
fp32, LayerScale+residual in fp32. The backward pass recomputes through the
plain-XLA reference expression (the backbone is frozen behind
``stop_gradient`` in production — reference ``task/core.py:119`` — so this
VJP exists for correctness, not speed).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m



# XLA's f32 erf rational approximation (xla/client/lib/math.cc ErfImpl32):
# erf(x) = clamp(x, -4, 4) * P_alpha(x^2) / P_beta(x^2). Mosaic has no erf
# lowering, so the kernel evaluates the same polynomial XLA does — the fused
# GELU matches jax.lax.erf-based GELU to ~1 ulp (pinned in tests).
_ERF_ALPHA = (0.00022905065861350646, 0.0034082910107109506,
              0.050955695062380861, 0.18520832239976145, 1.128379143519084)
_ERF_BETA = (-1.1791602954361697e-7, 2.3547966471313185e-5,
             1.0179625278914885e-3, 1.4070470171167667e-2,
             1.1098505178285362e-1, 4.9746925110067538e-1, 1.0)


def _erf_f32(x):
    x = jnp.clip(x, -4.0, 4.0)
    x2 = x * x
    p = jnp.float32(_ERF_ALPHA[0])
    for c in _ERF_ALPHA[1:]:
        p = p * x2 + jnp.float32(c)
    q = jnp.float32(_ERF_BETA[0])
    for c in _ERF_BETA[1:]:
        q = q * x2 + jnp.float32(c)
    return x * p / q


def _ln_mlp_kernel(x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                   ls2_ref, o_ref, *, eps: float, gelu: str = "tanh"):
    x = x_ref[0]  # (bm, D) compute dtype (x_ref block is (1, bm, D))
    xf = x.astype(jnp.float32)
    o_ref[0] = _ln_mlp_body(xf, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref,
                            b2_ref, ls2_ref, x.dtype, eps, gelu)


def _ln_mlp_res_kernel(x_ref, attn_ref, ls1_ref, lns_ref, lnb_ref, w1_ref,
                       b1_ref, w2_ref, b2_ref, ls2_ref, o_ref, *, eps: float):
    """Variant also folding the ATTENTION LayerScale+residual:
    ``x = x_prev + attn * ls1`` computed in-kernel (fp32), then the MLP half.
    Saves one full HBM round-trip of the residual stream per block — the
    unfused graph writes x after the attention residual and re-reads it for
    ln2 + the final residual."""
    xf = (x_ref[...].astype(jnp.float32)
          + attn_ref[...].astype(jnp.float32) * ls1_ref[...].astype(jnp.float32))
    o_ref[...] = _ln_mlp_body(xf, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref,
                              b2_ref, ls2_ref, x_ref.dtype, eps)


def _ln_mlp_body(xf, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                 ls2_ref, dt, eps: float, gelu: str = "tanh"):
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * lns_ref[...].astype(jnp.float32) + lnb_ref[...].astype(jnp.float32)

    h = jax.lax.dot(y.astype(dt), w1_ref[...],
                    preferred_element_type=jnp.float32)
    h = h + b1_ref[...].astype(jnp.float32)
    if dt == jnp.bfloat16 and gelu == "tanh":
        # bf16 compute: tanh-form GELU (max |err| ~1e-3, below the bf16
        # activation rounding the path already carries) — ~half the VPU ops
        # of the erf polynomial, which the trace showed as ~0.5 ms/layer
        h = 0.5 * h * (1.0 + jnp.tanh(0.7978845608028654
                                      * (h + 0.044715 * h * h * h)))
    else:
        # exact GELU (HF Dinov2 semantics): 0.5*h*(1+erf(h/sqrt2)) via XLA's
        # erf f32 polynomial — fp32 golden-parity path
        h = 0.5 * h * (1.0 + _erf_f32(h * 0.7071067811865476))

    o = jax.lax.dot(h.astype(dt), w2_ref[...],
                    preferred_element_type=jnp.float32)
    o = (o + b2_ref[...].astype(jnp.float32)) * ls2_ref[...].astype(jnp.float32)
    return (xf + o).astype(dt)


@functools.partial(jax.jit, static_argnames=("eps", "block_m", "gelu"))
def _fused_ln_mlp_fwd_pallas(x, ln_scale, ln_bias, w1, b1, w2, b2, ls2,
                             eps: float = 1e-6, block_m: int = 0,
                             gelu: str = "tanh"):
    # operate on the (B, N, D) array DIRECTLY: flattening to (B*N, D) forces
    # XLA to physically re-tile on TPU whenever N is not sublane-aligned
    # (N=1370 backbone tokens) — a profiler trace showed ~0.6 ms/layer of
    # reshape copies around this kernel (PERFORMANCE.md, r2 trace findings)
    b, n, d = x.shape
    f = w1.shape[1]
    dt = x.dtype
    if block_m <= 0:
        # fewest EQUAL row blocks per image with the fp32 fc1 tile under
        # ~4.3 MB (688 rows at F=1536): measured best at the bench point
        # (3.28 ms/layer vs 3.38-3.44 for 344/512/1376, tools/mlp_microbench)
        n_splits = max(1, -(-n // 704))
        block_m = _ceil_to(-(-n // n_splits), 8)
    block_m = min(block_m, _ceil_to(n, 8))

    row = lambda v: v.reshape(1, -1).astype(dt)
    grid = (b, pl.cdiv(n, block_m))
    const = lambda bi, i: (0, 0)
    out = pl.pallas_call(
        functools.partial(_ln_mlp_kernel, eps=eps, gelu=gelu),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_m, d), lambda bi, i: (bi, i, 0)),
            pl.BlockSpec((1, d), const),
            pl.BlockSpec((1, d), const),
            pl.BlockSpec((d, f), const),
            pl.BlockSpec((1, f), const),
            pl.BlockSpec((f, d), const),
            pl.BlockSpec((1, d), const),
            pl.BlockSpec((1, d), const),
        ],
        out_specs=pl.BlockSpec((1, block_m, d), lambda bi, i: (bi, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, d), dt),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n * d * f,
            bytes_accessed=2 * b * n * d * 2 + (2 * d * f) * 2,
            transcendentals=b * n * f,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=jax.default_backend() == "cpu",
    )(x, row(ln_scale), row(ln_bias), w1.astype(dt), row(b1), w2.astype(dt),
      row(b2), row(ls2))
    return out


@functools.partial(jax.jit, static_argnames=("eps", "block_m"))
def _fused_res_ln_mlp_fwd_pallas(x, attn, ls1, ln_scale, ln_bias, w1, b1, w2,
                                 b2, ls2, eps: float = 1e-6, block_m: int = 512):
    b, n, d = x.shape
    f = w1.shape[1]
    m = b * n
    dt = x.dtype

    row = lambda v: v.reshape(1, -1).astype(dt)
    grid = (pl.cdiv(m, block_m),)
    const = lambda i: (0, 0)
    blk = pl.BlockSpec((block_m, d), lambda i: (i, 0))
    out = pl.pallas_call(
        functools.partial(_ln_mlp_res_kernel, eps=eps),
        grid=grid,
        in_specs=[
            blk,
            blk,
            pl.BlockSpec((1, d), const),
            pl.BlockSpec((1, d), const),
            pl.BlockSpec((1, d), const),
            pl.BlockSpec((d, f), const),
            pl.BlockSpec((1, f), const),
            pl.BlockSpec((f, d), const),
            pl.BlockSpec((1, d), const),
            pl.BlockSpec((1, d), const),
        ],
        out_specs=pl.BlockSpec((block_m, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, d), dt),
        cost_estimate=pl.CostEstimate(
            flops=4 * m * d * f,
            bytes_accessed=3 * m * d * 2 + (2 * d * f) * 2,
            transcendentals=m * f,
        ),
        interpret=jax.default_backend() == "cpu",
    )(x.reshape(m, d), attn.reshape(m, d), row(ls1), row(ln_scale),
      row(ln_bias), w1.astype(dt), row(b1), w2.astype(dt), row(b2), row(ls2))
    return out.reshape(b, n, d)


def _reference_res_xla(x, attn, ls1, ln_scale, ln_bias, w1, b1, w2, b2, ls2, eps):
    """Unfused expression for the residual-folding variant (VJP recompute).
    NOTE fp32 residual: the fused kernel computes x + attn*ls1 in fp32; the
    reference path here matches the KERNEL, and the (bf16-accumulating)
    unfused ViTBlock path agrees within bf16 tolerance (tests)."""
    xf = (x.astype(jnp.float32)
          + attn.astype(jnp.float32) * ls1.astype(jnp.float32)).astype(x.dtype)
    return _reference_xla(xf, ln_scale, ln_bias, w1, b1, w2, b2, ls2, eps)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10,))
def fused_res_ln_mlp(x, attn, ls1, ln_scale, ln_bias, w1, b1, w2, b2, ls2,
                     eps: float = 1e-6):
    """``let x2 = x + attn*ls1 in x2 + ls2 * fc2(gelu(fc1(ln(x2))))`` as one
    Pallas kernel — the whole second half of a ViT block INCLUDING the
    attention residual (one fewer residual-stream HBM round-trip than
    :func:`fused_ln_mlp`)."""
    return _fused_res_ln_mlp_fwd_pallas(x, attn, ls1, ln_scale, ln_bias, w1,
                                        b1, w2, b2, ls2, eps=eps)


def _frlm_fwd(x, attn, ls1, ln_scale, ln_bias, w1, b1, w2, b2, ls2, eps):
    out = _fused_res_ln_mlp_fwd_pallas(x, attn, ls1, ln_scale, ln_bias, w1,
                                       b1, w2, b2, ls2, eps=eps)
    return out, (x, attn, ls1, ln_scale, ln_bias, w1, b1, w2, b2, ls2)


def _frlm_bwd(eps, residuals, g):
    _, vjp = jax.vjp(lambda *a: _reference_res_xla(*a, eps), *residuals)
    return vjp(g)


fused_res_ln_mlp.defvjp(_frlm_fwd, _frlm_bwd)


def _reference_xla(x, ln_scale, ln_bias, w1, b1, w2, b2, ls2, eps):
    """The unfused expression the kernel must match (and the VJP recompute
    path). Mirrors ``models/dinov2.py::ViTBlock`` lines ln2..ls2."""
    dt = x.dtype
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = (y * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32)).astype(dt)
    h = jax.lax.dot_general(y, w1.astype(dt), (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = h + b1.astype(jnp.float32)
    h = 0.5 * h * (1.0 + jax.lax.erf(h * 0.7071067811865476))
    o = jax.lax.dot_general(h.astype(dt), w2.astype(dt), (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o = (o + b2.astype(jnp.float32)) * ls2.astype(jnp.float32)
    return (xf + o).astype(dt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def fused_ln_mlp(x, ln_scale, ln_bias, w1, b1, w2, b2, ls2, eps: float = 1e-6,
                 gelu: str = "tanh"):
    """``x + ls2 * fc2(gelu(fc1(ln(x))))`` as one Pallas kernel.

    x: (B, N, D); w1: (D, F); w2: (F, D); vectors are (D,)/(F,). Differentiable
    w.r.t. every array argument (backward recomputes via plain XLA)."""
    return _fused_ln_mlp_fwd_pallas(x, ln_scale, ln_bias, w1, b1, w2, b2, ls2,
                                    eps=eps, gelu=gelu)


def _flm_fwd(x, ln_scale, ln_bias, w1, b1, w2, b2, ls2, eps, gelu):
    out = _fused_ln_mlp_fwd_pallas(x, ln_scale, ln_bias, w1, b1, w2, b2, ls2,
                                   eps=eps, gelu=gelu)
    return out, (x, ln_scale, ln_bias, w1, b1, w2, b2, ls2)


def _flm_bwd(eps, gelu, residuals, g):
    _, vjp = jax.vjp(lambda *a: _reference_xla(*a, eps), *residuals)
    return vjp(g)


fused_ln_mlp.defvjp(_flm_fwd, _flm_bwd)
