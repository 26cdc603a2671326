"""Fused flash cross-attention for the (query patches) x (K*N reference tokens) axis.

The reference runs this as one dense torch ``MultiheadAttention`` call
(reference ``model/customised_transformer/transformer.py:195-205``), which
materialises a (B, H, 1369, K*1369) score matrix — at K=8/518px that is
~170 MB bf16 per batch item per layer. This kernel streams reference-token
blocks through VMEM with an online softmax, so HBM traffic is O(Q + KV + O)
and the scores tile never leaves VMEM.

Design (see /opt/skills/guides/pallas_guide.md + boom_attention_tricks.md):
- grid (B*H, Nq/block_q, Nk/block_k): batch*head and query blocks parallel
  (megacore), the KV axis sequential (online-softmax reduction).
- fp32 running max/sum/accumulator in VMEM scratch; bf16 QK^T/PV matmuls with
  fp32 ``preferred_element_type``.
- KV padding masked with a large negative constant (not -inf, avoids NaN).
- Forward also emits the (m, l) softmax statistics as residuals; the backward
  pass is a `lax.scan` over KV blocks in plain XLA (recomputes score tiles
  per block, never materialising the full matrix) — flash-style memory for
  training without a hand-written backward kernel.

Head-dim handling: CrossScore's head_dim is 48 (=384/8); Mosaic pads the lane
dimension internally. Block sizes stay multiples of 128 on the token axes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)
LANES = 128
LOG2E = 1.44269504088896340736  # softmax in base 2: exp(x) == exp2(x * log2(e));
# exp2 maps to the cheaper hardware transcendental on the VPU


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def pick_blocks(nq: int, nk: int) -> tuple[int, int, int]:
    """Tuned (block_q, block_k, block_h) (v5e measurements, PERFORMANCE.md):
    large q blocks amortise softmax bookkeeping; when the whole KV fits one
    VMEM-friendly block (<=2048 tokens) a single exact-softmax kv step wins,
    with block_q half the query axis and two batch*head slices per grid cell
    when the score tiles fit VMEM. For the long-KV (online softmax) regime a
    SINGLE whole-q block wins whenever the fp32 score tile + bf16 p tile fit
    VMEM (decoder 1369x10952/hd48: 5.96 ms/layer vs 8.07 at block_q=512) —
    block shapes equal to the array dim are always legal, so no q padding."""
    if nk <= 2048:
        bk = _ceil_to(nk, 128)
        if nq >= 1024:
            bq = _ceil_to((nq + 1) // 2, 8)  # two q blocks, e.g. 688 for 1370
        else:
            bq = _ceil_to(nq, 8)  # single q block, no padding waste
        bh = 2 if bq * bk * 8 <= 12 * 1024 * 1024 else 1  # 2 fp32 score tiles
        return bq, bk, bh
    bk = 1024
    if nq * bk * 6 <= 9_000_000:
        bq = nq  # single whole-q block, no padding
    else:
        bq = 512 if nq >= 512 else _ceil_to(nq, 128)
    return bq, bk, 1


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, l_ref, m_ref, m_scr, l_scr, acc_scr, *,
                sm_scale: float, kv_valid: int, block_k: int):
    kv_idx = pl.program_id(2)
    num_kv = pl.num_programs(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # (bq, hd)
    k = k_ref[0]  # (bk, hd)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bq, bk)
    s = s * sm_scale

    # mask padded reference tokens; load-bearing for the padded last block
    col0 = kv_idx * block_k
    col_ids = col0 + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col_ids < kv_valid, s, NEG_INF)

    m_prev = m_scr[...]  # (bq, LANES) replicated
    l_prev = l_scr[...]
    m_curr = jnp.max(s, axis=1, keepdims=True)  # (bq, 1)
    m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_curr, m_prev.shape))
    alpha = jnp.exp2(LOG2E * (m_prev - m_next))  # (bq, LANES)
    p = jnp.exp2(LOG2E * (s - m_next[:, :1]))  # (bq, bk)
    l_curr = jnp.sum(p, axis=1, keepdims=True)  # (bq, 1)
    l_next = alpha * l_prev + jnp.broadcast_to(l_curr, l_prev.shape)

    m_scr[...] = m_next
    l_scr[...] = l_next

    v = v_ref[0]  # (bk, hd)
    o_curr = jax.lax.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    acc_scr[...] = acc_scr[...] * alpha[:, : acc_scr.shape[-1]] + o_curr

    @pl.when(kv_idx == num_kv - 1)
    def _store():
        l_fin = l_scr[...]
        l_inv = jnp.where(l_fin == 0.0, 1.0, 1.0 / l_fin)
        o_ref[0] = (acc_scr[...] * l_inv[:, : acc_scr.shape[-1]]).astype(o_ref.dtype)
        l_ref[0] = l_fin[:, :1].astype(l_ref.dtype)
        m_ref[0] = m_scr[...][:, :1].astype(m_ref.dtype)


def _fwd_kernel_single(q_ref, k_ref, v_ref, o_ref, l_ref, m_ref, *,
                       sm_scale: float, kv_valid: int, block_h: int):
    """Single-KV-block variant: the whole reference axis fits one VMEM block,
    so the plain (exact) softmax replaces the online-softmax bookkeeping.
    ``block_h`` (batch*head) slices are processed per grid cell to amortise
    per-cell DMA/pipeline overhead. Up to 2 slices are statically unrolled
    (separate score tiles pipeline); beyond that a fori_loop keeps ONE live
    score tile (unrolled >2 exceeds the 16M scoped-VMEM limit)."""

    def one_slice(hh):
        q = q_ref[hh]
        k = k_ref[hh]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = s * sm_scale
        if kv_valid < s.shape[1]:
            # NOTE: a tail-only mask via slice+concatenate measured SLOWER (the
            # concatenate copies the whole tile); the full-width where is cheap
            col_ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col_ids < kv_valid, s, NEG_INF)

        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp2(LOG2E * (s - m))
        l = jnp.sum(p, axis=1, keepdims=True)
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        v = v_ref[hh]
        o = jax.lax.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        o_ref[hh] = (o * l_inv).astype(o_ref.dtype)
        l_ref[hh] = l.astype(l_ref.dtype)
        m_ref[hh] = m.astype(m_ref.dtype)

    if block_h <= 2:
        for hh in range(block_h):
            one_slice(hh)
    else:
        jax.lax.fori_loop(0, block_h, lambda hh, c: (one_slice(hh), c)[1], 0)


def _fwd_kernel_v2_mxu_probe(bias_ref, q_ref, k_ref, v_ref, o_ref, l_ref,
                             m_ref, m_scr, acc_scr, *, c1: float, hd: int):
    """TIMING PROBE (wrong math): the multi-KV v2 kernel with every softmax
    pass deleted — QK -> bf16 cast -> PV accumulate. Bounds the kernel's
    MXU/DMA floor for the decoder cross-attention shape."""
    kv_idx = pl.program_id(2)
    num_kv = pl.num_programs(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[...] = jnp.zeros_like(m_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    p = (s * c1).astype(v_ref.dtype)
    pv = jax.lax.dot(p, v_ref[0], preferred_element_type=jnp.float32)
    acc_scr[...] = acc_scr[...] + pv

    @pl.when(kv_idx == num_kv - 1)
    def _store():
        acc = acc_scr[...]
        o_ref[0] = acc[:, :hd].astype(o_ref.dtype)
        l_ref[0] = acc[:, hd:hd + 1].astype(l_ref.dtype)
        m_ref[0] = m_scr[...][:, :1].astype(m_ref.dtype)


def _fwd_kernel_v2(bias_ref, q_ref, k_ref, v_ref, o_ref, l_ref, m_ref,
                   m_scr, acc_scr, *, c1: float, hd: int):
    """Multi-KV-block online-softmax kernel, VPU-minimised (round 2).

    Per KV block only THREE passes over the (bq, bk) score tile: the fused
    scale+mask FMA, the row max, and exp2. The softmax row sums are not
    tracked separately: V carries an appended ones column (lane ``hd``), so
    the fp32 accumulator's lane ``hd`` IS the running row sum — the
    ``acc * alpha + p@v_aug`` rescale updates o-numerator and l with one
    (bq, 128) FMA. Final normalisation happens once on the output tile.
    """
    kv_idx = pl.program_id(2)
    num_kv = pl.num_programs(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bq, bk)
    t = s * c1 + bias_ref[0]  # fused scale (log2-base) + padding mask

    m_prev = m_scr[...]  # (bq, LANES) replicated
    m_curr = jnp.max(t, axis=1, keepdims=True)
    m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_curr, m_prev.shape))
    alpha = jnp.exp2(m_prev - m_next)  # (bq, LANES)
    p = jnp.exp2(t - m_next[:, :1]).astype(v_ref.dtype)
    m_scr[...] = m_next

    pv = jax.lax.dot(p, v_ref[0], preferred_element_type=jnp.float32)
    acc_scr[...] = acc_scr[...] * alpha[:, : acc_scr.shape[-1]] + pv

    @pl.when(kv_idx == num_kv - 1)
    def _store():
        acc = acc_scr[...]
        l = acc[:, hd:hd + 1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0] = (acc[:, :hd] * l_inv).astype(o_ref.dtype)
        l_ref[0] = l.astype(l_ref.dtype)
        m_ref[0] = (m_scr[...][:, :1] * (1.0 / LOG2E)).astype(m_ref.dtype)


def _fwd_kernel_single_v2(bias_ref, q_ref, k_ref, v_ref, o_ref, l_ref, m_ref, *,
                          c1: float, block_h: int, hd: int, aug: bool,
                          exp_bf16: bool):
    """Single-KV-block kernel, VPU-minimised (the round-2 rewrite).

    Differences vs ``_fwd_kernel_single`` (each removes a full pass over the
    (bq, bk) score tile on the vector unit):
    - the softmax scale and the padding mask are ONE fused multiply-add:
      ``t = s * (sm_scale*log2e) + bias`` with a precomputed (1, bk) additive
      bias row (0 valid / -huge padded) — replaces a scale pass plus an
      iota+select mask pass;
    - exp2 straight off ``t - m`` (optionally in bf16: ``exp_bf16``);
    - with ``aug``, V carries an appended ones column (lane hd), so the PV
      matmul's fp32 accumulator also yields the softmax row sums — the MXU
      output tile is 128 lanes wide whether we use 64 or 128 of them, so the
      row-sum comes for free and the VPU reduction pass disappears;
    - the 1/l normalisation happens on the (bq, hd) output, not the score tile.
    """

    def one_slice(hh):
        q = q_ref[hh]
        k = k_ref[hh]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        t = s * c1 + bias_ref[0]
        m = jnp.max(t, axis=1, keepdims=True)
        tm = t - m
        if exp_bf16 == "noexp":  # timing probe ONLY (wrong math): exp2 cost
            p = tm.astype(v_ref.dtype)
        elif exp_bf16:
            p = jnp.exp2(tm.astype(jnp.bfloat16)).astype(v_ref.dtype)
        else:
            p = jnp.exp2(tm).astype(v_ref.dtype)
        oa = jax.lax.dot(p, v_ref[hh], preferred_element_type=jnp.float32)
        if aug:
            l = oa[:, hd:hd + 1]
            o = oa[:, :hd]
        else:
            l = jnp.sum(p.astype(jnp.float32), axis=1, keepdims=True)
            o = oa
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[hh] = (o * l_inv).astype(o_ref.dtype)
        l_ref[hh] = l.astype(l_ref.dtype)
        m_ref[hh] = (m * (1.0 / LOG2E)).astype(m_ref.dtype)

    if block_h <= 2:
        for hh in range(block_h):
            one_slice(hh)
    else:
        jax.lax.fori_loop(0, block_h, lambda hh, c: (one_slice(hh), c)[1], 0)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "block_h", "variant"))
def _flash_fwd(q, k, v, block_q: int = 512, block_k: int = 1024, block_h: int = 1,
               variant: str = "v1", kv_bias=None):
    """q: (B, H, Nq, hd); k, v: (B, H, Nk, hd) -> (o, l, m) with padding stripped.

    ``kv_bias``: optional (Nk,) additive logits bias (token masking for
    shape-bucketed inference); merged with the block-padding mask. v2 only.
    Per-item (B, Nk) masking lives in the layout-native kernels
    (flash_cross_attention_ln_masked / flash_qkv_self_attention_masked).
    """
    if kv_bias is not None and kv_bias.ndim != 1:
        raise NotImplementedError(
            "per-item kv_bias requires the layout-native kernels"
        )
    b, h, nq, hd = q.shape
    nk = k.shape[2]
    sm_scale = 1.0 / (hd ** 0.5)

    nq_p = _ceil_to(nq, block_q)
    nk_p = _ceil_to(nk, block_k)
    bh = b * h

    qf = jnp.pad(q.reshape(bh, nq, hd), ((0, 0), (0, nq_p - nq), (0, 0)))
    kf = jnp.pad(k.reshape(bh, nk, hd), ((0, 0), (0, nk_p - nk), (0, 0)))
    vf = jnp.pad(v.reshape(bh, nk, hd), ((0, 0), (0, nk_p - nk), (0, 0)))

    single_kv = nk_p == block_k
    if not single_kv or bh % block_h:
        block_h = 1  # multi-slice cells only for the single-pass kernel
    grid = (bh // block_h, nq_p // block_q, nk_p // block_k)

    if variant != "v1":
        # Production (v2) path for BOTH single- and multi-KV-block shapes:
        # fused scale+mask FMA with a precomputed bias row, ones-augmented V so
        # the softmax row sums ride the PV matmul's fp32 accumulator, exp2
        # softmax. See kernel docstrings; A/B numbers in PERFORMANCE.md.
        # "v2_noaug" / "v2_bf16" exist for microbench A/Bs (tools/attn_microbench).
        aug = not variant.endswith("noaug")
        exp_bf16 = "noexp" if "noexp" in variant else ("bf16" in variant)
        v_lanes = hd
        if aug:
            v_lanes = _ceil_to(hd + 1, LANES)
            vf = jnp.concatenate(
                [
                    vf,
                    jnp.ones((bh, nk_p, 1), vf.dtype),
                    jnp.zeros((bh, nk_p, v_lanes - hd - 1), vf.dtype),
                ],
                axis=-1,
            )
        bias = jnp.where(jnp.arange(nk_p) < nk, 0.0, NEG_INF)
        if kv_bias is not None:
            # kernel bias rides the exp2-base score tile: pre-scale by log2(e)
            bias = bias + jnp.pad(kv_bias.astype(jnp.float32) * LOG2E, (0, nk_p - nk))
        bias = bias.astype(jnp.float32).reshape(1, nk_p)
        if single_kv:
            kernel = functools.partial(
                _fwd_kernel_single_v2, c1=sm_scale * LOG2E, block_h=block_h,
                hd=hd, aug=aug, exp_bf16=exp_bf16,
            )
            scratch_shapes = []
        else:
            if not aug:
                raise ValueError("multi-KV v2 kernel requires the augmented V")
            kfn = _fwd_kernel_v2_mxu_probe if "mxuprobe" in variant else _fwd_kernel_v2
            kernel = functools.partial(kfn, c1=sm_scale * LOG2E, hd=hd)
            scratch_shapes = [
                pltpu.VMEM((block_q, LANES), jnp.float32),
                pltpu.VMEM((block_q, v_lanes), jnp.float32),
            ]
        o, l, m = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_k), lambda bh_, qi, ki: (0, ki)),
                pl.BlockSpec((block_h, block_q, hd), lambda bh_, qi, ki: (bh_, qi, 0)),
                pl.BlockSpec((block_h, block_k, hd), lambda bh_, qi, ki: (bh_, ki, 0)),
                pl.BlockSpec((block_h, block_k, v_lanes), lambda bh_, qi, ki: (bh_, ki, 0)),
            ],
            out_specs=[
                pl.BlockSpec((block_h, block_q, hd), lambda bh_, qi, ki: (bh_, qi, 0)),
                pl.BlockSpec((block_h, block_q, 1), lambda bh_, qi, ki: (bh_, qi, 0)),
                pl.BlockSpec((block_h, block_q, 1), lambda bh_, qi, ki: (bh_, qi, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bh, nq_p, hd), q.dtype),
                jax.ShapeDtypeStruct((bh, nq_p, 1), jnp.float32),
                jax.ShapeDtypeStruct((bh, nq_p, 1), jnp.float32),
            ],
            scratch_shapes=scratch_shapes,
            cost_estimate=pl.CostEstimate(
                flops=4 * bh * nq_p * nk_p * hd,
                bytes_accessed=bh * (2 * nq_p + nk_p * (hd + v_lanes) // hd) * hd * 2,
                transcendentals=bh * nq_p * nk_p,
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            interpret=jax.default_backend() == "cpu",
        )(bias, qf, kf, vf)
        o = o.reshape(b, h, nq_p, hd)[:, :, :nq]
        l = l.reshape(b, h, nq_p)[:, :, :nq]
        m = m.reshape(b, h, nq_p)[:, :, :nq]
        return o, l, m

    if kv_bias is not None:
        raise NotImplementedError("kv_bias requires the v2 kernels")
    if single_kv:
        kernel = functools.partial(
            _fwd_kernel_single, sm_scale=sm_scale, kv_valid=nk, block_h=block_h
        )
        scratch_shapes = []
    else:
        kernel = functools.partial(
            _fwd_kernel, sm_scale=sm_scale, kv_valid=nk, block_k=block_k
        )
        scratch_shapes = [
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, hd), jnp.float32),
        ]
    o, l, m = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_h, block_q, hd), lambda bh_, qi, ki: (bh_, qi, 0)),
            pl.BlockSpec((block_h, block_k, hd), lambda bh_, qi, ki: (bh_, ki, 0)),
            pl.BlockSpec((block_h, block_k, hd), lambda bh_, qi, ki: (bh_, ki, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block_h, block_q, hd), lambda bh_, qi, ki: (bh_, qi, 0)),
            pl.BlockSpec((block_h, block_q, 1), lambda bh_, qi, ki: (bh_, qi, 0)),
            pl.BlockSpec((block_h, block_q, 1), lambda bh_, qi, ki: (bh_, qi, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, nq_p, hd), q.dtype),
            jax.ShapeDtypeStruct((bh, nq_p, 1), jnp.float32),
            jax.ShapeDtypeStruct((bh, nq_p, 1), jnp.float32),
        ],
        scratch_shapes=scratch_shapes,
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * nq_p * nk_p * hd,
            bytes_accessed=bh * (nq_p + 2 * nk_p * (nq_p // block_q) + nq_p) * hd * 2,
            transcendentals=bh * nq_p * nk_p,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=jax.default_backend() == "cpu",
    )(qf, kf, vf)

    o = o.reshape(b, h, nq_p, hd)[:, :, :nq]
    l = l.reshape(b, h, nq_p)[:, :, :nq]
    m = m.reshape(b, h, nq_p)[:, :, :nq]
    return o, l, m


def _bwd_kernel_single(bias_ref, q_ref, do_ref, k_ref, v_ref, lb_ref, delta_ref,
                       dq_ref, dk_ref, dv_ref, dk_scr, dv_scr, *,
                       c1: float, sm_scale: float):
    """Flash-attention backward for the single-KV-block shape (the backbone's
    1370-token self-attention — the training hot loop, reference
    ``transformer.py:195-205``). Grid (B*H, Nq/bq) with the q axis sequential:
    dq streams out per q block; dk/dv accumulate in fp32 scratch and are
    written once at the last q block.

    Score-tile passes: ONE fused exp2 recomputing p (the caller folds
    1/l into ``lb = (m + ln l) * log2e`` and the padding mask into ``bias``),
    one fused (dp - delta) * p * scale for ds, and the two bf16 casts feeding
    the MXU. All five matmuls run bf16 x bf16 -> fp32.
    """
    qi = pl.program_id(1)
    nqi = pl.num_programs(1)

    @pl.when(qi == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    q = q_ref[0]
    k = k_ref[0]
    do = do_ref[0]
    v = v_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bq, bk)
    p = jnp.exp2(s * c1 - lb_ref[0] + bias_ref[0])
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - delta_ref[0]) * sm_scale
    pb = p.astype(k.dtype)
    dsb = ds.astype(k.dtype)

    dq_ref[0] = jax.lax.dot(dsb, k, preferred_element_type=jnp.float32).astype(
        dq_ref.dtype
    )
    dk_scr[...] += jax.lax.dot_general(
        dsb, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dv_scr[...] += jax.lax.dot_general(
        pb, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(qi == nqi - 1)
    def _store():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q",))
def _bwd_pallas_single(q, k, v, o, do, l, m, block_q: int = 512):
    """Single-KV-block Pallas backward.

    q,k,v,o,do: (B,H,N,hd); l,m: (B,H,Nq). Returns (dq, dk, dv)."""
    b, h, nq, hd = q.shape
    nk = k.shape[2]
    sm_scale = 1.0 / (hd ** 0.5)
    bh = b * h
    nq_p = _ceil_to(nq, block_q)
    bk = _ceil_to(nk, 128)

    def flat(x, n_to):
        x = x.reshape(bh, *x.shape[2:])
        return jnp.pad(x, ((0, 0), (0, n_to - x.shape[1]), (0, 0)))

    qf = flat(q, nq_p)
    dof = flat(do, nq_p)
    kf = flat(k, bk)
    vf = flat(v, bk)
    l_safe = jnp.where(l == 0.0, 1.0, l)
    # lb: exp2-base log-normaliser; padded q rows get +big so their p == 0
    # and they contribute nothing to the dk/dv accumulators
    lb = ((m + jnp.log(l_safe)) * LOG2E).reshape(bh, nq)
    lb = jnp.pad(lb, ((0, 0), (0, nq_p - nq)), constant_values=1e30)[..., None]
    delta = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)
    delta = jnp.pad(delta.reshape(bh, nq), ((0, 0), (0, nq_p - nq)))[..., None]
    bias = jnp.where(jnp.arange(bk) < nk, 0.0, NEG_INF).astype(jnp.float32)
    bias = bias.reshape(1, bk)

    kernel = functools.partial(
        _bwd_kernel_single, c1=sm_scale * LOG2E, sm_scale=sm_scale
    )
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(bh, nq_p // block_q),
        in_specs=[
            pl.BlockSpec((1, bk), lambda bh_, qi: (0, 0)),
            pl.BlockSpec((1, block_q, hd), lambda bh_, qi: (bh_, qi, 0)),
            pl.BlockSpec((1, block_q, hd), lambda bh_, qi: (bh_, qi, 0)),
            pl.BlockSpec((1, bk, hd), lambda bh_, qi: (bh_, 0, 0)),
            pl.BlockSpec((1, bk, hd), lambda bh_, qi: (bh_, 0, 0)),
            pl.BlockSpec((1, block_q, 1), lambda bh_, qi: (bh_, qi, 0)),
            pl.BlockSpec((1, block_q, 1), lambda bh_, qi: (bh_, qi, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, hd), lambda bh_, qi: (bh_, qi, 0)),
            pl.BlockSpec((1, bk, hd), lambda bh_, qi: (bh_, 0, 0)),
            pl.BlockSpec((1, bk, hd), lambda bh_, qi: (bh_, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, nq_p, hd), q.dtype),
            jax.ShapeDtypeStruct((bh, bk, hd), k.dtype),
            jax.ShapeDtypeStruct((bh, bk, hd), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, hd), jnp.float32),
            pltpu.VMEM((bk, hd), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=10 * bh * nq_p * bk * hd,
            bytes_accessed=bh * (4 * nq_p + 4 * bk) * hd * 2,
            transcendentals=bh * nq_p * bk,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=jax.default_backend() == "cpu",
    )(bias, qf, dof, kf, vf, lb, delta)

    dq = dq.reshape(b, h, nq_p, hd)[:, :, :nq]
    dk = dk.reshape(b, h, bk, hd)[:, :, :nk]
    dv = dv.reshape(b, h, bk, hd)[:, :, :nk]
    return dq, dk, dv


def _bwd_kernel_multi(bias_ref, q_ref, do_ref, k_ref, v_ref, lb_ref, delta_ref,
                      dq_ref, dk_ref, dv_ref, dq_scr, *,
                      c1: float, sm_scale: float, q_chunks: int, cq: int):
    """Flash backward for the MULTI-KV-block regime (decoder cross-attention
    training, Nk = K*1369 tokens). Grid (B*H, Nk/bk) with the KV axis
    sequential: dk/dv are exact per KV block (the whole q axis is reduced
    in-cell over ``q_chunks`` chunks of ``cq`` rows); dq accumulates in fp32
    scratch across KV blocks and is written once at the last block.

    Same score-tile recipe as ``_bwd_kernel_single``: one fused exp2
    recomputes p (1/l folded into ``lb``, KV padding in ``bias``), one fused
    (dp - delta) * p * scale for ds, bf16 matmul operands with fp32
    accumulation."""
    kvi = pl.program_id(1)
    nkv = pl.num_programs(1)

    @pl.when(kvi == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    k = k_ref[0]
    v = v_ref[0]
    dk_acc = None
    dv_acc = None
    for qc in range(q_chunks):
        sl = slice(qc * cq, (qc + 1) * cq)
        q = q_ref[0][sl]
        do = do_ref[0][sl]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (cq, bk)
        p = jnp.exp2(s * c1 - lb_ref[0][sl] + bias_ref[0])
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta_ref[0][sl]) * sm_scale
        pb = p.astype(k.dtype)
        dsb = ds.astype(k.dtype)
        dq_scr[sl] += jax.lax.dot(dsb, k, preferred_element_type=jnp.float32)
        dk_c = jax.lax.dot_general(
            dsb, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dv_c = jax.lax.dot_general(
            pb, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dk_acc = dk_c if dk_acc is None else dk_acc + dk_c
        dv_acc = dv_c if dv_acc is None else dv_acc + dv_c

    dk_ref[0] = dk_acc.astype(dk_ref.dtype)
    dv_ref[0] = dv_acc.astype(dv_ref.dtype)

    @pl.when(kvi == nkv - 1)
    def _store():
        dq_ref[0] = dq_scr[...].astype(dq_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_k",))
def _bwd_pallas_multi(q, k, v, o, do, l, m, block_k: int = 1024):
    """Multi-KV-block Pallas backward (decoder training hot loop; reference
    ``transformer.py:195-205`` backward). q,k,v,o,do: (B,H,N,hd);
    l,m: (B,H,Nq). Returns (dq, dk, dv)."""
    b, h, nq, hd = q.shape
    nk = k.shape[2]
    sm_scale = 1.0 / (hd ** 0.5)
    bh = b * h
    nk_p = _ceil_to(nk, block_k)
    # q chunks: bound the live (cq, bk) score tiles to VMEM (fp32 + bf16 p/ds)
    q_chunks = max(1, -(-nq * block_k // 700_000))
    cq = _ceil_to(-(-nq // q_chunks), 8)
    nq_p = cq * q_chunks

    def flat(x, n_to):
        x = x.reshape(bh, *x.shape[2:])
        return jnp.pad(x, ((0, 0), (0, n_to - x.shape[1]), (0, 0)))

    qf = flat(q, nq_p)
    dof = flat(do, nq_p)
    kf = flat(k, nk_p)
    vf = flat(v, nk_p)
    l_safe = jnp.where(l == 0.0, 1.0, l)
    # lb: exp2-base log-normaliser; padded q rows get +big so their p == 0
    lb = ((m + jnp.log(l_safe)) * LOG2E).reshape(bh, nq)
    lb = jnp.pad(lb, ((0, 0), (0, nq_p - nq)), constant_values=1e30)[..., None]
    delta = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)
    delta = jnp.pad(delta.reshape(bh, nq), ((0, 0), (0, nq_p - nq)))[..., None]
    bias = jnp.where(jnp.arange(nk_p) < nk, 0.0, NEG_INF).astype(jnp.float32)
    bias = bias.reshape(1, nk_p)

    kernel = functools.partial(
        _bwd_kernel_multi, c1=sm_scale * LOG2E, sm_scale=sm_scale,
        q_chunks=q_chunks, cq=cq,
    )
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(bh, nk_p // block_k),
        in_specs=[
            pl.BlockSpec((1, block_k), lambda bh_, ki: (0, ki)),
            pl.BlockSpec((1, nq_p, hd), lambda bh_, ki: (bh_, 0, 0)),
            pl.BlockSpec((1, nq_p, hd), lambda bh_, ki: (bh_, 0, 0)),
            pl.BlockSpec((1, block_k, hd), lambda bh_, ki: (bh_, ki, 0)),
            pl.BlockSpec((1, block_k, hd), lambda bh_, ki: (bh_, ki, 0)),
            pl.BlockSpec((1, nq_p, 1), lambda bh_, ki: (bh_, 0, 0)),
            pl.BlockSpec((1, nq_p, 1), lambda bh_, ki: (bh_, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, nq_p, hd), lambda bh_, ki: (bh_, 0, 0)),
            pl.BlockSpec((1, block_k, hd), lambda bh_, ki: (bh_, ki, 0)),
            pl.BlockSpec((1, block_k, hd), lambda bh_, ki: (bh_, ki, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, nq_p, hd), q.dtype),
            jax.ShapeDtypeStruct((bh, nk_p, hd), k.dtype),
            jax.ShapeDtypeStruct((bh, nk_p, hd), v.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((nq_p, hd), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=10 * bh * nq_p * nk_p * hd,
            bytes_accessed=bh * (4 * nq_p * (nk_p // block_k) + 4 * nk_p) * hd * 2,
            transcendentals=bh * nq_p * nk_p,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=jax.default_backend() == "cpu",
    )(bias, qf, dof, kf, vf, lb, delta)

    dq = dq.reshape(b, h, nq_p, hd)[:, :, :nq]
    dk = dk.reshape(b, h, nk_p, hd)[:, :, :nk]
    dv = dv.reshape(b, h, nk_p, hd)[:, :, :nk]
    return dq, dk, dv


def _bwd_xla(residuals, do, *, block_k: int):
    """Flash-style backward in plain XLA: scan over KV blocks, recomputing
    score tiles. Memory per step is O(Nq x block_k); the full score matrix is
    never materialised.

    Matmul operands stay in the INPUT dtype (bf16 in production) with fp32
    accumulation — upcasting operands to fp32 would put all five backward
    matmuls on the ~8x-slower fp32 MXU path. Softmax statistics and the
    ds/p tiles are fp32; they are cast back to bf16 only as matmul operands.
    """
    q, k, v, o, l, m = residuals
    b, h, nq, hd = q.shape
    nk = k.shape[2]
    sm_scale = 1.0 / (hd ** 0.5)

    nk_p = _ceil_to(nk, block_k)
    pad = nk_p - nk
    kf = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
    vf = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
    n_blocks = nk_p // block_k

    # D_i = sum_d o_i * do_i  (rowwise); lb folds the 1/l into the exp
    delta = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)
    l_safe = jnp.where(l == 0.0, 1.0, l)
    lb = m + jnp.log(l_safe)  # p = exp(s*scale - lb)

    kb = kf.reshape(b, h, n_blocks, block_k, hd).transpose(2, 0, 1, 3, 4)
    vb = vf.reshape(b, h, n_blocks, block_k, hd).transpose(2, 0, 1, 3, 4)
    col_base = jnp.arange(n_blocks) * block_k

    def step(dq_acc, xs):
        kj, vj, c0 = xs  # (B,H,bk,hd) x2, scalar
        s = jnp.einsum("bhqd,bhkd->bhqk", q, kj,
                       preferred_element_type=jnp.float32) * sm_scale
        col_ids = c0 + jnp.arange(block_k)
        valid = (col_ids < nk)[None, None, None, :]
        p = jnp.where(valid, jnp.exp(s - lb[..., None]), 0.0)
        dp = jnp.einsum("bhqd,bhkd->bhqk", do, vj,
                        preferred_element_type=jnp.float32)
        ds = p * (dp - delta[..., None]) * sm_scale
        p_mm = p.astype(v.dtype)
        ds_mm = ds.astype(v.dtype)
        dq_acc = dq_acc + jnp.einsum("bhqk,bhkd->bhqd", ds_mm, kj,
                                     preferred_element_type=jnp.float32)
        dk_j = jnp.einsum("bhqk,bhqd->bhkd", ds_mm, q, preferred_element_type=jnp.float32)
        dv_j = jnp.einsum("bhqk,bhqd->bhkd", p_mm, do, preferred_element_type=jnp.float32)
        return dq_acc, (dk_j, dv_j)

    dq0 = jnp.zeros((b, h, nq, hd), jnp.float32)
    dq, (dk_b, dv_b) = jax.lax.scan(step, dq0, (kb, vb, col_base))
    dk = dk_b.transpose(1, 2, 0, 3, 4).reshape(b, h, nk_p, hd)[:, :, :nk]
    dv = dv_b.transpose(1, 2, 0, 3, 4).reshape(b, h, nk_p, hd)[:, :, :nk]
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


def tp_flash_cross_attention(q, k, v, axis: str):
    """Run the flash kernel under tensor parallelism.

    GSPMD cannot partition ``pallas_call`` (it would all-gather the inputs or
    fail), so under a 2-D (data x model) mesh the kernel is wrapped in
    ``shard_map``: heads are sharded over ``axis`` and every device runs the
    kernel on its local heads — attention heads are independent, so there is
    NO communication. Select with ``model.tpu.attention_impl=tp:<axis>``.

    The mesh is resolved from the registry fed by ``parallel.make_mesh``
    (shard_map needs axis names/sizes at trace time; Flax modules only carry
    config strings). The batch dim is sharded over the remaining mesh axes
    when divisible, else replicated (e.g. during b=1 model init).
    """
    import jax as _jax
    from jax.sharding import PartitionSpec as P

    from crossscore_tpu.parallel.mesh import current_mesh

    mesh = current_mesh()
    if axis not in mesh.axis_names:
        raise ValueError(f"mesh {mesh.axis_names} has no axis {axis!r}")
    if q.shape[1] % mesh.shape[axis]:
        raise ValueError(
            f"{q.shape[1]} heads not divisible by mesh axis {axis}={mesh.shape[axis]}"
        )
    data_axes = tuple(a for a in mesh.axis_names if a != axis)
    data_size = 1
    for a in data_axes:
        data_size *= mesh.shape[a]
    batch_spec = data_axes if (data_axes and q.shape[0] % data_size == 0) else None
    spec = P(batch_spec, axis, None, None)

    def local(q, k, v):
        return flash_cross_attention(q, k, v, *pick_blocks(q.shape[2], k.shape[2]))

    return _jax.shard_map(
        local, mesh=mesh, in_specs=(spec,) * 3, out_specs=spec, check_vma=False
    )(q, k, v)


def _fwd_kernel_cross_ln(bias_ref, q_ref, k_ref, v_ref, o_ref, l_ref, m_ref,
                         m_scr, l_scr, acc_scr, *, c1: float, hd: int,
                         hpack: int, hd_t: int = 0, per_item: bool = False):
    """Layout-native CROSS-attention kernel (decoder): q/k/v arrive token-major
    with the head axis packed into lanes at a PADDED head dim (hd zero-padded
    so ``hpack`` heads fill one 128-lane block — zero lanes change nothing:
    QK contraction over zeros adds 0, PV zero-V lanes emit 0). Online softmax
    over KV blocks with per-head fp32 scratch. vs the head-major kernel this
    halves HBM traffic (head-major (…, Nk, 48) arrays are lane-tile padded to
    128 in HBM) and runs PV at the full 128-lane MXU width.

    Scratch: m/l (hpack, bq, LANES) replicated, acc (hpack, bq, hd).
    ``bias_ref``: (1, bk) additive mask row in exp2 base (block padding +
    optional shape-bucket token mask), shared across heads."""
    kv_idx = pl.program_id(3)
    num_kv = pl.num_programs(3)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # per_item: the bias block holds ALL batch rows (see _fwd_kernel_qkv_biased)
    bias_row = bias_ref[pl.program_id(0)] if per_item else bias_ref[0]
    # hd_t < hd: contract QK over the TRUE head dim only — pad lanes are
    # structurally zero (HeadLaneProj) so the narrower contraction is exact,
    # and the MXU skips the pad arithmetic (tools/lane_pad_probe.py). PV keeps
    # the full hd slice: its saving would be in OUTPUT width, which costs the
    # same 128-lane tile either way, and narrowing it would force a padded
    # store of o/acc.
    hd_c = hd_t if 0 < hd_t < hd else hd
    for j in range(hpack):
        q = q_ref[0][:, j * hd:j * hd + hd_c]
        k = k_ref[0][:, j * hd:j * hd + hd_c]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (bq, bk)
        t = s * c1 + bias_row
        m_prev = m_scr[j]
        l_prev = l_scr[j]
        m_curr = jnp.max(t, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_curr, m_prev.shape))
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(t - m_next[:, :1]).astype(v_ref.dtype)
        l_curr = jnp.sum(p.astype(jnp.float32), axis=1, keepdims=True)
        l_scr[j] = l_prev * alpha + jnp.broadcast_to(l_curr, l_prev.shape)
        m_scr[j] = m_next
        v = v_ref[0][:, j * hd:(j + 1) * hd]
        pv = jax.lax.dot(p, v, preferred_element_type=jnp.float32)
        acc_scr[j] = acc_scr[j] * alpha[:, :hd] + pv

    @pl.when(kv_idx == num_kv - 1)
    def _store():
        for j in range(hpack):
            l_fin = l_scr[j][:, :1]
            l_inv = jnp.where(l_fin == 0.0, 1.0, 1.0 / l_fin)
            o_ref[0, :, j * hd:(j + 1) * hd] = (acc_scr[j] * l_inv).astype(o_ref.dtype)
            l_ref[0, j] = l_fin.astype(l_ref.dtype)
            m_ref[0, j] = (m_scr[j][:, :1] * (1.0 / LOG2E)).astype(m_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "hd", "block_q",
                                             "block_k", "kv_valid", "hd_true"))
def _flash_cross_ln_fwd(qp, kp, vp, num_heads: int, hd: int,
                        block_q: int = 0, block_k: int = 1024, kv_bias=None,
                        kv_valid: int = 0, hd_true: int = 0):
    """qp: (B, Nq, H*hd); kp/vp: (B, Nk, H*hd) token-major, head dim PADDED so
    ``hpack = 128 // hd`` heads fill a lane block (hd must divide 128).
    Returns (o (B, Nq, H*hd), l, m (B, H, Nq)). The softmax scale is
    1/sqrt(hd) of the PADDED dim; callers with a smaller true head dim fold
    the correction into the q projection (exactly — see HeadLaneProj).

    ``kv_valid`` (0 = all of Nk): true KV count when the caller PRE-padded
    kp/vp along tokens to a block multiple — the pad columns are masked by
    the softmax bias exactly like the internal pad. Pre-padding the decoder
    MEMORY once (before the k/v projections) replaces eight per-projection
    HBM pads per train step with one (trace attribution, PERFORMANCE.md)."""
    b, nq, dtot = qp.shape
    nk = kp.shape[1]
    valid = kv_valid if kv_valid > 0 else nk
    h = num_heads
    hpack = LANES // hd
    if hd * hpack != LANES or h % hpack:
        raise ValueError(f"hd={hd} hpack={hpack} H={h} incompatible with 128 lanes")
    nlb = dtot // LANES
    sm_scale = 1.0 / (hd ** 0.5)
    if block_q <= 0:
        block_q = nq
    nk_p = _ceil_to(nk, block_k)
    if nk_p != nk:
        pad = nk_p - nk
        kp = jnp.pad(kp, ((0, 0), (0, pad), (0, 0)))
        vp = jnp.pad(vp, ((0, 0), (0, pad), (0, 0)))
    bias = jnp.where(jnp.arange(nk_p) < valid, 0.0, NEG_INF)
    per_item = kv_bias is not None and kv_bias.ndim == 2
    if per_item:  # (B, Nk) per-item; full batch rows per block (Mosaic tiling)
        bias = bias[None] + jnp.pad(
            kv_bias.astype(jnp.float32) * LOG2E, ((0, 0), (0, nk_p - nk))
        )
        bias = bias.astype(jnp.float32)
        bias_spec = pl.BlockSpec((b, block_k), lambda b_, p, qi, ki: (0, ki))
    else:
        if kv_bias is not None:
            bias = bias + jnp.pad(kv_bias.astype(jnp.float32) * LOG2E, (0, nk_p - nk))
        bias = bias.astype(jnp.float32).reshape(1, nk_p)
        bias_spec = pl.BlockSpec((1, block_k), lambda b_, p, qi, ki: (0, ki))

    grid = (b, nlb, pl.cdiv(nq, block_q), nk_p // block_k)
    kernel = functools.partial(
        _fwd_kernel_cross_ln, c1=sm_scale * LOG2E, hd=hd, hpack=hpack,
        hd_t=hd_true, per_item=per_item,
    )
    o, l, m = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            bias_spec,
            pl.BlockSpec((1, block_q, LANES), lambda b_, p, qi, ki: (b_, qi, p)),
            pl.BlockSpec((1, block_k, LANES), lambda b_, p, qi, ki: (b_, ki, p)),
            pl.BlockSpec((1, block_k, LANES), lambda b_, p, qi, ki: (b_, ki, p)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, LANES), lambda b_, p, qi, ki: (b_, qi, p)),
            pl.BlockSpec((1, hpack, block_q, 1), lambda b_, p, qi, ki: (b_, p, qi, 0)),
            pl.BlockSpec((1, hpack, block_q, 1), lambda b_, p, qi, ki: (b_, p, qi, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, nq, dtot), qp.dtype),
            jax.ShapeDtypeStruct((b, h, nq, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, h, nq, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((hpack, block_q, LANES), jnp.float32),
            pltpu.VMEM((hpack, block_q, LANES), jnp.float32),
            pltpu.VMEM((hpack, block_q, hd), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * nq * nk_p * hd,
            bytes_accessed=b * (2 * nq * dtot + 2 * nk_p * dtot * (pl.cdiv(nq, block_q))) * 2,
            transcendentals=b * h * nq * nk_p,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=jax.default_backend() == "cpu",
    )(bias, qp, kp, vp)
    return o, l[..., 0], m[..., 0]


def _bwd_kernel_cross_ln(bias_ref, qp_ref, dop_ref, kp_ref, vp_ref, lb_ref,
                         delta_ref, dq_ref, dk_ref, dv_ref, dq_scr, *,
                         c1: float, sm_scale: float, hd: int, hpack: int,
                         q_chunks: int, cq: int, hd_t: int = 0):
    """Layout-native flash backward for the decoder cross-attention (token-
    major packed (B, N, H*hd) arrays, ``hpack`` heads per 128-lane block —
    the same layout as ``_fwd_kernel_cross_ln``, so training needs NO
    head-major relayout: the r2 backward paid ~15 ms/step of pad/slice/copy
    re-tiling (B,8,6845,64) views around ``_bwd_pallas_multi``; this kernel
    consumes the projections' natural layout. Head-major bf16 (…, N, 64)
    arrays are also lane-padded to 128 in HBM, so token-major halves the
    backward's HBM traffic on q/k/v/do/dq/dk/dv.

    Grid (B, n_lane_blocks, Nk/bk), KV sequential: dk/dv are exact per KV
    block (whole q axis reduced in-cell over ``q_chunks`` chunks); dq
    accumulates in fp32 scratch, written at the last KV block. Same
    score-tile recipe as ``_bwd_kernel_multi`` (one fused exp2 recomputing p
    with 1/l folded into lb, fused (dp - delta)*p*scale, bf16 matmul
    operands, fp32 accumulation)."""
    kvi = pl.program_id(2)
    nkv = pl.num_programs(2)

    @pl.when(kvi == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    # hd_t < hd: every slice narrows to the TRUE head dim at the SAME packed
    # stride — pad lanes are structurally zero (HeadLaneProj's jnp.pad, whose
    # VJP also discards pad-lane cotangents), so all five matmuls per
    # (head, q-chunk) skip the 25% pad arithmetic exactly
    # (tools/lane_pad_probe.py: hd48 strided measured ~= contiguous hd48).
    hd_c = hd_t if 0 < hd_t < hd else hd
    for j in range(hpack):
        lane = slice(j * hd, j * hd + hd_c)
        k = kp_ref[0][:, lane]
        v = vp_ref[0][:, lane]
        dk_acc = None
        dv_acc = None
        for qc in range(q_chunks):
            sl = slice(qc * cq, (qc + 1) * cq)
            q = qp_ref[0][sl, lane]
            do = dop_ref[0][sl, lane]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )  # (cq, bk)
            p = jnp.exp2(s * c1 - lb_ref[0, j][sl] + bias_ref[0])
            dp = jax.lax.dot_general(
                do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            ds = p * (dp - delta_ref[0, j][sl]) * sm_scale
            pb = p.astype(k.dtype)
            dsb = ds.astype(k.dtype)
            dq_scr[sl, lane] += jax.lax.dot(dsb, k, preferred_element_type=jnp.float32)
            dk_c = jax.lax.dot_general(
                dsb, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            dv_c = jax.lax.dot_general(
                pb, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            dk_acc = dk_c if dk_acc is None else dk_acc + dk_c
            dv_acc = dv_c if dv_acc is None else dv_acc + dv_c
        if hd_c < hd:  # zero-fill pad lanes: one contiguous hd-wide store
            dk_acc = jnp.pad(dk_acc, ((0, 0), (0, hd - hd_c)))
            dv_acc = jnp.pad(dv_acc, ((0, 0), (0, hd - hd_c)))
        full = slice(j * hd, (j + 1) * hd)
        dk_ref[0, :, full] = dk_acc.astype(dk_ref.dtype)
        dv_ref[0, :, full] = dv_acc.astype(dv_ref.dtype)

    @pl.when(kvi == nkv - 1)
    def _store():
        dq_ref[0] = dq_scr[...].astype(dq_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "hd", "block_k",
                                             "qc_budget", "kv_valid",
                                             "hd_true"))
def _bwd_cross_ln_pallas(qp, kp, vp, o, do, l, m, num_heads: int, hd: int,
                         block_k: int = 1024, qc_budget: int = 300_000,
                         kv_valid: int = 0, hd_true: int = 0):
    """Token-major packed backward. qp/kp/vp/o/do: (B, N, H*hd) with hd the
    PADDED head dim; l, m: (B, H, Nq) in the forward's head order
    (h = lane_block * hpack + sub). Returns token-major (dq, dk, dv).
    ``kv_valid`` > 0: kp/vp token rows past it are pre-pad — masked by the
    softmax bias so p == 0 and dk/dv are exactly 0 there."""
    b, nq, dtot = qp.shape
    nk = kp.shape[1]
    valid = kv_valid if kv_valid > 0 else nk
    h = num_heads
    hpack = LANES // hd
    nlb = dtot // LANES
    sm_scale = 1.0 / (hd ** 0.5)
    nk_p = _ceil_to(nk, block_k)
    # tighter live-tile budget than _bwd_pallas_multi's 700k: the token-major
    # q/do/dq blocks are 128 lanes wide (vs 64 head-major), costing ~1.4 MB
    # more of the 16M scoped VMEM (measured OOMs: 1.27M over at cq=464
    # bk=1024, 124K over at cq=344 bk=1024 — hence 300k + the caller's bk=512)
    q_chunks = max(1, -(-nq * block_k // qc_budget))
    cq = _ceil_to(-(-nq // q_chunks), 8)
    nq_p = cq * q_chunks

    qf = jnp.pad(qp, ((0, 0), (0, nq_p - nq), (0, 0)))
    dof = jnp.pad(do, ((0, 0), (0, nq_p - nq), (0, 0)))
    kf = jnp.pad(kp, ((0, 0), (0, nk_p - nk), (0, 0)))
    vf = jnp.pad(vp, ((0, 0), (0, nk_p - nk), (0, 0)))

    l_safe = jnp.where(l == 0.0, 1.0, l)
    # lb: exp2-base log-normaliser; padded q rows get +big so their p == 0
    lb = (m + jnp.log(l_safe)) * LOG2E  # (B, H, Nq)
    lb = jnp.pad(lb, ((0, 0), (0, 0), (0, nq_p - nq)), constant_values=1e30)[..., None]
    # delta_h = sum_d o*do over head h's lane window; lane order (block, sub)
    # matches the forward's l/m head order
    delta = (o.astype(jnp.float32) * do.astype(jnp.float32)).reshape(
        b, nq, h, hd
    ).sum(-1).transpose(0, 2, 1)  # (B, H, Nq)
    delta = jnp.pad(delta, ((0, 0), (0, 0), (0, nq_p - nq)))[..., None]
    bias = jnp.where(jnp.arange(nk_p) < valid, 0.0, NEG_INF).astype(jnp.float32)
    bias = bias.reshape(1, nk_p)

    kernel = functools.partial(
        _bwd_kernel_cross_ln, c1=sm_scale * LOG2E, sm_scale=sm_scale, hd=hd,
        hpack=hpack, q_chunks=q_chunks, cq=cq, hd_t=hd_true,
    )
    hd_c = hd_true if 0 < hd_true < hd else hd
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(b, nlb, nk_p // block_k),
        in_specs=[
            pl.BlockSpec((1, block_k), lambda b_, p, ki: (0, ki)),
            pl.BlockSpec((1, nq_p, LANES), lambda b_, p, ki: (b_, 0, p)),
            pl.BlockSpec((1, nq_p, LANES), lambda b_, p, ki: (b_, 0, p)),
            pl.BlockSpec((1, block_k, LANES), lambda b_, p, ki: (b_, ki, p)),
            pl.BlockSpec((1, block_k, LANES), lambda b_, p, ki: (b_, ki, p)),
            pl.BlockSpec((1, hpack, nq_p, 1), lambda b_, p, ki: (b_, p, 0, 0)),
            pl.BlockSpec((1, hpack, nq_p, 1), lambda b_, p, ki: (b_, p, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, nq_p, LANES), lambda b_, p, ki: (b_, 0, p)),
            pl.BlockSpec((1, block_k, LANES), lambda b_, p, ki: (b_, ki, p)),
            pl.BlockSpec((1, block_k, LANES), lambda b_, p, ki: (b_, ki, p)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, nq_p, dtot), qp.dtype),
            jax.ShapeDtypeStruct((b, nk_p, dtot), kp.dtype),
            jax.ShapeDtypeStruct((b, nk_p, dtot), vp.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((nq_p, LANES), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=10 * b * h * nq_p * nk_p * hd_c,
            bytes_accessed=b * (4 * nq_p * (nk_p // block_k) + 4 * nk_p) * dtot * 2 // nlb,
            transcendentals=b * h * nq_p * nk_p,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=jax.default_backend() == "cpu",
    )(bias, qf, dof, kf, vf, lb, delta)

    return dq[:, :nq], dk[:, :nk], dv[:, :nk]


PREPAD_BLOCK_K = 896  # lane-aligned KV block usable by BOTH the fwd grid and
# the bwd grid within its scoped-VMEM budget (live q-chunk tile 464x896 =
# 416k elems < the validated 420k budget) — the decoder pre-pads its memory
# to a multiple of this so neither direction pads or slices KV in-step.


def pick_cross_ln_prepad(nq: int, nk: int) -> tuple[int, int, int]:
    """(block_q, block_k, nk_padded) for a caller that PRE-pads KV tokens
    once (decoder memory) instead of letting fwd/bwd each pad per projection.
    block_k divides nk_padded, so the forward takes the no-pad path; the true
    token count goes in as ``kv_valid``. Prefers the fwd-optimal bk=1024 when
    it pads no more than 896 would (at the production train shape 6845 both
    give 7168, so the fwd runs 1024 and the bwd independently picks its
    no-pad 896); the bwd falls back to padded bk=768 when 896 doesn't divide."""
    if nk <= 2048:
        bk = _ceil_to(nk, 128)
    else:
        bk = 1024 if _ceil_to(nk, 1024) <= _ceil_to(nk, PREPAD_BLOCK_K) \
            else PREPAD_BLOCK_K
    max_bq = max(128, 1_050_000 // bk // 8 * 8)
    n_splits = max(1, -(-nq // max_bq))
    return _ceil_to(-(-nq // n_splits), 8), bk, _ceil_to(nk, bk)


def pick_cross_ln_blocks(nq: int, nk: int) -> tuple[int, int]:
    """(block_q, block_k) for the layout-native cross kernel, sized to the
    16M scoped-VMEM limit: the unrolled head pair keeps TWO live
    (bq, bk)-score tiles (fp32 + bf16 p ≈ 12 bytes/element) per cell, plus
    ~3 MB of KV blocks and softmax scratch. Equal q splits (fewest that fit)
    beat budget-maximal blocks (PERFORMANCE.md, bq=688 at the decoder shape)."""
    bk = _ceil_to(nk, 128) if nk <= 2048 else 1024
    # empirical scoped-VMEM ceiling on the live score-tile ELEMENT count:
    # 688x1408 (0.97M) compiles, 912x1920 (1.75M) and 1369x1024 (1.40M) OOM
    max_bq = max(128, 1_050_000 // bk // 8 * 8)
    n_splits = max(1, -(-nq // max_bq))
    return _ceil_to(-(-nq // n_splits), 8), bk


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def flash_cross_attention_ln(qp, kp, vp, num_heads: int, hd: int,
                             block_q: int = 0, block_k: int = 1024,
                             kv_valid: int = 0, hd_true: int = 0):
    """Layout-native cross-attention on token-major packed projections.

    qp/kp/vp: (B, N, H*hd) with hd the PADDED head dim (128 % hd == 0; pad
    lanes zero). The softmax scale applied is 1/sqrt(hd) of the PADDED dim —
    callers with a smaller true head dim fold the correction into the q
    projection (``HeadLaneProj.prescale``). Backward is the layout-native
    token-major kernel (``_bwd_cross_ln_pallas``) — no head-major relayout
    anywhere in training (r2 paid ~15 ms/step of pad/slice/copy for it).

    ``kv_valid`` > 0: kp/vp arrive PRE-padded along tokens to a block_k
    multiple with only the first ``kv_valid`` rows real — fwd AND bwd mask
    the pad columns (p == 0 there, so dk/dv pad rows are exactly 0).

    ``hd_true`` (0 < hd_true < hd): the TRUE head dim when hd is padded —
    fwd QK and all five bwd matmuls contract/emit only the true lanes at the
    same packed stride, skipping the pad arithmetic exactly (pad lanes are
    structurally zero; measured ~13% off the bwd kernel at 48/64,
    tools/lane_pad_probe.py)."""
    o, _, _ = _flash_cross_ln_fwd(qp, kp, vp, num_heads, hd,
                                  block_q=block_q, block_k=block_k,
                                  kv_valid=kv_valid, hd_true=hd_true)
    return o


def _split_packed(x, h, hd):
    b, n, _ = x.shape
    return x.reshape(b, n, h, hd).transpose(0, 2, 1, 3)  # (B, H, N, hd)


def _fcaln_fwd(qp, kp, vp, num_heads, hd, block_q, block_k, kv_valid,
               hd_true):
    o, l, m = _flash_cross_ln_fwd(qp, kp, vp, num_heads, hd,
                                  block_q=block_q, block_k=block_k,
                                  kv_valid=kv_valid, hd_true=hd_true)
    return o, (qp, kp, vp, o, l, m)


def _fcaln_bwd(num_heads, hd, block_q, block_k, kv_valid, hd_true, residuals,
               do):
    qp, kp, vp, o, l, m = residuals
    # bk=768/420k: best of the r3 block sweep (tools/bwd_microbench.py —
    # 18.09 ms/layer vs 18.56 at bk=512/300k; bk=1024 needs q chunks too small
    # to win, and raising scoped VMEM to 32M unlocked nothing: the kernel is
    # hd=64 MXU-bound, not VMEM-starved)
    bk = min(block_k, 768)
    if kv_valid > 0 and kp.shape[1] % PREPAD_BLOCK_K == 0:
        # pre-padded KV (pick_cross_ln_prepad): bk=896 divides the token count,
        # so the backward needs no kf/vf pad and no dk/dv slice either
        bk = PREPAD_BLOCK_K
    return _bwd_cross_ln_pallas(qp, kp, vp, o, do, l, m, num_heads, hd,
                                block_k=bk, qc_budget=420_000,
                                kv_valid=kv_valid, hd_true=hd_true)


flash_cross_attention_ln.defvjp(_fcaln_fwd, _fcaln_bwd)


def flash_cross_attention_ln_masked(qp, kp, vp, kv_bias, num_heads: int,
                                    hd: int, block_q: int = 0,
                                    block_k: int = 1024, hd_true: int = 0):
    """Forward-only masked variant (shape-bucketed inference)."""
    o, _, _ = _flash_cross_ln_fwd(qp, kp, vp, num_heads, hd, block_q=block_q,
                                  block_k=block_k, kv_bias=kv_bias,
                                  hd_true=hd_true)
    return o


def pick_qkv_hpack(h: int, hd: int) -> int:
    """Heads per grid cell for the layout-native kernel: fill a 128-lane block
    when possible (e.g. 2 heads at hd=64), clamped to divide H."""
    hp = max(1, min(h, LANES // hd))
    while h % hp:
        hp -= 1
    return hp


def _fwd_kernel_qkv_biased(bias_ref, q_ref, k_ref, v_ref, o_ref, l_ref, m_ref, *,
                           sm_scale: float, hd: int, hpack: int,
                           per_item: bool = False):
    """Layout-native kernel with an additive KV-token bias row (shape-bucketed
    inference: 0 for valid tokens, -large for padded ones). One extra FMA pass
    over the score tile vs ``_fwd_kernel_qkv``. ``per_item``: the bias block
    holds ALL batch rows (Mosaic rejects (1, n) blocks of a (B, n) array when
    n is not lane-aligned); the kernel selects its row by program_id."""
    c1 = sm_scale * LOG2E
    bias_row = bias_ref[pl.program_id(0)] if per_item else bias_ref[0]
    for j in range(hpack):
        q = q_ref[0][:, j * hd:(j + 1) * hd]
        k = k_ref[0][:, j * hd:(j + 1) * hd]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        t = s * c1 + bias_row
        m = jnp.max(t, axis=1, keepdims=True)
        p = jnp.exp2(t - m).astype(v_ref.dtype)
        l = jnp.sum(p.astype(jnp.float32), axis=1, keepdims=True)
        v = v_ref[0][:, j * hd:(j + 1) * hd]
        o = jax.lax.dot(p, v, preferred_element_type=jnp.float32)
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, :, j * hd:(j + 1) * hd] = (o * l_inv).astype(o_ref.dtype)
        l_ref[0, j] = l.astype(l_ref.dtype)
        m_ref[0, j] = (m * (1.0 / LOG2E)).astype(m_ref.dtype)


def _fwd_kernel_qkv_probe(q_ref, k_ref, v_ref, o_ref, l_ref, m_ref, *,
                          sm_scale: float, hd: int, hpack: int, probe: str):
    """TIMING PROBES ONLY (wrong math): isolate the cost of each pass of
    ``_fwd_kernel_qkv`` by deleting it. ``probe`` deletes: "nomax" (constant
    shift instead of rowmax), "nosum" (skip the VPU row-sum/normalise),
    "mxu" (QK -> cast -> PV only). Numbers go to PERFORMANCE.md."""
    c1 = sm_scale * LOG2E
    for j in range(hpack):
        q = q_ref[0][:, j * hd:(j + 1) * hd]
        k = k_ref[0][:, j * hd:(j + 1) * hd]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if probe == "mxu":
            p = s.astype(v_ref.dtype)
            l = m = None
        elif probe == "nomax":
            p = jnp.exp2(s * c1 - 8.0).astype(v_ref.dtype)
            l = jnp.sum(p.astype(jnp.float32), axis=1, keepdims=True)
            m = l
        elif probe == "nosum":
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp2((s - m) * c1).astype(v_ref.dtype)
            l = m
        else:
            raise ValueError(probe)
        v = v_ref[0][:, j * hd:(j + 1) * hd]
        o = jax.lax.dot(p, v, preferred_element_type=jnp.float32)
        if probe != "mxu":
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            o = o * l_inv
        o_ref[0, :, j * hd:(j + 1) * hd] = o.astype(o_ref.dtype)
        if l is None:
            l_ref[0, j] = jnp.zeros_like(l_ref[0, j])
            m_ref[0, j] = jnp.zeros_like(m_ref[0, j])
        else:
            l_ref[0, j] = l.astype(l_ref.dtype)
            m_ref[0, j] = (m * sm_scale).astype(m_ref.dtype)


def _fwd_kernel_qkv_chunked(q_ref, k_ref, v_ref, o_ref, l_ref, m_ref, *,
                            sm_scale: float, hd: int, hpack: int,
                            n_chunks: int):
    """Layout-native kernel with the KV axis split into ``n_chunks`` in-VMEM
    chunks combined by an exact online softmax. Same math as
    ``_fwd_kernel_qkv``; the point is SCHEDULING: chunk c+1's QK matmul has no
    data dependency on chunk c's softmax, so the static scheduler can overlap
    MXU and VPU work that the single-chunk kernel serialises. Chunk
    boundaries are 128-aligned (lane-tile aligned slices of the KV token
    axis). A/B'd in tools/attn_microbench.py (qkvc specs)."""
    c1 = sm_scale * LOG2E
    n = k_ref.shape[1]
    bounds = [0]
    step = _ceil_to(pl.cdiv(n, n_chunks), 128)
    while bounds[-1] + step < n:
        bounds.append(bounds[-1] + step)
    bounds.append(n)
    for j in range(hpack):
        q = q_ref[0][:, j * hd:(j + 1) * hd]
        m_run = None
        l_run = None
        acc = None
        for c0, c1_ in zip(bounds[:-1], bounds[1:]):
            k = k_ref[0][c0:c1_, j * hd:(j + 1) * hd]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            v = v_ref[0][c0:c1_, j * hd:(j + 1) * hd]
            m_c = jnp.max(s, axis=1, keepdims=True)
            if m_run is None:
                m_run = m_c
                p = jnp.exp2((s - m_run) * c1).astype(v_ref.dtype)
                l_run = jnp.sum(p.astype(jnp.float32), axis=1, keepdims=True)
                acc = jax.lax.dot(p, v, preferred_element_type=jnp.float32)
            else:
                m_new = jnp.maximum(m_run, m_c)
                alpha = jnp.exp2((m_run - m_new) * c1)
                p = jnp.exp2((s - m_new) * c1).astype(v_ref.dtype)
                l_run = l_run * alpha + jnp.sum(
                    p.astype(jnp.float32), axis=1, keepdims=True
                )
                acc = acc * alpha + jax.lax.dot(
                    p, v, preferred_element_type=jnp.float32
                )
                m_run = m_new
        l_inv = jnp.where(l_run == 0.0, 1.0, 1.0 / l_run)
        o_ref[0, :, j * hd:(j + 1) * hd] = (acc * l_inv).astype(o_ref.dtype)
        l_ref[0, j] = l_run.astype(l_ref.dtype)
        m_ref[0, j] = (m_run * sm_scale).astype(m_ref.dtype)


def _fwd_kernel_qkv(q_ref, k_ref, v_ref, o_ref, l_ref, m_ref, *,
                    sm_scale: float, hd: int, hpack: int):
    """Layout-native self-attention kernel: q/k/v refs are LANE-SLICED VIEWS of
    the fused qkv-projection output (B, N, 3*H*hd) — the same array passed
    three times with different index maps. ``hpack`` heads (hpack*hd = 128
    lanes, one full lane block) are processed per grid cell. The output block
    writes straight into (B, N, H*hd), which the out-projection consumes as-is.

    This removes every relayout around the attention core: no (B,N,3,H,hd) ->
    (B,H,N,hd) transposes, no token-axis padding copies, no augmented-V
    concatenation — at the bench point those were ~1.5 ms/layer of pure HBM
    traffic (tools/model_breakdown.py round 2). Block shapes match the logical
    token count exactly (Mosaic handles non-multiple-of-tile shapes), so the
    softmax needs no padding mask at all.
    """
    c1 = sm_scale * LOG2E
    for j in range(hpack):
        q = q_ref[0][:, j * hd:(j + 1) * hd]
        k = k_ref[0][:, j * hd:(j + 1) * hd]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp2((s - m) * c1).astype(v_ref.dtype)
        l = jnp.sum(p.astype(jnp.float32), axis=1, keepdims=True)
        v = v_ref[0][:, j * hd:(j + 1) * hd]
        o = jax.lax.dot(p, v, preferred_element_type=jnp.float32)
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, :, j * hd:(j + 1) * hd] = (o * l_inv).astype(o_ref.dtype)
        l_ref[0, j] = l.astype(l_ref.dtype)
        m_ref[0, j] = (m * sm_scale).astype(m_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "block_q", "hpack",
                                             "probe", "chunks", "sched"))
def _flash_qkv_fwd(qkv, num_heads: int, block_q: int = 0, hpack: int = 2,
                   kv_bias=None, probe: str = "", chunks: int = 1,
                   sched: str = ""):
    """qkv: (B, N, 3*D) fused projection output -> (o (B,N,D), l, m (B,H,N)).

    ``kv_bias``: optional (N,) additive logits bias over the token axis
    (masking for shape-bucketed inference).

    ``sched``: Mosaic SCHEDULING experiments (A/B'd in tools/attn_microbench;
    results in PERFORMANCE.md). "+"-joined tokens: "allpar" marks the q-block
    grid dim parallel instead of arbitrary; "fuse" sets allow_input_fusion
    (XLA may fuse the qkv-projection epilogue into the kernel's operands);
    "vmem<MB>" raises the Mosaic VMEM limit for this kernel."""
    b, n, d3 = qkv.shape
    d = d3 // 3
    h = num_heads
    hd = d // h
    if block_q <= 0:
        # auto: fewest EQUAL q blocks whose fp32 score tile + bf16 p tile fit
        # a ~6 MB VMEM budget (whole row when it fits). Equal splits beat the
        # budget-maximal block: bq=688 (2x ~688) measured 4.58 ms/layer vs
        # 4.85 at bq=728 (728+642) at the bench point (PERFORMANCE.md).
        # Multiple of 8 (Mosaic block constraint); the partial EDGE block is
        # handled by Mosaic's masked DMA — garbage rows never leave the cell.
        budget = min(n, max(128, (6_000_000 // (n * 6)) // 8 * 8))
        n_blocks = -(-n // budget)
        block_q = max(128, _ceil_to(-(-n // n_blocks), 8))
    lane_blk = hpack * hd
    if h % hpack:
        raise ValueError(f"hpack {hpack} incompatible with H={h}, hd={hd}")
    nlb = d // lane_blk  # lane-blocks per q/k/v section
    sm_scale = 1.0 / (hd ** 0.5)
    grid = (b, nlb, pl.cdiv(n, block_q))

    in_specs = [
        pl.BlockSpec((1, block_q, lane_blk), lambda b_, p, qi: (b_, qi, p)),
        pl.BlockSpec((1, n, lane_blk), lambda b_, p, qi: (b_, 0, nlb + p)),
        pl.BlockSpec((1, n, lane_blk), lambda b_, p, qi: (b_, 0, 2 * nlb + p)),
    ]
    inputs = (qkv, qkv, qkv)
    if probe:
        kernel = functools.partial(
            _fwd_kernel_qkv_probe, sm_scale=sm_scale, hd=hd, hpack=hpack,
            probe=probe,
        )
    elif chunks > 1:
        if kv_bias is not None:
            raise NotImplementedError("chunked kernel has no masked variant")
        kernel = functools.partial(
            _fwd_kernel_qkv_chunked, sm_scale=sm_scale, hd=hd, hpack=hpack,
            n_chunks=chunks,
        )
    elif kv_bias is None:
        kernel = functools.partial(
            _fwd_kernel_qkv, sm_scale=sm_scale, hd=hd, hpack=hpack
        )
    else:
        kernel = functools.partial(
            _fwd_kernel_qkv_biased, sm_scale=sm_scale, hd=hd, hpack=hpack
        )
        if kv_bias.ndim == 2:  # (B, N) per-item (bucket-packed mixed shapes)
            # full-array block (Mosaic rejects (1, n) blocks of (B, n) when n
            # is not lane-aligned); the kernel indexes its row by program_id
            kernel = functools.partial(
                _fwd_kernel_qkv_biased, sm_scale=sm_scale, hd=hd, hpack=hpack,
                per_item=True,
            )
            bias_row = kv_bias.astype(jnp.float32) * LOG2E
            in_specs = [pl.BlockSpec((b, n), lambda b_, p, qi: (0, 0))] + in_specs
        else:
            bias_row = (kv_bias.astype(jnp.float32) * LOG2E).reshape(1, n)
            in_specs = [pl.BlockSpec((1, n), lambda b_, p, qi: (0, 0))] + in_specs
        inputs = (bias_row,) + inputs
    o, l, m = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, block_q, lane_blk), lambda b_, p, qi: (b_, qi, p)),
            pl.BlockSpec((1, hpack, block_q, 1), lambda b_, p, qi: (b_, p, qi, 0)),
            pl.BlockSpec((1, hpack, block_q, 1), lambda b_, p, qi: (b_, p, qi, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, d), qkv.dtype),
            jax.ShapeDtypeStruct((b, h, n, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, h, n, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * n * n * hd,
            bytes_accessed=b * n * d3 * 2 * 2,
            transcendentals=b * h * n * n,
        ),
        compiler_params=_sched_params(sched, n_inputs=len(inputs)),
        interpret=jax.default_backend() == "cpu",
    )(*inputs)
    return o, l[..., 0], m[..., 0]  # l, m: (B, H, N)


def _sched_params(sched: str, n_inputs: int) -> pltpu.CompilerParams:
    """CompilerParams for ``_flash_qkv_fwd``'s ``sched`` experiment tokens."""
    toks = [t for t in sched.split("+") if t]
    kw: dict = {
        "dimension_semantics": (
            "parallel", "parallel",
            "parallel" if "allpar" in toks else "arbitrary",
        )
    }
    if "fuse" in toks:
        kw["allow_input_fusion"] = (True,) * n_inputs
    for t in toks:
        if t.startswith("vmem"):
            kw["vmem_limit_bytes"] = int(t[4:]) * 1024 * 1024
    return pltpu.CompilerParams(**kw)


def flash_qkv_self_attention_masked(qkv, kv_bias, num_heads: int,
                                    block_q: int = 0, hpack: int = 2):
    """Forward-only masked variant of :func:`flash_qkv_self_attention` for
    shape-bucketed inference (no custom VJP — bucketing is an eval-path
    feature; training always uses fixed crops, reference config/data/*.yaml)."""
    o, _, _ = _flash_qkv_fwd(qkv, num_heads, block_q=block_q, hpack=hpack,
                             kv_bias=kv_bias)
    return o


def flash_cross_attention_masked(q, k, v, kv_bias, block_q: int = 512,
                                 block_k: int = 1024, block_h: int = 1):
    """Forward-only masked flash attention (see flash_qkv_self_attention_masked)."""
    o, _, _ = _flash_fwd(q, k, v, block_q=block_q, block_k=block_k,
                         block_h=block_h, variant="v2", kv_bias=kv_bias)
    return o


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def flash_qkv_self_attention(qkv, num_heads: int, block_q: int = 0, hpack: int = 2):
    """Self-attention straight off the fused qkv projection.

    qkv (B, N, 3*D) -> (B, N, D), equal to reshaping into heads, running
    softmax(q k^T / sqrt(hd)) v per head, and re-packing — without any of
    those relayouts touching HBM. Backward reconstructs per-head views and
    reuses the flash-style XLA backward (training pays the transposes; the
    inference hot path does not).
    """
    o, _, _ = _flash_qkv_fwd(qkv, num_heads, block_q=block_q, hpack=hpack)
    return o


def _split_qkv(qkv, h):
    b, n, d3 = qkv.shape
    d = d3 // 3
    hd = d // h
    parts = qkv.reshape(b, n, 3, h, hd).transpose(2, 0, 3, 1, 4)  # (3, B, H, N, hd)
    return parts[0], parts[1], parts[2]


def _fqsa_fwd(qkv, num_heads, block_q, hpack):
    o, l, m = _flash_qkv_fwd(qkv, num_heads, block_q=block_q, hpack=hpack)
    return o, (qkv, o, l, m)


def _fqsa_bwd(num_heads, block_q, hpack, residuals, do):
    qkv, o, l, m = residuals
    b, n, d = o.shape
    h = num_heads
    hd = d // h
    q, k, v = _split_qkv(qkv, h)
    o_h = o.reshape(b, n, h, hd).transpose(0, 2, 1, 3)
    do_h = do.reshape(b, n, h, hd).transpose(0, 2, 1, 3)
    dq, dk, dv = _dispatch_bwd((q, k, v, o_h, l, m), do_h, 1024)
    dqkv = jnp.stack([dq, dk, dv], axis=0).transpose(1, 3, 0, 2, 4).reshape(b, n, 3 * d)
    return (dqkv,)


flash_qkv_self_attention.defvjp(_fqsa_fwd, _fqsa_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def flash_cross_attention(q, k, v, block_q: int = 512, block_k: int = 1024,
                          block_h: int = 1, variant: str = "v2"):
    """Fused attention: softmax(q k^T / sqrt(hd)) v over the reference axis.

    q: (B, H, Nq, hd); k, v: (B, H, Nk, hd). Returns (B, H, Nq, hd).
    ``block_h`` packs multiple batch*head slices per grid cell (single-KV-pass
    kernel only; silently 1 otherwise). ``variant`` selects the kernel
    generation ("v2" = production, "v1" = round-1 fallback; see
    PERFORMANCE.md for the measured difference).
    """
    o, _, _ = _flash_fwd(q, k, v, block_q=block_q, block_k=block_k,
                         block_h=block_h, variant=variant)
    return o


def _dispatch_bwd(residuals, do, block_k: int):
    """Pallas backward everywhere: the single-KV-block kernel for the
    backbone regime, the multi-KV kernel for long-KV shapes (decoder
    cross-attention). ``_bwd_xla`` remains the context-parallel backward
    (it consumes GLOBAL softmax stats per shard, ops/context_parallel.py)."""
    q, k, v, o, l, m = residuals
    if k.shape[2] <= 2048:
        return _bwd_pallas_single(q, k, v, o, do, l, m)
    return _bwd_pallas_multi(q, k, v, o, do, l, m, block_k=1024)


def _fca_fwd(q, k, v, block_q, block_k, block_h, variant):
    o, l, m = _flash_fwd(q, k, v, block_q=block_q, block_k=block_k,
                         block_h=block_h, variant=variant)
    return o, (q, k, v, o, l, m)


def _fca_bwd(block_q, block_k, block_h, variant, residuals, do):
    return _dispatch_bwd(residuals, do, block_k)


flash_cross_attention.defvjp(_fca_fwd, _fca_bwd)
