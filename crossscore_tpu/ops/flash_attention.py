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
    with block_q half the query axis (~700 for 1370 tokens: 8.97ms vs 9.49 at
    512) and two batch*head slices per grid cell when the score tiles fit VMEM
    (52.0 -> 53.1 maps/s end to end). The q axis only needs sublane (8)
    granularity — lanes are the last (head) dim."""
    if nk <= 2048:
        bk = _ceil_to(nk, 128)
        if nq >= 1024:
            bq = _ceil_to((nq + 1) // 2, 8)  # two q blocks, e.g. 688 for 1370
        else:
            bq = _ceil_to(nq, 8)  # single q block, no padding waste
        bh = 2 if bq * bk * 8 <= 12 * 1024 * 1024 else 1  # 2 fp32 score tiles
        import os

        bh = int(os.environ.get("CROSSSCORE_FLASH_BLOCK_H", bh))  # tuning knob
        return bq, bk, bh
    return (512 if nq >= 512 else _ceil_to(nq, 128)), 1024, 1


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
        if exp_bf16:
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
               variant: str = "v1"):
    """q: (B, H, Nq, hd); k, v: (B, H, Nk, hd) -> (o, l, m) with padding stripped."""
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
        exp_bf16 = "bf16" in variant
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
            kernel = functools.partial(_fwd_kernel_v2, c1=sm_scale * LOG2E, hd=hd)
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


def _bwd_xla(residuals, do, *, block_k: int):
    """Flash-style backward in plain XLA: scan over KV blocks, recomputing
    score tiles. Memory per step is O(Nq x block_k); the full score matrix is
    never materialised."""
    q, k, v, o, l, m = residuals
    b, h, nq, hd = q.shape
    nk = k.shape[2]
    sm_scale = 1.0 / (hd ** 0.5)

    nk_p = _ceil_to(nk, block_k)
    pad = nk_p - nk
    kf = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
    vf = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
    n_blocks = nk_p // block_k

    qf32 = q.astype(jnp.float32)
    dof32 = do.astype(jnp.float32)
    # D_i = sum_d o_i * do_i  (rowwise)
    delta = jnp.sum(o.astype(jnp.float32) * dof32, axis=-1)  # (B,H,Nq)
    l_safe = jnp.where(l == 0.0, 1.0, l)

    kb = kf.reshape(b, h, n_blocks, block_k, hd).transpose(2, 0, 1, 3, 4)
    vb = vf.reshape(b, h, n_blocks, block_k, hd).transpose(2, 0, 1, 3, 4)
    col_base = jnp.arange(n_blocks) * block_k

    def step(dq_acc, xs):
        kj, vj, c0 = xs  # (B,H,bk,hd) x2, scalar
        s = jnp.einsum("bhqd,bhkd->bhqk", qf32, kj.astype(jnp.float32),
                       preferred_element_type=jnp.float32) * sm_scale
        col_ids = c0 + jnp.arange(block_k)
        valid = (col_ids < nk)[None, None, None, :]
        p = jnp.where(valid, jnp.exp(s - m[..., None]) / l_safe[..., None], 0.0)
        dp = jnp.einsum("bhqd,bhkd->bhqk", dof32, vj.astype(jnp.float32),
                        preferred_element_type=jnp.float32)
        ds = p * (dp - delta[..., None]) * sm_scale
        dq_acc = dq_acc + jnp.einsum("bhqk,bhkd->bhqd", ds, kj.astype(jnp.float32),
                                     preferred_element_type=jnp.float32)
        dk_j = jnp.einsum("bhqk,bhqd->bhkd", ds, qf32, preferred_element_type=jnp.float32)
        dv_j = jnp.einsum("bhqk,bhqd->bhkd", p, dof32, preferred_element_type=jnp.float32)
        return dq_acc, (dk_j, dv_j)

    dq0 = jnp.zeros((b, h, nq, hd), jnp.float32)
    dq, (dk_b, dv_b) = jax.lax.scan(step, dq0, (kb, vb, col_base))
    dk = dk_b.transpose(1, 2, 0, 3, 4).reshape(b, h, nk_p, hd)[:, :, :nk]
    dv = dv_b.transpose(1, 2, 0, 3, 4).reshape(b, h, nk_p, hd)[:, :, :nk]
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


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


def _fca_fwd(q, k, v, block_q, block_k, block_h, variant):
    o, l, m = _flash_fwd(q, k, v, block_q=block_q, block_k=block_k,
                         block_h=block_h, variant=variant)
    return o, (q, k, v, o, l, m)


def _fca_bwd(block_q, block_k, block_h, variant, residuals, do):
    return _bwd_xla(residuals, do, block_k=block_k)


flash_cross_attention.defvjp(_fca_fwd, _fca_bwd)
