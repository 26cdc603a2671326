"""MXU-only probe: what would a no-lane-pad cross-attention backward buy?

The decoder's head dim is 48 (=384/8); the layout-native kernels zero-pad it
to 64 so two heads fill a 128-lane block (ops/flash_attention.py). In the
BACKWARD (27 of the 67.5 ms token train step, PERFORMANCE.md r3) every one of
the five matmuls per (head, q-chunk, kv-block) has one 64-wide dim of which
only 48 lanes carry data — nominally 33% wasted arithmetic.

This probe isolates the MXU question from the softmax/VPU bookkeeping: a
minimal Pallas kernel with the backward's exact grid, block specs, and
five-matmul pattern, but no transcendentals, parameterised by the per-head
slice width:

  hd64   — the current padded geometry (the backward's MXU floor)
  hd48   — the hypothetical no-pad geometry (2x48=96 of 128 lanes per block;
           a true 48-pack can't tile 128-lane blocks at all since 48 does not
           divide 128 — heads would straddle lane blocks — so this is the
           most charitable stand-in)
  hd128  — one fused 128-lane contraction per q-chunk doing both heads' FLOP
           volume in a single dot (mathematically wrong for attention, but
           the MXU upper bound: tells us whether the array is
           contraction-starved at 64)

Decision rule (VERDICT r3 item 5): if time(hd48) is not >5% of the token
train step (3.4 ms at B=24) below time(hd64), CLOSE the no-pad idea.

Usage: python tools/lane_pad_probe.py [b] [k_views]
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

import numpy as np

N_IT = 8
LANES = 128


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from crossscore_tpu.utils.compilation_cache import enable

    enable()
    from crossscore_tpu.ops.flash_attention import _ceil_to

    if "--cpu" in sys.argv:  # interpret-mode smoke at tiny shapes
        sys.argv.remove("--cpu")
        jax.config.update("jax_platforms", "cpu")
        b, k_views, nq, block_k, qc_budget = 1, 1, 64, 128, 300_000
        nk = 2 * block_k
    else:
        b = int(sys.argv[1]) if len(sys.argv) > 1 else 24
        k_views = int(sys.argv[2]) if len(sys.argv) > 2 else 5
        nq = 1369
        nk = k_views * nq
        block_k = 512
        qc_budget = 300_000

    # same chunking as _bwd_cross_ln_pallas
    q_chunks = max(1, -(-nq * block_k // qc_budget))
    cq = _ceil_to(-(-nq // q_chunks), 8)
    nq_p = cq * q_chunks
    nk_p = _ceil_to(nk, block_k)

    def probe_kernel(qp_ref, dop_ref, kp_ref, vp_ref, dq_ref, dk_ref, dv_ref,
                     dq_scr, *, hd_s: int, stride: int, q_chunks: int, cq: int):
        kvi = pl.program_id(1)

        @pl.when(kvi == 0)
        def _init():
            dq_scr[...] = jnp.zeros_like(dq_scr)

        n_slices = 1 if hd_s == LANES else 2  # 2 heads per 128-lane block
        c1 = 0.1442695
        for j in range(n_slices):
            lane = slice(j * stride, j * stride + hd_s)
            k = kp_ref[0][:, lane]
            v = vp_ref[0][:, lane]
            dk_acc = None
            dv_acc = None
            for qc in range(q_chunks):
                sl = slice(qc * cq, (qc + 1) * cq)
                q = qp_ref[0][sl, lane]
                do = dop_ref[0][sl, lane]
                s = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # matmul 1 (QK^T recompute)
                dp = jax.lax.dot_general(
                    do, v, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # matmul 2 (dP)
                pb = (s * c1).astype(k.dtype)  # stands in for exp2(...)
                dsb = (dp * c1).astype(k.dtype)
                dq_scr[sl, lane] += jax.lax.dot(
                    dsb, k, preferred_element_type=jnp.float32
                )  # matmul 3 (dQ)
                dk_c = jax.lax.dot_general(
                    dsb, q, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # matmul 4 (dK)
                dv_c = jax.lax.dot_general(
                    pb, do, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # matmul 5 (dV)
                dk_acc = dk_c if dk_acc is None else dk_acc + dk_c
                dv_acc = dv_c if dv_acc is None else dv_acc + dv_c
            dk_ref[0, :, lane] = dk_acc.astype(dk_ref.dtype)
            dv_ref[0, :, lane] = dv_acc.astype(dv_ref.dtype)

        @pl.when(kvi == pl.num_programs(1) - 1)
        def _store():
            dq_ref[0] = dq_scr[...].astype(dq_ref.dtype)

    @functools.partial(jax.jit, static_argnames=("hd_s", "stride"))
    def run(qp, dop, kp, vp, hd_s: int, stride: int):
        kernel = functools.partial(
            probe_kernel, hd_s=hd_s, stride=stride, q_chunks=q_chunks, cq=cq
        )
        return pl.pallas_call(
            kernel,
            grid=(b, nk_p // block_k),
            in_specs=[
                pl.BlockSpec((1, nq_p, LANES), lambda b_, ki: (b_, 0, 0)),
                pl.BlockSpec((1, nq_p, LANES), lambda b_, ki: (b_, 0, 0)),
                pl.BlockSpec((1, block_k, LANES), lambda b_, ki: (b_, ki, 0)),
                pl.BlockSpec((1, block_k, LANES), lambda b_, ki: (b_, ki, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, nq_p, LANES), lambda b_, ki: (b_, 0, 0)),
                pl.BlockSpec((1, block_k, LANES), lambda b_, ki: (b_, ki, 0)),
                pl.BlockSpec((1, block_k, LANES), lambda b_, ki: (b_, ki, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, nq_p, LANES), qp.dtype),
                jax.ShapeDtypeStruct((b, nk_p, LANES), kp.dtype),
                jax.ShapeDtypeStruct((b, nk_p, LANES), vp.dtype),
            ],
            scratch_shapes=[pltpu.VMEM((nq_p, LANES), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            interpret=jax.default_backend() == "cpu",
        )(qp, dop, kp, vp)

    rng = np.random.default_rng(time.time_ns())
    qp = jnp.asarray(rng.standard_normal((b, nq_p, LANES), dtype=np.float32),
                     jnp.bfloat16)
    dop = jnp.asarray(rng.standard_normal((b, nq_p, LANES), dtype=np.float32),
                      jnp.bfloat16)
    kp = jnp.asarray(rng.standard_normal((b, nk_p, LANES), dtype=np.float32),
                     jnp.bfloat16)
    vp = jnp.asarray(rng.standard_normal((b, nk_p, LANES), dtype=np.float32),
                     jnp.bfloat16)

    print(f"probe: b={b} nq_p={nq_p} nk_p={nk_p} cq={cq} q_chunks={q_chunks} "
          f"bk={block_k} (one lane block of the 4 in the real bwd; scale x4 "
          f"per layer, x2 layers for step impact)", flush=True)

    results = {}
    # hd48_off64: 48 useful lanes sliced at the CURRENT 64-stride packing —
    # the zero-diff implementation (no repack, no forward change; pad-lane
    # cotangents are discarded by HeadLaneProj's jnp.pad VJP anyway)
    for name, hd_s, stride in [("hd64_current", 64, 64),
                               ("hd48_nopad", 48, 48),
                               ("hd48_off64", 48, 64),
                               ("hd128_fused", 128, 128)]:
        @jax.jit
        def loop(qp, dop, kp, vp):
            def body(i, acc):
                scale = 1.0 + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-8)
                dq, dk, dv = run(qp * scale, dop, kp, vp, hd_s=hd_s,
                                 stride=stride)
                return acc + dq[0, 0, 0].astype(jnp.float32)

            return jax.lax.fori_loop(0, N_IT, body, jnp.float32(0.0))

        try:
            float(loop(qp * jnp.bfloat16(0.5), dop, kp, vp))  # warmup
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            continue
        t0 = time.perf_counter()
        float(loop(qp, dop, kp, vp))
        dt = (time.perf_counter() - t0) / N_IT
        if dt < 0.5e-3:
            print("  WARNING: below sanity floor — memoised?", flush=True)
        # real-FLOP rate: count hd=48 useful work for every variant
        flops = 10 * b * 2 * nq_p * nk_p * 48  # 5 matmuls x 2 heads this block
        results[name] = dt
        print(f"{name:14s} {dt * 1e3:7.2f} ms ({flops / dt / 1e12:5.1f} "
              f"useful TFLOP/s)", flush=True)

    d64 = results.get("hd64_current")
    for variant in ("hd48_nopad", "hd48_off64"):
        if d64 is None or variant not in results:
            continue
        d48 = results[variant]
        # this probe covers ONE of the backward's 4 lane blocks (d_model 512
        # packed = 4x128); per-step impact = diff x 4 blocks x 2 layers
        step_gain_ms = (d64 - d48) * 4 * 2 * 1e3
        print(f"\n{variant} saving: {(d64 - d48) * 1e3:.2f} ms/block-call -> "
              f"~{step_gain_ms:.2f} ms/step (2 layers, 4 lane blocks) "
              f"= {step_gain_ms / 67.5 * 100:.1f}% of the 67.5 ms token step",
              flush=True)


if __name__ == "__main__":
    main()
