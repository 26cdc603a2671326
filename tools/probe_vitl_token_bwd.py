"""Attribute the ViT-L token-space train step (the r4 13%-MFU row).

PERFORMANCE.md r4 stress table footnotes the 222.5 ms decoder-only train
step at ViT-L 2x-res geometry (B=1, grid 74x74 -> nq=5476 query tokens,
nk=27380 memory tokens, d_model=1024, 8 heads, hd=128) as "attention
backward memory traffic" — the one number in the table with no probe or
trace behind it. This tool decomposes the step IN ONE SESSION (CLAUDE.md
noise rules: single process, A/B against the full step re-measured
alongside):

  1. full token train step (loss + grad + AdamW), the r4 configuration;
  2. value_and_grad only (no optimizer update);
  3. decoder forward only;
  4. the cross-attention BACKWARD kernel alone (2 layers' worth), with a
     (block_k, qc_budget, scoped-vmem) sweep;
  5. the cross-attention FORWARD kernel alone;
and prints analytic MXU / HBM floors for the backward at this geometry so
the gap is attributable: if (4) is near its floor but (1) - (2) or
(2) - 2x(4+5) dominates, the "attention backward" story is wrong.

Floors (b=1, h=8, nq_p, nk_p, hd=128):
  MXU: 10*h*nq*nk*hd FLOPs (5 matmuls of 2*nq*nk*hd) / 197 TFLOP/s bf16;
  HBM: whole-nq q/do blocks re-read per kv-block per lane-block
       (grid (b, nlb, nk_p/bk) with in_specs fetching (1, nq_p, 128) q/do
       at every cell) + kv/dkv streamed once + dq written once.

Usage (real TPU; background it):
    python tools/probe_vitl_token_bwd.py [--trace /tmp/tr]
CPU smoke:  python tools/probe_vitl_token_bwd.py --cpu --g 6 --k 2
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

import numpy as np

N_IT = 4
V5E_BF16_PEAK = 197e12
V5E_HBM_BPS = 819e9


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--preset", default="dinov2-large")
    ap.add_argument("--g", type=int, default=74, help="patch grid side")
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--b", type=int, default=1)
    ap.add_argument("--scoped-vmem-kib", type=int, default=32768)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--trace", default=None,
                    help="capture a jax.profiler trace of the full step here")
    ap.add_argument("--out", default=None, help="write the report JSON here")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from crossscore_tpu.utils.compilation_cache import enable

    enable()
    from crossscore_tpu.confsys import load_config
    from crossscore_tpu.models import CrossScoreNet, CrossScoreConfig
    from crossscore_tpu.ops.flash_attention import (
        _bwd_cross_ln_pallas, _flash_cross_ln_fwd, pick_cross_ln_blocks,
    )
    from crossscore_tpu.train import create_train_state, make_optimizer, make_train_step

    cfg = load_config(
        "default",
        overrides=[f"model.backbone.preset={args.preset}",
                   "model.tpu.remat_backbone=true"],
    )
    mcfg = CrossScoreConfig.from_config(cfg)
    model = CrossScoreNet(mcfg)
    b, g, k = args.b, args.g, args.k
    patch = mcfg.patch_size
    hw = g * patch
    d = mcfg.backbone.hidden_size
    heads = mcfg.decoder_heads
    hd = d // heads
    nq, nk = g * g, k * g * g
    print(f"{args.preset}: grid {g}x{g} nq={nq} nk={nk} d={d} "
          f"heads={heads} hd={hd}", flush=True)

    jit_kw = {}
    if not args.cpu and args.scoped_vmem_kib:
        jit_kw = {"compiler_options": {
            "xla_tpu_scoped_vmem_limit_kib": str(args.scoped_vmem_kib)}}

    rng = np.random.default_rng(time.time_ns())
    init = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(rng.standard_normal((1, 5 * patch, 5 * patch, 3)), jnp.float32),
        jnp.asarray(rng.standard_normal((1, k, 5 * patch, 5 * patch, 3)), jnp.float32),
    )["params"]

    batch = {
        "query/tokens": jnp.asarray(
            rng.standard_normal((b, nq, d), dtype=np.float32), jnp.bfloat16),
        "reference/cross/tokens": jnp.asarray(
            rng.standard_normal((b, k, nq, d), dtype=np.float32), jnp.bfloat16),
        "query/score_map": jnp.asarray(rng.random((b, hw, hw), dtype=np.float32)),
    }

    def timed(fn_loop, feed, label, floor_ms=0.5):
        t0 = time.perf_counter()
        float(fn_loop(*feed))
        compile_s = time.perf_counter() - t0
        dts = []
        for mult in (0.8, 0.9, 1.1):  # never 1.0 (relay memoisation)
            f2 = [jax.tree_util.tree_map(
                lambda v: v * jnp.asarray(mult, v.dtype), x) for x in feed]
            t0 = time.perf_counter()
            float(fn_loop(*f2))
            dts.append(time.perf_counter() - t0)
        ms = max(dts) / N_IT * 1e3
        flag = " (BELOW FLOOR - memoised?)" if ms < floor_ms else ""
        print(f"  {label}: {ms:.1f} ms (compile {compile_s:.0f}s){flag}",
              flush=True)
        return ms

    report = {"geometry": dict(g=g, k=k, b=b, nq=nq, nk=nk, d=d, heads=heads,
                               hd=hd), "components_ms": {}, "bwd_sweep": []}

    # ---- analytic floors for ONE cross-attn backward call ----
    bq0, bk0 = pick_cross_ln_blocks(nq, nk)
    nlb = d // 128
    nk_p = -(-nk // bk0) * bk0
    q_chunks = max(1, -(-nq * bk0 // 300_000))
    cq = -(-(-(-nq // q_chunks)) // 8) * 8
    nq_p = cq * q_chunks
    mxu_ms = 10 * b * heads * nq * nk * hd / V5E_BF16_PEAK * 1e3
    qdo = 2 * b * nlb * (nk_p // bk0) * nq_p * 128 * 2  # q+do re-reads
    kv = 4 * b * nk_p * d * 2                           # k,v read + dk,dv write
    dq = b * nq_p * d * 2
    hbm_ms = (qdo + kv + dq) / V5E_HBM_BPS * 1e3
    print(f"floors (one bwd call, bk={bk0}): MXU {mxu_ms:.2f} ms, "
          f"HBM {hbm_ms:.2f} ms ({(qdo + kv + dq) / 1e6:.0f} MB)", flush=True)
    report["floors"] = {"bwd_mxu_ms": round(mxu_ms, 2),
                        "bwd_hbm_ms": round(hbm_ms, 2),
                        "block_q": bq0, "block_k": bk0}

    # ---- 1. full token train step ----
    tx, _ = make_optimizer(cfg, init, steps_per_epoch=100)
    step_fn = make_train_step(model, tx)
    state = create_train_state(init, tx)

    @functools.partial(jax.jit, **jit_kw)  # no donation: the timed()
    # re-feed rescales and re-uses every operand across calls
    def step_loop(state, batch):
        def body(i, carry):
            st, acc = carry
            b2 = dict(batch)
            b2["query/tokens"] = batch["query/tokens"] * (
                1.0 + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-8))
            st, metrics = step_fn(st, b2)
            return st, acc + metrics["loss"]
        st, acc = jax.lax.fori_loop(0, N_IT, body, (state, jnp.float32(0.0)))
        return acc

    report["components_ms"]["full_step"] = timed(
        step_loop, [state, batch], "full token train step")

    if args.trace and not args.cpu:
        state2 = create_train_state(init, tx)
        jax.profiler.start_trace(args.trace)
        float(step_loop(state2, jax.tree_util.tree_map(
            lambda v: v * jnp.asarray(1.05, v.dtype), batch)))
        jax.profiler.stop_trace()
        print(f"trace written to {args.trace}", flush=True)

    # ---- 2. value_and_grad only ----
    from crossscore_tpu.train.step import loss_fn

    @functools.partial(jax.jit, **jit_kw)
    def grad_loop(params, batch):
        def body(i, acc):
            b2 = dict(batch)
            b2["query/tokens"] = batch["query/tokens"] * (
                1.0 + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-8))
            (loss, _), grads = jax.value_and_grad(
                lambda p: loss_fn(model, p, b2), has_aux=True)(params)
            return acc + loss + jax.tree_util.tree_leaves(grads)[0].astype(
                jnp.float32).ravel()[0]
        return jax.lax.fori_loop(0, N_IT, body, jnp.float32(0.0))

    report["components_ms"]["value_and_grad"] = timed(
        grad_loop, [init, batch], "value_and_grad (no optimizer)")

    # ---- 3. forward only ----
    @functools.partial(jax.jit, **jit_kw)
    def fwd_loop(params, batch):
        def body(i, acc):
            b2 = dict(batch)
            b2["query/tokens"] = batch["query/tokens"] * (
                1.0 + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-8))
            loss, _ = loss_fn(model, params, b2)
            return acc + loss
        return jax.lax.fori_loop(0, N_IT, body, jnp.float32(0.0))

    report["components_ms"]["forward_loss"] = timed(
        fwd_loop, [init, batch], "forward + loss only")

    # ---- 4./5. the cross-attn kernels alone ----
    if 128 % hd or (128 // hd) > 8:
        print(f"hd={hd}: layout-native kernel n/a (smoke geometry); "
              "skipping kernel-alone stages", flush=True)
        _finish(report, args)
        return
    qp = jnp.asarray(rng.standard_normal((b, nq, d)), jnp.bfloat16)
    kp = jnp.asarray(rng.standard_normal((b, nk, d)), jnp.bfloat16)
    vp = jnp.asarray(rng.standard_normal((b, nk, d)), jnp.bfloat16)
    do = jnp.asarray(rng.standard_normal((b, nq, d)), jnp.bfloat16)
    o, l, m = jax.block_until_ready(
        _flash_cross_ln_fwd(qp, kp, vp, heads, hd, block_q=bq0, block_k=bk0))

    @functools.partial(jax.jit, **jit_kw)
    def fwd_kernel_loop(qp, kp, vp):
        def body(i, acc):
            q2 = qp * (1.0 + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-8))
            o2, _, _ = _flash_cross_ln_fwd(q2, kp, vp, heads, hd,
                                           block_q=bq0, block_k=bk0)
            return acc + o2[0, 0, 0].astype(jnp.float32)
        return jax.lax.fori_loop(0, N_IT, body, jnp.float32(0.0))

    report["components_ms"]["cross_fwd_kernel"] = timed(
        fwd_kernel_loop, [qp, kp, vp], "cross fwd kernel (x1)")

    for bk in (512, 896, 1024):
        for budget in (300_000, 420_000, 700_000):
            @functools.partial(jax.jit, **jit_kw)
            def bwd_loop(qp, kp, vp, o, do, l, m, _bk=bk, _bu=budget):
                def body(i, acc):
                    q2 = qp * (1.0 + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-8))
                    dq, dk, dv = _bwd_cross_ln_pallas(
                        q2, kp, vp, o, do, l, m, heads, hd,
                        block_k=_bk, qc_budget=_bu)
                    return acc + dq[0, 0, 0].astype(jnp.float32)
                return jax.lax.fori_loop(0, N_IT, body, jnp.float32(0.0))

            try:
                ms = timed(bwd_loop, [qp, kp, vp, o, do, l, m],
                           f"cross bwd kernel bk={bk} qc={budget // 1000}k")
            except Exception as e:
                print(f"  cross bwd bk={bk} qc={budget // 1000}k: FAILED "
                      f"({type(e).__name__}) {str(e)[:120]}", flush=True)
                ms = None
            report["bwd_sweep"].append(
                {"block_k": bk, "qc_budget": budget, "ms": ms})

    _finish(report, args)


def _finish(report, args):
    c = report["components_ms"]
    print("\nattribution:", flush=True)
    print(f"  optimizer+state overhead = full - vag = "
          f"{c['full_step'] - c['value_and_grad']:.1f} ms", flush=True)
    print(f"  backward-only = vag - fwd = "
          f"{c['value_and_grad'] - c['forward_loss']:.1f} ms", flush=True)
    best = min((r["ms"] for r in report["bwd_sweep"] if r["ms"]), default=None)
    if best:
        print(f"  best isolated cross-bwd x2 layers = {2 * best:.1f} ms "
              f"(floor {2 * report['floors']['bwd_mxu_ms']:.1f} ms MXU)",
              flush=True)
    if args.out:
        Path(args.out).write_text(json.dumps(report, indent=2))
        print(f"report -> {args.out}", flush=True)


if __name__ == "__main__":
    main()
