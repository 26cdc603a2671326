"""Benchmark: 518px query score-maps/sec/chip at 8 reference views.

Runs the flagship inference graph (frozen DINOv2-small backbone over 1+8
views, fused Pallas cross-attention decoder, bf16) on the available
accelerator and prints ONE JSON line.

Timing method: an in-graph ``lax.fori_loop`` with a data dependency between
iterations (input perturbed by the loop index), so the measurement is true
device time — host dispatch / tunnel-RPC latency is excluded, and XLA cannot
CSE the iterations away.

``vs_baseline``: the reference repo publishes no throughput numbers
(BASELINE.md). We compare against a documented engineering estimate of the
reference stack on its own hardware: torch fp16 on one A5000, B=8, K=8 —
~1.07 TFLOP per score map (9x DINOv2-small 518px forwards + decoder) at ~30%
tensor-core MFU of 111 TFLOPS peak => ~25 maps/s. vs_baseline = value / 25.
"""

from __future__ import annotations

import json
import time

import numpy as np

import os

BASELINE_MAPS_PER_SEC_A5000 = 25.0
BATCH = int(os.environ.get("BENCH_BATCH", 8))
K_REFS = int(os.environ.get("BENCH_K", 8))
HW = int(os.environ.get("BENCH_HW", 518))
N_ITERS = int(os.environ.get("BENCH_ITERS", 10))
# BENCH_CACHED=1: the cached-reference SERVING operating point — reference
# tokens precomputed (the token cache warm), each map costs 1 query forward +
# the decoder. NOT the headline metric (the reference re-encodes refs per
# item, task/core.py:119-161); reported separately in PERFORMANCE.md.
CACHED = bool(int(os.environ.get("BENCH_CACHED", "0")))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from crossscore_tpu.utils.compilation_cache import enable as enable_compile_cache

    enable_compile_cache()

    from crossscore_tpu.confsys import load_config
    from crossscore_tpu.models import CrossScoreNet, CrossScoreConfig

    cfg = load_config("default_predict")
    mcfg = CrossScoreConfig.from_config(cfg)
    model = CrossScoreNet(mcfg)

    # fresh seed per run: the execution relay memoises identical
    # (program, inputs) dispatches ACROSS processes — a fixed seed would
    # eventually re-time a cached result instead of the device
    rng = np.random.default_rng(time.time_ns())
    query = jnp.asarray(rng.standard_normal((BATCH, HW, HW, 3)), jnp.bfloat16)
    refs = jnp.asarray(rng.standard_normal((BATCH, K_REFS, HW, HW, 3)), jnp.bfloat16)

    # init on small shapes (init weights don't depend on image size)
    params = model.init(
        jax.random.PRNGKey(0), query[:1, :70, :70], refs[:1, :, :70, :70]
    )["params"]

    if CACHED:
        from crossscore_tpu.models.crossscore import make_backbone_encoder

        encode = jax.jit(make_backbone_encoder(mcfg))
        tokens = encode(params, refs.reshape(BATCH * K_REFS, HW, HW, 3))
        tokens = tokens.reshape(BATCH, K_REFS, *tokens.shape[1:])

        @jax.jit
        def loop(query, tokens):
            def body(i, carry):
                q = query * (1.0 + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-8))
                out = model.apply({"params": params}, q, None, ref_tokens=tokens)
                return carry + out["score_map_ref_cross"][0, 0, 0].astype(jnp.float32)

            return jax.lax.fori_loop(0, N_ITERS, body, jnp.float32(0.0))

        args = (query, tokens)
        metric = f"{HW}px score-maps/sec/chip, {K_REFS} refs, WARM token cache (serving)"
    else:

        @jax.jit
        def loop(query, refs):
            def body(i, carry):
                q = query * (1.0 + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-8))
                out = model.apply({"params": params}, q, refs)
                return carry + out["score_map_ref_cross"][0, 0, 0].astype(jnp.float32)

            return jax.lax.fori_loop(0, N_ITERS, body, jnp.float32(0.0))

        args = (query, refs)
        if (HW, K_REFS) == (518, 8):
            metric = "518px query score-maps/sec/chip at 8 ref views"
        else:
            metric = f"{HW}px query score-maps/sec/chip at {K_REFS} ref views"

    # warm up with DIFFERENT input values: the execution relay memoises
    # repeated identical (program, inputs) dispatches in this environment;
    # the returned scalar's host fetch is the synchronisation barrier
    float(loop(args[0] * jnp.bfloat16(0.5), args[1]))
    t0 = time.perf_counter()
    float(loop(*args))
    dt = (time.perf_counter() - t0) / N_ITERS

    maps_per_sec = BATCH / dt
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(maps_per_sec, 2),
                "unit": "maps/s",
                "vs_baseline": round(maps_per_sec / BASELINE_MAPS_PER_SEC_A5000, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
