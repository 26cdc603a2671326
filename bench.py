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

    @jax.jit
    def loop(query, refs):
        def body(i, carry):
            q = query * (1.0 + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-8))
            out = model.apply({"params": params}, q, refs)
            return carry + out["score_map_ref_cross"][0, 0, 0].astype(jnp.float32)

        return jax.lax.fori_loop(0, N_ITERS, body, jnp.float32(0.0))

    # warm up with DIFFERENT input values: the execution relay memoises
    # repeated identical (program, inputs) dispatches in this environment
    loop(query * jnp.bfloat16(0.5), refs).block_until_ready()
    t0 = time.perf_counter()
    loop(query, refs).block_until_ready()
    dt = (time.perf_counter() - t0) / N_ITERS

    maps_per_sec = BATCH / dt
    print(
        json.dumps(
            {
                "metric": "518px query score-maps/sec/chip at 8 ref views",
                "value": round(maps_per_sec, 2),
                "unit": "maps/s",
                "vs_baseline": round(maps_per_sec / BASELINE_MAPS_PER_SEC_A5000, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
