"""Benchmark: 518px query score-maps/sec/chip at 8 reference views.

Runs the flagship inference graph (frozen DINOv2-small backbone over 1+8
views, fused Pallas cross-attention decoder, bf16) on the available
accelerator and prints ONE JSON line. The default run ALSO measures the two
other operating points and embeds them under ``"extras"`` in that same line,
so the driver captures all three:

- ``serving_cached``: the warm-token-cache serving point (reference tokens
  precomputed; each map costs 1 query forward + the decoder). NOT the
  headline metric — the reference re-encodes refs per item
  (task/core.py:119-161) — but the production serving number.
- ``train_step``: the training step at the reference's production operating
  point (B=24, K=5, 518px crops, bf16 — config/data/combined_training.yaml):
  forward incl. frozen backbone, L1 loss, backward, masked AdamW, one jitted
  graph.

Single-mode runs for tooling: ``BENCH_CACHED=1`` / ``BENCH_TRAIN=1`` print
just that measurement; ``BENCH_EXTRAS=0`` restricts the default run to the
headline.

Timing method: an in-graph ``lax.fori_loop`` with a data dependency between
iterations (input perturbed by the loop index), so the measurement is true
device time — host dispatch / tunnel-RPC latency is excluded, and XLA cannot
CSE the iterations away.

``vs_baseline``: the reference repo publishes no throughput numbers
(BASELINE.md). We compare against a documented engineering estimate of the
reference stack on its own hardware: torch fp16 on one A5000, B=8, K=8 —
~1.07 TFLOP per score map (9x DINOv2-small 518px forwards + decoder) at ~30%
tensor-core MFU of 111 TFLOPS peak => ~25 maps/s. vs_baseline = value / 25.
The train-step baseline uses the same discipline: ~17.5 TFLOP/step /
(0.30 * 111 TFLOP/s) ≈ 525 ms/step.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_MAPS_PER_SEC_A5000 = 25.0
BASELINE_TRAIN_MS_A5000 = 525.0
BATCH = int(os.environ.get("BENCH_BATCH", 8))
K_REFS = int(os.environ.get("BENCH_K", 8))
HW = int(os.environ.get("BENCH_HW", 518))
N_ITERS = int(os.environ.get("BENCH_ITERS", 10))
CACHED = bool(int(os.environ.get("BENCH_CACHED", "0")))
TRAIN = bool(int(os.environ.get("BENCH_TRAIN", "0")))
# BENCH_TRAIN=1 BENCH_TOKENS=1: the TOKEN-SPACE train step (opt-in
# this_main.token_space_train — decoder-only graph, data/token_train.py);
# reported separately from the parity-semantics train number.
TOKENS = bool(int(os.environ.get("BENCH_TOKENS", "0")))
EXTRAS = bool(int(os.environ.get("BENCH_EXTRAS", "1")))


def measure_train(tokens: bool = False) -> dict:
    """Train-step time: B=24 K=5 518px bf16, chained states and a host scalar
    fetch per timed dispatch (the memoisation-proof discipline from
    tools/train_microbench.py / PERFORMANCE.md). ``tokens=True`` times the
    token-space step instead: (1+K) x (B, 1369, 384) precomputed-token inputs
    through the decoder-only graph (data/token_train.py)."""
    import jax
    import jax.numpy as jnp

    from crossscore_tpu.confsys import load_config
    from crossscore_tpu.models import CrossScoreNet, CrossScoreConfig
    from crossscore_tpu.train import make_optimizer, make_train_step, create_train_state

    batch_size = int(os.environ.get("BENCH_TRAIN_BATCH", 24))
    k = int(os.environ.get("BENCH_TRAIN_K", 5))
    hw = HW
    n_it = max(2, N_ITERS // 3)

    cfg = load_config("default")
    mcfg = CrossScoreConfig.from_config(cfg)
    model = CrossScoreNet(mcfg)
    rng = np.random.default_rng(time.time_ns())
    if tokens:
        n_patch = (hw // mcfg.patch_size) ** 2
        d = mcfg.backbone.hidden_size
        batch = {
            "query/tokens": jnp.asarray(
                rng.standard_normal((batch_size, n_patch, d)), jnp.bfloat16
            ),
            "reference/cross/tokens": jnp.asarray(
                rng.standard_normal((batch_size, k, n_patch, d)), jnp.bfloat16
            ),
            "query/score_map": jnp.asarray(rng.random((batch_size, hw, hw)), jnp.float32),
        }
    else:
        batch = {
            "query/img": jnp.asarray(rng.standard_normal((batch_size, hw, hw, 3)), jnp.bfloat16),
            "reference/cross/imgs": jnp.asarray(
                rng.standard_normal((batch_size, k, hw, hw, 3)), jnp.bfloat16
            ),
            "query/score_map": jnp.asarray(rng.random((batch_size, hw, hw)), jnp.float32),
        }
    init_rng = np.random.default_rng(0)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(init_rng.standard_normal((1, 70, 70, 3)), jnp.bfloat16),
        jnp.asarray(init_rng.standard_normal((1, k, 70, 70, 3)), jnp.bfloat16),
    )["params"]
    tx, _ = make_optimizer(cfg, params, steps_per_epoch=100)
    state = create_train_state(params, tx)
    step_fn = make_train_step(model, tx)

    q_key = "query/tokens" if tokens else "query/img"

    @jax.jit
    def loop_state(state, batch):
        def body(i, st):
            b2 = dict(batch)
            b2[q_key] = batch[q_key] * (
                1.0 + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-8)
            )
            return step_fn(st, b2)[0]

        st = jax.lax.fori_loop(0, n_it, body, state)
        return st, st.params["head_fc2"]["kernel"][0, 0]

    state, warm_anchor = loop_state(
        state, {k2: v * jnp.asarray(0.5, v.dtype) for k2, v in batch.items()}
    )
    float(warm_anchor)  # fetch = sync: compile+warmup must finish BEFORE t0
    # chain state + scale every input per timed dispatch (memoisation-proof)
    dts = []
    for mult in (0.8, 1.0):
        b2 = {k2: v * jnp.asarray(mult, v.dtype) for k2, v in batch.items()}
        t0 = time.perf_counter()
        state, anchor = loop_state(state, b2)
        float(anchor)  # host scalar fetch = the only reliable sync
        dts.append(time.perf_counter() - t0)
    dt_ms = max(dts) / n_it * 1e3
    # sanity floor: >=0.5 ms per 518px image through the backbone; the
    # decoder-only token step has no backbone — floor on its two cross layers
    floor_ms = batch_size * 0.4 if tokens else batch_size * (1 + k) * 0.5
    if dt_ms < floor_ms:
        print(
            f"warning: train reading {dt_ms:.0f}ms < sanity floor "
            f"{floor_ms:.0f}ms — likely memoised",
            file=sys.stderr,
        )
    mode = "TOKEN-SPACE train-step" if tokens else "train-step"
    return {
        "metric": f"{mode} ms (B={batch_size}, K={k}, {hw}px, bf16)",
        "value": round(dt_ms, 1),
        "unit": "ms/step",
        "vs_baseline": round(BASELINE_TRAIN_MS_A5000 / dt_ms, 2),
    }


def measure_inference(cached: bool) -> dict:
    """Headline (cached=False) or warm-token-cache serving (cached=True)."""
    import jax
    import jax.numpy as jnp

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

    if cached:
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
    return {
        "metric": metric,
        "value": round(maps_per_sec, 2),
        "unit": "maps/s",
        "vs_baseline": round(maps_per_sec / BASELINE_MAPS_PER_SEC_A5000, 2),
    }


def main() -> None:
    from crossscore_tpu.utils.compilation_cache import enable as enable_compile_cache

    enable_compile_cache()

    if TRAIN:
        print(json.dumps(measure_train(tokens=TOKENS)))
        return
    if CACHED:
        print(json.dumps(measure_inference(cached=True)))
        return

    result = measure_inference(cached=False)
    if EXTRAS:
        extras = {}
        for name, fn in (
            ("serving_cached", lambda: measure_inference(cached=True)),
            ("train_step", measure_train),
            # token-space training: quality-validated equal to pixel crops
            # at matched budgets (PERFORMANCE.md r4 A/B) — the recommended
            # frozen-backbone operating point
            ("train_step_tokens", lambda: measure_train(tokens=True)),
        ):
            try:
                extras[name] = fn()
            except Exception as e:  # never lose the headline to an extra
                print(f"warning: extras[{name}] failed: {e}", file=sys.stderr)
                extras[name] = {"error": str(e)}
        result["extras"] = extras
    print(json.dumps(result))


if __name__ == "__main__":
    main()
