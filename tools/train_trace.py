"""Capture a device profile of the FULL training step (forward incl. frozen
backbone, L1 loss, backward, masked AdamW) at the production operating point
(B=24, K=5, 518px, bf16) and print the per-op-family time breakdown.

This is the round-2 forward playbook (tools/trace_breakdown.py: trace ->
find re-tiles / fusion-boundary waste -> layout-native rewrite) applied to
the training graph, which VERDICT r2 flagged as un-traced (~29% MFU vs the
forward's ~55%). Reference hot loop: ``task/core.py:119-161`` (144-image
frozen forward) + ``model/customised_transformer/transformer.py:195-205``.

Usage: python tools/train_trace.py [batch] [k] [trace_dir] [tokens]
A 4th arg of ``tokens`` traces the TOKEN-SPACE step instead (decoder-only
graph over precomputed frozen-backbone tokens, data/token_train.py) — the
fast-path step measured at 80.4 ms by BENCH_TRAIN=1 BENCH_TOKENS=1.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

import numpy as np

from trace_breakdown import analyse  # same XSpace parsing


def capture(trace_dir: str, batch_size: int, k: int, tokens: bool = False) -> None:
    import jax
    import jax.numpy as jnp

    from crossscore_tpu.utils.compilation_cache import enable

    enable()
    from crossscore_tpu.confsys import load_config
    from crossscore_tpu.models import CrossScoreNet, CrossScoreConfig
    from crossscore_tpu.train import make_optimizer, make_train_step, create_train_state

    hw = 518
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
    step_fn = jax.jit(make_train_step(model, tx))

    def anchor(metrics):
        # host fetch of a scalar is the only reliable sync through the tunnel
        return float(metrics["loss"])

    state2, m = step_fn(state, batch)
    anchor(m)
    with jax.profiler.trace(trace_dir):
        st = state
        for mult in (0.7, 0.8, 0.9):
            b2 = {k2: v * jnp.asarray(mult, v.dtype) for k2, v in batch.items()}
            st, m = step_fn(st, b2)
            anchor(m)
    print(f"train-step trace captured -> {trace_dir}", flush=True)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    trace_dir = sys.argv[3] if len(sys.argv) > 3 else "/tmp/traintrace"
    tokens = len(sys.argv) > 4 and sys.argv[4] == "tokens"
    capture(trace_dir, batch, k, tokens=tokens)
    analyse(trace_dir)


if __name__ == "__main__":
    main()
