"""Train-step wall time at the reference's production operating point.

B=24, K=5, 518px crops, bf16 — forward (frozen backbone) + backward + masked
AdamW, one jitted graph. Round-1 measured ~0.58 s/step on one v5e chip.

Usage: python tools/train_microbench.py [batch] [k]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

import numpy as np

N_IT = 3


def main():
    import jax
    import jax.numpy as jnp

    from crossscore_tpu.utils.compilation_cache import enable

    enable()
    from crossscore_tpu.confsys import load_config
    from crossscore_tpu.models import CrossScoreNet, CrossScoreConfig
    from crossscore_tpu.train import make_optimizer, make_train_step, create_train_state

    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    hw = 518

    cfg = load_config("default")
    mcfg = CrossScoreConfig.from_config(cfg)
    model = CrossScoreNet(mcfg)
    rng = np.random.default_rng(0)
    batch = {
        "query/img": jnp.asarray(rng.standard_normal((batch_size, hw, hw, 3)), jnp.bfloat16),
        "reference/cross/imgs": jnp.asarray(
            rng.standard_normal((batch_size, k, hw, hw, 3)), jnp.bfloat16
        ),
        "query/score_map": jnp.asarray(rng.random((batch_size, hw, hw)), jnp.float32),
    }
    params = model.init(
        jax.random.PRNGKey(0),
        batch["query/img"][:1, :70, :70],
        batch["reference/cross/imgs"][:1, :, :70, :70],
    )["params"]
    tx, _ = make_optimizer(cfg, params, steps_per_epoch=100)
    state = create_train_state(params, tx)
    step = jax.jit(make_train_step(model, tx))

    # timed via repeated full steps (state carries the data dependency); the
    # first two results are discarded (compile + relay memoisation hazard)
    t = time.perf_counter()
    state, metrics = step(state, batch)
    jax.block_until_ready(metrics["loss"])
    print(f"compile+first step: {time.perf_counter()-t:.0f}s", flush=True)
    dts = []
    for i in range(N_IT):
        t0 = time.perf_counter()
        state, metrics = step(state, batch)
        jax.block_until_ready(metrics["loss"])
        dts.append(time.perf_counter() - t0)
    print(
        f"train step B={batch_size} K={k} {hw}px: "
        + " ".join(f"{d*1e3:.0f}ms" for d in dts)
        + f"  (median {sorted(dts)[len(dts)//2]*1e3:.0f} ms)",
        flush=True,
    )


if __name__ == "__main__":
    main()
