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
    rng = np.random.default_rng(time.time_ns())  # fresh seed: the relay memoises (program, inputs) across sessions
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
    step_fn = make_train_step(model, tx)

    # in-graph loop of N steps with an iteration-dependent input perturbation
    # (PERFORMANCE.md timing rules: per-dispatch timings are unreliable here)
    @jax.jit
    def loop(state, batch):
        def body(i, st):
            b2 = dict(batch)
            b2["query/img"] = batch["query/img"] * (
                1.0 + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-8)
            )
            st, metrics = step_fn(st, b2)
            return st
        st = jax.lax.fori_loop(0, N_IT, body, state)
        return st.step, st.params["head_fc2"]["kernel"][0, 0]

    t = time.perf_counter()
    jax.block_until_ready(loop(state, batch))
    print(f"compile+warmup: {time.perf_counter()-t:.0f}s", flush=True)
    dts = []
    for mult in (0.75, 1.0):
        b2 = dict(batch)
        b2["query/img"] = batch["query/img"] * jnp.bfloat16(mult)
        t0 = time.perf_counter()
        jax.block_until_ready(loop(state, b2))
        dts.append(time.perf_counter() - t0)
    dt = max(dts) / N_IT
    print(
        f"train step B={batch_size} K={k} {hw}px: {dt*1e3:.0f} ms/step "
        f"(runs {dts[0]*1e3:.0f}/{dts[1]*1e3:.0f}ms over {N_IT} steps)",
        flush=True,
    )


if __name__ == "__main__":
    main()
