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
    import functools
    import os

    vmem_kib = os.environ.get("SCOPED_VMEM_KIB")  # forwarding works: CLAUDE.md
    jit_kw = (
        {"compiler_options": {"xla_tpu_scoped_vmem_limit_kib": vmem_kib}}
        if vmem_kib else {}
    )

    @functools.partial(jax.jit, **jit_kw)
    def loop_state(state, batch):
        # returns the FULL updated state so successive timed dispatches chain
        # distinct state inputs (memoisation-proof)
        def body(i, st):
            b2 = dict(batch)
            b2["query/img"] = batch["query/img"] * (
                1.0 + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-8)
            )
            return step_fn(st, b2)[0]

        st = jax.lax.fori_loop(0, N_IT, body, state)
        # the scalar is the timing anchor: block_until_ready on a large
        # REMOTE pytree does not synchronise through the tunnel — only a
        # host FETCH of a (small) result does
        return st, st.params["head_fc2"]["kernel"][0, 0]

    t = time.perf_counter()
    float(loop_state(state, batch)[1])
    print(f"compile+warmup: {time.perf_counter()-t:.0f}s", flush=True)
    # EVERY input (state included, via one real update) differs per timed
    # dispatch: readings of a few ms for a 144-image train loop have been
    # observed when only one operand varies — the relay's memoisation does
    # not appear to hash large device buffers.
    state = jax.block_until_ready(jax.jit(step_fn)(state, batch)[0])
    dts = []
    for mult in (0.6, 0.75, 0.9, 1.0):
        b2 = {k2: v * jnp.asarray(mult, v.dtype) for k2, v in batch.items()}
        t0 = time.perf_counter()
        state, anchor = loop_state(state, b2)
        float(anchor)  # host fetch = the only reliable synchronisation
        dts.append(time.perf_counter() - t0)
    dt = max(dts) / N_IT
    floor_s = N_IT * batch_size * (1 + k) * 0.0005  # >=0.5 ms per 518px image
    if max(dts) < floor_s:
        print(f"WARNING: reading {max(dts)*1e3:.0f}ms < sanity floor "
              f"{floor_s*1e3:.0f}ms — likely memoised, do not trust")
    print(
        f"train step B={batch_size} K={k} {hw}px: {dt*1e3:.0f} ms/step "
        f"(runs {dts[0]*1e3:.0f}/{dts[1]*1e3:.0f}ms over {N_IT} steps)",
        flush=True,
    )


if __name__ == "__main__":
    main()
