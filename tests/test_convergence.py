"""Gradient-path convergence: overfitting one batch must drive the
train-batch correlation toward 1 (the reference's ``overfit_batches`` sanity
mode, ``config/default.yaml:27``). Short smoke runs only prove the step
executes; this proves it LEARNS. The on-chip analogue at the full model size
is tools/overfit_convergence.py (COMPONENTS.md round-3)."""

import jax
import jax.numpy as jnp
import numpy as np

from crossscore_tpu.confsys import load_config
from crossscore_tpu.models import CrossScoreNet, CrossScoreConfig
from crossscore_tpu.train import make_optimizer, make_train_step, create_train_state


def test_overfit_one_batch_correlation_rises():
    cfg = load_config(
        "default",
        overrides=[
            "model.backbone.preset=dinov2-test",
            "model.tpu.compute_dtype=float32",
            "trainer.optimizer.lr=1e-3",
            "trainer.lr_scheduler.step_size=100000",
        ],
    )
    model = CrossScoreNet(CrossScoreConfig.from_config(cfg))
    rng = np.random.default_rng(0)
    b, k, hw = 2, 2, 56
    # block-structured target in [0,1] (the synthetic ssim-map shape)
    target = np.clip(
        np.kron(rng.random((b, 7, 7)) * 1.6 - 0.8, np.ones((8, 8))), 0, 1
    )[:, :hw, :hw]
    batch = {
        "query/img": jnp.asarray(rng.standard_normal((b, hw, hw, 3)), jnp.float32),
        "reference/cross/imgs": jnp.asarray(
            rng.standard_normal((b, k, hw, hw, 3)), jnp.float32
        ),
        "query/score_map": jnp.asarray(target, jnp.float32),
    }
    params = model.init(
        jax.random.PRNGKey(0), batch["query/img"][:1], batch["reference/cross/imgs"][:1]
    )["params"]
    tx, _ = make_optimizer(cfg, params, steps_per_epoch=1)
    state = create_train_state(params, tx)
    step = jax.jit(make_train_step(model, tx), donate_argnums=(0,))

    first_loss = None
    for i in range(301):
        state, m = step(state, batch)
        if first_loss is None:
            first_loss = float(m["loss"])
    final_loss = float(m["loss"])
    final_corr = float(m["correlation_cross"])
    assert final_loss < 0.35 * first_loss, (first_loss, final_loss)
    assert final_corr > 0.85, final_corr
