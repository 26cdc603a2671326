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


def test_token_mode_overfit_matches_pixel_bar():
    """Token-space training must clear the SAME convergence bar as the pixel
    step on an equivalent problem: overfitting one token batch (windows
    sliced from full-image token grids) drives correlation past 0.85. This is
    the learning-dynamics evidence behind the opt-in semantic delta
    (data/token_train.py): full-image attention context does not impair the
    decoder's ability to fit the supervision."""
    from crossscore_tpu.models.crossscore import make_backbone_encoder
    from crossscore_tpu.data.token_train import crop_token_grid

    cfg = load_config(
        "default",
        overrides=[
            "model.backbone.preset=dinov2-test",
            "model.tpu.compute_dtype=float32",
            "trainer.optimizer.lr=1e-3",
            "trainer.lr_scheduler.step_size=100000",
        ],
    )
    mcfg = CrossScoreConfig.from_config(cfg)
    model = CrossScoreNet(mcfg)
    rng = np.random.default_rng(0)
    b, k = 2, 2
    full_hw, crop_hw = 84, 56  # 6x6 full grids, 4x4 windows
    target = np.clip(
        np.kron(rng.random((b, 7, 7)) * 1.6 - 0.8, np.ones((8, 8))), 0, 1
    )[:, :crop_hw, :crop_hw]

    q_full = jnp.asarray(rng.standard_normal((b, full_hw, full_hw, 3)), jnp.float32)
    r_full = jnp.asarray(
        rng.standard_normal((b * k, full_hw, full_hw, 3)), jnp.float32
    )
    params = model.init(
        jax.random.PRNGKey(0), q_full[:1], r_full[None, :k]
    )["params"]
    encode = jax.jit(make_backbone_encoder(mcfg))
    q_tok_full = np.asarray(encode(params, q_full))
    r_tok_full = np.asarray(encode(params, r_full)).reshape(b, k, -1, q_tok_full.shape[-1])

    grid, win = (6, 6), (4, 4)
    q_tok = np.stack([crop_token_grid(q_tok_full[i], grid, (1, 2), win) for i in range(b)])
    r_tok = np.stack(
        [[crop_token_grid(r_tok_full[i, j], grid, (2, 0), win) for j in range(k)]
         for i in range(b)]
    )
    batch = {
        "query/tokens": jnp.asarray(q_tok),
        "reference/cross/tokens": jnp.asarray(r_tok),
        "query/score_map": jnp.asarray(target, jnp.float32),
    }
    tx, _ = make_optimizer(cfg, params, steps_per_epoch=1)
    state = create_train_state(params, tx)
    step = jax.jit(make_train_step(model, tx), donate_argnums=(0,))

    first_loss = None
    for _ in range(301):
        state, m = step(state, batch)
        if first_loss is None:
            first_loss = float(m["loss"])
    assert float(m["loss"]) < 0.35 * first_loss, (first_loss, float(m["loss"]))
    assert float(m["correlation_cross"]) > 0.85, float(m["correlation_cross"])
