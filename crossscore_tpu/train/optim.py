"""Optimizer / LR-schedule assembly.

Reference semantics (``task/core.py:486-513``): AdamW(lr=5e-4) over
requires-grad params only (backbone + PE frozen), StepLR(step_size=100,
gamma=0.5) stepped per epoch. Here: optax.adamw with a trainable-mask
(frozen leaves get zero updates and are excluded from Adam state) and an
epoch-step schedule computed from steps_per_epoch.
"""

from __future__ import annotations

from typing import Callable

import jax
import optax

from crossscore_tpu.models.crossscore import trainable_mask


def step_lr_schedule(
    base_lr: float,
    step_size: int,
    gamma: float,
    steps_per_epoch: int,
    interval: str = "epoch",
) -> Callable[[int], float]:
    """StepLR: lr = base * gamma^(t // step_size), t in epochs or steps."""
    if interval == "epoch":
        period = max(1, step_size * max(1, steps_per_epoch))
    elif interval == "step":
        period = max(1, step_size)
    else:
        raise ValueError(f"Unknown lr step_interval {interval!r}")

    def schedule(count):
        return base_lr * (gamma ** (count // period))

    return schedule


def make_optimizer(
    cfg, params, steps_per_epoch: int
) -> tuple[optax.GradientTransformation, Callable[[int], float]]:
    """Build the masked AdamW + StepLR optimizer from a composed config.

    ``steps_per_epoch`` must be the number of optimiser steps actually taken
    per epoch (after any limit_train_batches/overfit truncation) so the
    epoch-interval schedule decays at the right wall-clock point."""
    opt_cfg = cfg.trainer.optimizer
    if opt_cfg.type != "AdamW":
        raise NotImplementedError(f"optimizer {opt_cfg.type}")
    sched_cfg = cfg.trainer.lr_scheduler
    if sched_cfg.type != "StepLR":
        raise NotImplementedError(f"lr_scheduler {sched_cfg.type}")

    schedule = step_lr_schedule(
        base_lr=float(opt_cfg.lr),
        step_size=sched_cfg.step_size,
        gamma=sched_cfg.gamma,
        steps_per_epoch=steps_per_epoch,
        interval=sched_cfg.step_interval,
    )
    # torch.optim.AdamW defaults (the reference passes only lr,
    # task/core.py:495-498): betas (0.9, 0.999), eps 1e-8, weight_decay 1e-2
    weight_decay = float(opt_cfg.get("weight_decay", 1e-2))
    pe_trainable = bool(cfg.model.pos_enc.multi_view.get("req_grad", False))
    mask = trainable_mask(params, pe_trainable=pe_trainable)
    labels = jax.tree_util.tree_map(lambda t: "train" if t else "freeze", mask)
    tx = optax.multi_transform(
        {
            "train": optax.adamw(learning_rate=schedule, weight_decay=weight_decay),
            "freeze": optax.set_to_zero(),
        },
        labels,
    )
    return tx, schedule
