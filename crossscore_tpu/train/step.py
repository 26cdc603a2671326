"""Jitted train / eval steps.

The whole step — forward (incl. frozen backbone), L1 loss, backward, masked
AdamW update — is ONE XLA graph. On a multi-device mesh, batch arrays arrive
sharded on the ``data`` axis and params replicated (or TP-sharded); XLA
inserts the gradient all-reduce over ICI. No explicit collectives here.

Loss parity: reference ``task/core.py:277-293`` — mean |pred - gt| over the
(B, H, W) score maps (single 'cross' term).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from crossscore_tpu.models.crossscore import CrossScoreNet
from crossscore_tpu.ops.metrics import abs2psnr, correlation


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any


def create_train_state(params, tx) -> TrainState:
    return TrainState(step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params))


def loss_fn(model: CrossScoreNet, params, batch):
    out = model.apply(
        {"params": params},
        batch["query/img"],
        batch.get("reference/cross/imgs"),
    )
    pred = out["score_map_ref_cross"]
    gt = batch["query/score_map"]
    l1 = jnp.abs(pred.astype(jnp.float32) - gt.astype(jnp.float32))
    loss = l1.mean()
    return loss, (pred, l1)


def _metrics(loss, pred, gt) -> dict:
    return {
        "loss": loss,
        "loss_cross": loss,
        "psnr_cross": abs2psnr(loss),
        "correlation_cross": correlation(pred, gt),
    }


def make_train_step(model: CrossScoreNet, tx) -> Callable:
    def train_step(state: TrainState, batch):
        (loss, (pred, l1)), grads = jax.value_and_grad(
            lambda p: loss_fn(model, p, batch), has_aux=True
        )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=params, opt_state=opt_state)
        return new_state, _metrics(loss, pred, batch["query/score_map"])

    return train_step


def make_eval_step(model: CrossScoreNet) -> Callable:
    def eval_step(params, batch):
        loss, (pred, l1) = loss_fn(model, params, batch)
        return pred, _metrics(loss, pred, batch["query/score_map"])

    return eval_step


def make_predict_step(model: CrossScoreNet, need_attn_weights: bool = False, head_id: int = 0):
    def predict_step(params, query_img, ref_imgs):
        return model.apply(
            {"params": params},
            query_img,
            ref_imgs,
            need_attn_weights=need_attn_weights,
            need_attn_weights_head_id=head_id,
        )

    return predict_step
