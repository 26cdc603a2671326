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
from crossscore_tpu.ops.metrics import abs2psnr, correlation, masked_correlation


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    # exact loop cursor for mid-epoch resume (the reference resumes Lightning's
    # loop state; deriving epoch from step//steps_per_epoch drifts when limits
    # or dataset size change between runs). The train loop resets
    # batch_in_epoch at epoch boundaries via ``state.replace``.
    epoch: jnp.ndarray = struct.field(default_factory=lambda: jnp.zeros((), jnp.int32))
    batch_in_epoch: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.zeros((), jnp.int32)
    )


def create_train_state(params, tx) -> TrainState:
    return TrainState(step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params))


def _item_weights(batch, batch_dim: int):
    """(B,) 0/1 weights excluding loader-padded duplicate items.

    The loader pads the final partial batch by repeating the last item
    (``data/loader.py``) with the true count in ``batch["_valid"]``; the
    reference evaluates each item exactly once, so metrics must not average
    over the padding (reference ``task/core.py:379-393``)."""
    valid = batch.get("_valid")
    if valid is None:
        return None
    return (jnp.arange(batch_dim) < valid).astype(jnp.float32)


def loss_fn(model: CrossScoreNet, params, batch):
    out = model.apply(
        {"params": params},
        batch["query/img"],
        batch.get("reference/cross/imgs"),
    )
    pred = out["score_map_ref_cross"]
    gt = batch["query/score_map"]
    l1 = jnp.abs(pred.astype(jnp.float32) - gt.astype(jnp.float32))
    w = _item_weights(batch, l1.shape[0])
    if w is None:
        loss = l1.mean()
    else:
        per_item = l1.shape[1] * l1.shape[2]
        loss = jnp.sum(l1 * w[:, None, None]) / (jnp.maximum(w.sum(), 1.0) * per_item)
    return loss, (pred, l1, w)


def _metrics(loss, pred, gt, w=None) -> dict:
    if w is None:
        corr = correlation(pred, gt)
    else:
        corr = masked_correlation(pred, gt, w[:, None, None])
    return {
        "loss": loss,
        "loss_cross": loss,
        "psnr_cross": abs2psnr(loss),
        "correlation_cross": corr,
    }


def make_train_step(model: CrossScoreNet, tx) -> Callable:
    def train_step(state: TrainState, batch):
        (loss, (pred, l1, w)), grads = jax.value_and_grad(
            lambda p: loss_fn(model, p, batch), has_aux=True
        )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=params,
            opt_state=opt_state,
            epoch=state.epoch,
            batch_in_epoch=state.batch_in_epoch + 1,
        )
        metrics = _metrics(loss, pred, batch["query/score_map"], w)
        # the prediction rides along so figure/histogram cadences reuse the
        # training forward instead of paying an extra one (reference
        # task/core.py:312-362 reuses training_step outputs the same way)
        metrics["pred"] = pred
        return new_state, metrics

    return train_step


def make_eval_step(model: CrossScoreNet) -> Callable:
    def eval_step(params, batch):
        loss, (pred, l1, w) = loss_fn(model, params, batch)
        return pred, _metrics(loss, pred, batch["query/score_map"], w)

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
