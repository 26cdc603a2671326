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


def _weights(batch, shape, patch: int = 14) -> "jnp.ndarray | None":
    """(B, H, W) 0/1 weights excluding loader padding from eval metrics.

    Two padding sources, both from ``data/loader.py``: duplicate items in the
    final partial batch (``batch["_valid"]`` prefix count, or its per-row
    ``batch["_valid_mask"]`` form emitted for multi-host global batches —
    there the valid rows are a prefix within each PROCESS's block, not a
    global prefix; reference evaluates each item exactly once,
    ``task/core.py:379-393``) and bucket-padded image regions under
    shape-bucketed inference (``batch["_valid_hw"]``; the valid jigsaw extent
    is ``(h//patch*patch, w//patch*patch)``, with ``patch`` the model's patch
    size)."""
    b, hgt, wdt = shape
    valid = batch.get("_valid")
    valid_mask = batch.get("_valid_mask")
    valid_hw = batch.get("_valid_hw")
    if valid is None and valid_mask is None and valid_hw is None:
        return None
    w = jnp.ones(shape, jnp.float32)
    if valid_mask is not None:
        w = w * valid_mask.astype(jnp.float32)[:, None, None]
    elif valid is not None:
        w = w * (jnp.arange(b) < valid).astype(jnp.float32)[:, None, None]
    if valid_hw is not None:
        if jnp.ndim(valid_hw) == 2:  # (B, 2) per-item (bucket-packed)
            ch = (valid_hw[:, 0] // patch) * patch  # (B,)
            cw = (valid_hw[:, 1] // patch) * patch
            region = (jnp.arange(hgt)[None, :, None] < ch[:, None, None]) & (
                jnp.arange(wdt)[None, None, :] < cw[:, None, None]
            )
            w = w * region.astype(jnp.float32)
        else:
            ch = (valid_hw[0] // patch) * patch
            cw = (valid_hw[1] // patch) * patch
            region = (jnp.arange(hgt)[:, None] < ch) & (jnp.arange(wdt)[None, :] < cw)
            w = w * region.astype(jnp.float32)[None]
    return w


def loss_fn(model: CrossScoreNet, params, batch):
    valid_hw = batch.get("_valid_hw")
    q_tokens = batch.get("query/tokens")
    if q_tokens is not None:
        # token-space training (data/token_train.py): both sides arrive as
        # frozen-backbone tokens sliced from full-image grids — the step is
        # the decoder-only graph. The grid is static under jit (score-map
        # crops have a fixed shape).
        gt_shape = batch["query/score_map"].shape
        p = model.cfg.patch_size
        out = model.apply(
            {"params": params},
            None,
            None,
            ref_tokens=batch["reference/cross/tokens"],
            query_tokens=q_tokens,
            token_grid=(gt_shape[1] // p, gt_shape[2] // p),
        )
    else:
        out = model.apply(
            {"params": params},
            batch["query/img"],
            batch.get("reference/cross/imgs"),
            # cached-reference eval (tasks/test.py + data/token_cache.py): the
            # batch carries precomputed reference tokens instead of pixels
            ref_tokens=batch.get("reference/cross/tokens"),
            # (2,) shared or (B, 2) per-item; the model branches on ndim
            valid_hw=None if valid_hw is None
            else (valid_hw if jnp.ndim(valid_hw) == 2 else (valid_hw[0], valid_hw[1])),
        )
    pred = out["score_map_ref_cross"]
    gt = batch["query/score_map"]
    l1 = jnp.abs(pred.astype(jnp.float32) - gt.astype(jnp.float32))
    w = _weights(batch, l1.shape, model.cfg.patch_size)
    if w is None:
        loss = l1.mean()
    else:
        loss = jnp.sum(l1 * w) / jnp.maximum(w.sum(), 1.0)
    return loss, (pred, l1, w)


def _metrics(loss, pred, gt, w=None) -> dict:
    if w is None:
        corr = correlation(pred, gt)
    else:
        corr = masked_correlation(pred, gt, w)
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
    def predict_step(params, query_img, ref_imgs, valid_hw=None):
        if valid_hw is not None:
            valid_hw = (
                valid_hw if jnp.ndim(valid_hw) == 2 else (valid_hw[0], valid_hw[1])
            )
        return model.apply(
            {"params": params},
            query_img,
            ref_imgs,
            need_attn_weights=need_attn_weights,
            need_attn_weights_head_id=head_id,
            valid_hw=valid_hw,
        )

    return predict_step


def make_predict_step_cached(model: CrossScoreNet):
    """Predict step consuming precomputed reference tokens (the
    cached-reference serving path, ``data/token_cache.py``): only the query
    goes through the frozen backbone. ``valid_hw`` (B, 2) composes the cache
    with shape-bucketed serving — the query encode and the decoder mask the
    bucket padding exactly as the uncached bucketed path does."""

    def predict_step(params, query_img, ref_tokens, valid_hw=None, ref_grid=None):
        return model.apply(
            {"params": params}, query_img, None, ref_tokens=ref_tokens,
            valid_hw=valid_hw, ref_grid=ref_grid,
        )

    return predict_step
