"""Backbone preset coverage: the model family beyond dinov2-small.

The reference hardcodes ``facebook/dinov2-small`` (reference
``task/core.py:39-42``); BASELINE.json's stress config #5 names a ViT-L
backbone. These tests pin that every production preset (small / base / large)
constructs, forwards, and back-propagates through the full CrossScoreNet
graph — tiny image shapes keep the CPU cost low while every layer executes.
The kernel-level stress numbers for the ViT-L / 2x-resolution shape live in
PERFORMANCE.md (tools/bench_stress_attention.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crossscore_tpu.models import CrossScoreConfig, CrossScoreNet
from crossscore_tpu.models.dinov2 import VIT_PRESETS

PRESETS = ["dinov2-small", "dinov2-base", "dinov2-large"]


def _tiny_inputs(k=2, hw=28):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((1, hw, hw, 3)), jnp.float32)
    r = jnp.asarray(rng.standard_normal((1, k, hw, hw, 3)), jnp.float32)
    return q, r


@pytest.mark.parametrize("preset", PRESETS)
def test_preset_forward(preset):
    """Every preset produces a finite in-range score map at its native
    decoder wiring (d_model = backbone hidden size)."""
    cfg = CrossScoreConfig(backbone=VIT_PRESETS[preset])
    model = CrossScoreNet(cfg)
    q, r = _tiny_inputs()
    params = model.init(jax.random.PRNGKey(0), q, r)["params"]
    out = model.apply({"params": params}, q, r)["score_map_ref_cross"]
    assert out.shape == (1, 28, 28)
    assert bool(jnp.isfinite(out).all())
    # ssim / metric_min=0 -> sigmoid head: scores live in (0, 1)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_preset_gradients_flow_to_decoder_only():
    """The frozen-backbone contract holds for non-default presets too:
    loss gradients reach the decoder/head and are identically zero on the
    backbone (stop_gradient, reference ``task/core.py:119``)."""
    cfg = CrossScoreConfig(backbone=VIT_PRESETS["dinov2-base"])
    model = CrossScoreNet(cfg)
    q, r = _tiny_inputs()
    params = model.init(jax.random.PRNGKey(0), q, r)["params"]
    gt = jnp.full((1, 28, 28), 0.5, jnp.float32)

    def loss_fn(p):
        m = model.apply({"params": p}, q, r)["score_map_ref_cross"]
        return jnp.abs(m - gt).mean()

    grads = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    backbone_norms = [
        float(jnp.linalg.norm(g))
        for path, g in flat
        if "backbone" in jax.tree_util.keystr(path)
    ]
    other_norms = [
        float(jnp.linalg.norm(g))
        for path, g in flat
        if "backbone" not in jax.tree_util.keystr(path)
    ]
    assert backbone_norms and max(backbone_norms) == 0.0
    assert other_norms and max(other_norms) > 0.0
    assert all(np.isfinite(n) for n in other_norms)
