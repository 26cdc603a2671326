"""int8 quantized backbone path (ops/quant.py, model.tpu.backbone_quant).

Tolerance tiers: bf16 vs fp32 is pinned by test_crossscore_e2e.py::
test_bf16_close_to_fp32; this file adds the int8 tier — the W8A8 dynamic
scheme must stay within a small multiple of the bf16 drift on score maps.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from crossscore_tpu.models import CrossScoreNet, CrossScoreConfig, ViTConfig
from crossscore_tpu.ops.quant import int8_matmul, QuantDense

VIT = ViTConfig(hidden_size=64, num_layers=2, num_heads=4, patch_size=14, image_size=56)


def test_int8_matmul_accuracy():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((256, 384)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((384, 512)) / np.sqrt(384), jnp.float32)
    ref = x @ w
    got = int8_matmul(x, w)
    rel = float(jnp.abs(got - ref).max() / jnp.abs(ref).max())
    assert rel < 0.02, rel


def test_int8_matmul_outlier_rows():
    """Per-row activation scales keep outlier tokens from wrecking the rest."""
    rng = np.random.default_rng(1)
    x = np.asarray(rng.standard_normal((64, 128)), np.float32)
    x[3] *= 1000.0  # outlier token
    w = np.asarray(rng.standard_normal((128, 64)) / np.sqrt(128), np.float32)
    ref = x @ w
    got = np.asarray(int8_matmul(jnp.asarray(x), jnp.asarray(w)))
    # non-outlier rows unaffected by the outlier's magnitude
    rel = np.abs(got[:3] - ref[:3]).max() / np.abs(ref[:3]).max()
    assert rel < 0.02, rel


def test_quantdense_drop_in_params():
    """QuantDense consumes an nn.Dense param tree unchanged (ckpt compat)."""
    from flax import linen as nn

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((32, 48)), jnp.float32)
    dense = nn.Dense(24)
    params = dense.init(jax.random.PRNGKey(0), x)["params"]
    qd = QuantDense(24, dtype=jnp.float32)
    ref = dense.apply({"params": params}, x)
    got = qd.apply({"params": params}, x)
    assert jax.tree_util.tree_structure(
        qd.init(jax.random.PRNGKey(0), x)["params"]
    ) == jax.tree_util.tree_structure(params)
    rel = float(jnp.abs(got - ref).max() / jnp.abs(ref).max())
    assert rel < 0.03, rel


class TestInt8Backbone:
    def _run(self, quant):
        cfg = CrossScoreConfig(
            backbone=VIT, pe_h=6, pe_w=6, decoder_heads=4, decoder_layers=1,
            backbone_quant=quant,
        )
        model = CrossScoreNet(cfg)
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.standard_normal((2, 56, 56, 3)).astype(np.float32))
        r = jnp.asarray(rng.standard_normal((2, 2, 56, 56, 3)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), q, r)["params"]
        out = model.apply({"params": params}, q, r)["score_map_ref_cross"]
        return params, out

    def test_param_tree_unchanged(self):
        p_none, _ = self._run("none")
        p_int8, _ = self._run("int8")
        assert jax.tree_util.tree_structure(p_none) == jax.tree_util.tree_structure(p_int8)

    def test_int8_score_map_close(self):
        """int8 tolerance tier: score maps bounded-activation outputs stay
        within a small absolute band of the fp32 path (score maps live in
        [0, 1], so absolute error is the right yardstick)."""
        _, out_none = self._run("none")
        p, out_int8 = self._run("int8")
        # same params both ways (init is deterministic by seed)
        mae = float(jnp.abs(out_none - out_int8).mean())
        mx = float(jnp.abs(out_none - out_int8).max())
        assert mae < 5e-3, mae
        assert mx < 5e-2, mx

    def test_invalid_quant_raises(self):
        with pytest.raises(ValueError):
            self._run("int4")
