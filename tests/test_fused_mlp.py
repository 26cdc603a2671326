"""Parity tests for the fused LN+MLP+residual Pallas kernel (ops/fused_mlp.py)
against the unfused XLA expression used by ``ViTBlock`` (models/dinov2.py).
Runs in Pallas interpret mode on CPU (conftest)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crossscore_tpu.models.dinov2 import Dinov2Encoder, ViTConfig
from crossscore_tpu.ops.fused_mlp import _reference_xla, fused_ln_mlp


def _make_args(rng, b=2, n=37, d=64, f=256, dtype=jnp.float32):
    r = lambda *s: jnp.asarray(rng.standard_normal(s), dtype)
    x = r(b, n, d) * 0.5
    ln_s = 1.0 + 0.1 * r(d)
    ln_b = 0.1 * r(d)
    w1 = r(d, f) * (d ** -0.5)
    b1 = 0.1 * r(f)
    w2 = r(f, d) * (f ** -0.5)
    b2 = 0.1 * r(d)
    ls2 = 1.0 + 0.05 * r(d)
    return x, ln_s, ln_b, w1, b1, w2, b2, ls2


class TestFusedLnMlp:
    def test_matches_unfused_fp32(self, rng):
        args = _make_args(rng)
        got = fused_ln_mlp(*args)
        want = _reference_xla(*args, 1e-6)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=1e-5)

    def test_matches_unfused_bf16(self, rng):
        args = _make_args(rng, dtype=jnp.bfloat16)
        got = fused_ln_mlp(*args).astype(jnp.float32)
        want = _reference_xla(*args, 1e-6).astype(jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=3e-2)

    def test_partial_edge_block(self, rng):
        # rows not a multiple of block_m: the masked edge block must not leak
        args = _make_args(rng, b=1, n=13)
        got = fused_ln_mlp(*args)
        want = _reference_xla(*args, 1e-6)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=1e-5)

    def test_gradients_match_reference(self, rng):
        args = _make_args(rng, b=1, n=16, d=32, f=64)

        def loss_fused(*a):
            return jnp.sum(jnp.square(fused_ln_mlp(*a)))

        def loss_ref(*a):
            return jnp.sum(jnp.square(_reference_xla(*a, 1e-6)))

        g_fused = jax.grad(loss_fused, argnums=tuple(range(8)))(*args)
        g_ref = jax.grad(loss_ref, argnums=tuple(range(8)))(*args)
        for gf, gr in zip(g_fused, g_ref):
            np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                       rtol=1e-4, atol=1e-4)


class TestEncoderMlpImpl:
    @pytest.mark.parametrize("dtype", [jnp.float32])
    def test_encoder_fused_equals_xla_same_params(self, rng, dtype):
        """The fused path consumes the SAME param tree (ln2/fc1/fc2/ls2 names
        and shapes) and produces the same tokens."""
        cfg = ViTConfig(hidden_size=64, num_layers=2, num_heads=4, image_size=56)
        imgs = jnp.asarray(rng.standard_normal((2, 56, 56, 3)), dtype)
        enc_xla = Dinov2Encoder(cfg, dtype=dtype, mlp_impl="xla")
        enc_fused = Dinov2Encoder(cfg, dtype=dtype, mlp_impl="fused")
        params = enc_xla.init(jax.random.PRNGKey(0), imgs)["params"]
        params_f = enc_fused.init(jax.random.PRNGKey(0), imgs)["params"]
        assert jax.tree.structure(params) == jax.tree.structure(params_f)
        out_xla = enc_xla.apply({"params": params}, imgs)
        out_fused = enc_fused.apply({"params": params}, imgs)
        np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_xla),
                                   rtol=0, atol=2e-5)


class TestFusedResLnMlp:
    def test_matches_reference_fp32(self, rng):
        from crossscore_tpu.ops.fused_mlp import _reference_res_xla, fused_res_ln_mlp

        x, ln_s, ln_b, w1, b1, w2, b2, ls2 = _make_args(rng)
        attn = jnp.asarray(rng.standard_normal(x.shape), x.dtype) * 0.3
        ls1 = 1.0 + 0.05 * jnp.asarray(rng.standard_normal(x.shape[-1]), x.dtype)
        got = fused_res_ln_mlp(x, attn, ls1, ln_s, ln_b, w1, b1, w2, b2, ls2)
        want = _reference_res_xla(x, attn, ls1, ln_s, ln_b, w1, b1, w2, b2, ls2, 1e-6)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=0, atol=1e-5)

    def test_gradients_match(self, rng):
        from crossscore_tpu.ops.fused_mlp import _reference_res_xla, fused_res_ln_mlp

        args = _make_args(rng, b=1, n=16, d=32, f=64)
        x, rest = args[0], args[1:]
        attn = jnp.asarray(rng.standard_normal(x.shape), x.dtype) * 0.3
        ls1 = 1.0 + 0.05 * jnp.asarray(rng.standard_normal(x.shape[-1]), x.dtype)
        full = (x, attn, ls1, *rest)
        g_f = jax.grad(lambda *a: jnp.sum(jnp.square(fused_res_ln_mlp(*a))),
                       argnums=tuple(range(10)))(*full)
        g_r = jax.grad(lambda *a: jnp.sum(jnp.square(_reference_res_xla(*a, 1e-6))),
                       argnums=tuple(range(10)))(*full)
        for a, b in zip(g_f, g_r):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)

    def test_encoder_fused_equals_xla_same_params(self, rng):
        """The residual-folding fused block still matches the unfused encoder
        on the same params (fp32 residual vs bf16 — fp32 test, tight tol)."""
        from crossscore_tpu.models.dinov2 import Dinov2Encoder, ViTConfig

        cfg = ViTConfig(hidden_size=64, num_layers=2, num_heads=4, image_size=56)
        imgs = jnp.asarray(rng.standard_normal((2, 56, 56, 3)), jnp.float32)
        enc_xla = Dinov2Encoder(cfg, dtype=jnp.float32, mlp_impl="xla")
        enc_fused = Dinov2Encoder(cfg, dtype=jnp.float32, mlp_impl="fused")
        params = enc_xla.init(jax.random.PRNGKey(0), imgs)["params"]
        assert jax.tree.structure(params) == jax.tree.structure(
            enc_fused.init(jax.random.PRNGKey(0), imgs)["params"]
        )
        out_xla = enc_xla.apply({"params": params}, imgs)
        out_fused = enc_fused.apply({"params": params}, imgs)
        np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_xla),
                                   rtol=0, atol=5e-5)


class TestBf16TanhGelu:
    """The bf16 kernel path uses the tanh-form GELU (max |err| ~1e-3 vs exact
    erf — below the bf16 rounding the path already carries; fp32 keeps the
    exact polynomial). Pins the end-to-end deviation."""

    def test_op_level_bound(self, rng):
        from crossscore_tpu.ops.fused_mlp import _reference_xla, fused_ln_mlp

        args = _make_args(rng, dtype=jnp.bfloat16)
        got = np.asarray(fused_ln_mlp(*args), np.float32)
        want = np.asarray(_reference_xla(*args, 1e-6), np.float32)  # exact gelu
        # deviation bounded by gelu-approx err (~1e-3) amplified through fc2
        assert np.abs(got - want).max() < 2e-2, np.abs(got - want).max()

    def test_model_level_bound(self, rng):
        """Full CrossScoreNet bf16: fused (tanh-gelu) vs unfused (exact-gelu)
        score maps stay within a tight fraction of the score range."""
        from crossscore_tpu.models import CrossScoreNet, CrossScoreConfig
        from crossscore_tpu.models.dinov2 import VIT_PRESETS
        import dataclasses

        base = CrossScoreConfig(backbone=VIT_PRESETS["dinov2-test"], pe_h=6,
                                pe_w=6, compute_dtype=jnp.bfloat16)
        q = jnp.asarray(rng.standard_normal((1, 56, 56, 3)), jnp.bfloat16)
        r = jnp.asarray(rng.standard_normal((1, 2, 56, 56, 3)), jnp.bfloat16)
        m_x = CrossScoreNet(dataclasses.replace(base, mlp_impl="xla"))
        m_f = CrossScoreNet(dataclasses.replace(base, mlp_impl="fused"))
        params = m_x.init(jax.random.PRNGKey(0), q, r)["params"]
        out_x = np.asarray(m_x.apply({"params": params}, q, r)["score_map_ref_cross"])
        out_f = np.asarray(m_f.apply({"params": params}, q, r)["score_map_ref_cross"])
        assert np.abs(out_f - out_x).max() < 2e-2  # scores live in [0, 1]

    def test_fused_exact_restores_erf_on_bf16(self, rng):
        """mlp_impl=fused_exact / gelu="exact" keeps the erf GELU on bf16."""
        from crossscore_tpu.ops.fused_mlp import _reference_xla, fused_ln_mlp

        args = _make_args(rng, dtype=jnp.bfloat16)
        got = np.asarray(fused_ln_mlp(*args, 1e-6, "exact"), np.float32)
        want = np.asarray(_reference_xla(*args, 1e-6), np.float32)
        # same exact-gelu math; only fp32-vs-bf16 accumulation differences
        np.testing.assert_allclose(got, want, rtol=0, atol=3e-2)
        tanh = np.asarray(fused_ln_mlp(*args, 1e-6, "tanh"), np.float32)
        assert np.abs(got - want).max() <= np.abs(tanh - want).max() + 1e-6
