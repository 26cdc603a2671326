"""Flash cross-attention kernel: forward + backward parity vs dense attention.

Runs in Pallas interpret mode on CPU (same kernel code path as TPU compile).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from crossscore_tpu.ops.flash_attention import flash_cross_attention
from crossscore_tpu.models.decoder import dense_attention


def _rand_qkv(rng, b=2, h=3, nq=70, nk=200, hd=48):
    q = jnp.asarray(rng.standard_normal((b, h, nq, hd)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, nk, hd)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, nk, hd)).astype(np.float32))
    return q, k, v


class TestFlashForward:
    @pytest.mark.parametrize("nq,nk", [(70, 200), (128, 512), (37, 37), (130, 1100)])
    def test_matches_dense(self, rng, nq, nk):
        q, k, v = _rand_qkv(rng, nq=nq, nk=nk)
        ours = flash_cross_attention(q, k, v, 128, 256)
        expected = dense_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(expected), atol=2e-5)

    def test_bf16_inputs(self, rng):
        q, k, v = _rand_qkv(rng, nq=64, nk=300)
        q16, k16, v16 = (x.astype(jnp.bfloat16) for x in (q, k, v))
        ours = flash_cross_attention(q16, k16, v16, 128, 256).astype(jnp.float32)
        expected = dense_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(expected), atol=0.05)

    def test_extreme_logits_stable(self, rng):
        q, k, v = _rand_qkv(rng, nq=32, nk=160)
        out = flash_cross_attention(q * 30.0, k * 30.0, v, 128, 128)
        assert np.isfinite(np.asarray(out)).all()


class TestFlashBackward:
    def test_grads_match_dense(self, rng):
        q, k, v = _rand_qkv(rng, b=1, h=2, nq=50, nk=180)

        def loss_flash(q, k, v):
            return jnp.sum(flash_cross_attention(q, k, v, 128, 128) ** 2)

        def loss_dense(q, k, v):
            return jnp.sum(dense_attention(q, k, v) ** 2)

        g_f = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        g_d = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(g_f, g_d, "qkv"):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-4, err_msg=f"grad {name}"
            )

    def test_grads_with_padding(self, rng):
        """Nk not a multiple of block_k exercises the pad-masked backward."""
        q, k, v = _rand_qkv(rng, b=1, h=1, nq=37, nk=333)

        def loss_flash(q, k, v):
            return jnp.mean(jnp.abs(flash_cross_attention(q, k, v, 128, 256)))

        def loss_dense(q, k, v):
            return jnp.mean(jnp.abs(dense_attention(q, k, v)))

        g_f = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        g_d = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g_f, g_d):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


class TestBlockH:
    @pytest.mark.parametrize("block_h", [2, 3])
    def test_multi_slice_cells_match_dense(self, rng, block_h):
        q, k, v = _rand_qkv(rng, b=2, h=3, nq=64, nk=200)
        ours = flash_cross_attention(q, k, v, 128, 256, block_h)
        expected = dense_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(expected), atol=2e-5)

    def test_indivisible_block_h_falls_back(self, rng):
        q, k, v = _rand_qkv(rng, b=1, h=3, nq=32, nk=100)  # bh=3, block_h=2
        ours = flash_cross_attention(q, k, v, 128, 128, 2)
        expected = dense_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(expected), atol=2e-5)
