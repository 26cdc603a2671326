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


class TestLayoutNativeQkv:
    """The layout-native kernel consuming the fused (B, N, 3D) projection
    output (ops/flash_attention.py::_flash_qkv_fwd) and its chunked variant."""

    def _qkv_inputs(self, rng, b=2, h=2, n=70, hd=64):
        d = h * hd
        qkv = jnp.asarray(rng.standard_normal((b, n, 3 * d)).astype(np.float32))
        q, k, v = (
            qkv.reshape(b, n, 3, h, hd).transpose(2, 0, 3, 1, 4)[i] for i in range(3)
        )
        return qkv, q, k, v

    @pytest.mark.parametrize("chunks", [1, 2, 3])
    def test_matches_dense(self, rng, chunks):
        from crossscore_tpu.ops.flash_attention import _flash_qkv_fwd

        qkv, q, k, v = self._qkv_inputs(rng)
        o, _, _ = _flash_qkv_fwd(qkv, 2, block_q=32, hpack=2, chunks=chunks)
        expected = dense_attention(q, k, v)  # (B, H, N, hd)
        b, h, n, hd = expected.shape
        expected = expected.transpose(0, 2, 1, 3).reshape(b, n, h * hd)
        np.testing.assert_allclose(np.asarray(o), np.asarray(expected), atol=2e-5)

    def test_custom_vjp_matches_dense_grads(self, rng):
        from crossscore_tpu.ops.flash_attention import flash_qkv_self_attention

        qkv, q, k, v = self._qkv_inputs(rng, b=1, n=40)

        def loss_fused(x):
            return jnp.sum(jnp.square(flash_qkv_self_attention(x, 2, 0, 2)))

        def loss_dense(x):
            b, n, d3 = x.shape
            qq, kk, vv = (
                x.reshape(b, n, 3, 2, d3 // 6).transpose(2, 0, 3, 1, 4)[i]
                for i in range(3)
            )
            o = dense_attention(qq, kk, vv)
            return jnp.sum(jnp.square(o))

        g_f = jax.grad(loss_fused)(qkv)
        g_d = jax.grad(loss_dense)(qkv)
        np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_d), atol=5e-4)
