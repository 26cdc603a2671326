"""Randomized-shape fuzz of the flash-attention kernel family vs dense.

The hand-picked parametrized cases in tests/test_flash_attention.py cover the
operating points we run in production; this file draws awkward shapes from
fixed seeds (tiny extents, non-multiples of every block size, ragged
``kv_valid``) so edge handling is pinned for shapes nobody thought of.
Deterministic: each case is a pure function of its seed, so failures
reproduce byte-identically. Runs in Pallas interpret mode on CPU (same
kernel code as the TPU compile), reference ``dense_attention``
(`/root/reference/model/customised_transformer/transformer.py:195-205`
semantics: plain softmax(qk^T/sqrt(hd))v).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from crossscore_tpu.models.decoder import dense_attention
from crossscore_tpu.ops.flash_attention import (
    flash_cross_attention,
    flash_cross_attention_ln,
    pick_blocks,
    pick_qkv_hpack,
)


def _draw(seed):
    g = np.random.default_rng(seed)
    b = int(g.integers(1, 4))
    h = int(g.integers(1, 5))
    nq = int(g.integers(1, 261))
    nk = int(g.integers(1, 1201))
    hd = int(g.choice([32, 48, 64]))
    return g, b, h, nq, nk, hd


def _qkv(g, b, h, nq, nk, hd):
    q = jnp.asarray(g.standard_normal((b, h, nq, hd)).astype(np.float32))
    k = jnp.asarray(g.standard_normal((b, h, nk, hd)).astype(np.float32))
    v = jnp.asarray(g.standard_normal((b, h, nk, hd)).astype(np.float32))
    return q, k, v


class TestFuzzForward:
    @pytest.mark.parametrize("seed", range(8))
    def test_random_shapes_match_dense(self, seed):
        g, b, h, nq, nk, hd = _draw(seed)
        q, k, v = _qkv(g, b, h, nq, nk, hd)
        if seed % 2:
            bq, bk, bh = pick_blocks(nq, nk)  # production block picker
        else:
            bq = int(g.choice([128, 256, 512]))
            bk = int(g.choice([128, 256, 1024]))
            bh = 1
        ours = flash_cross_attention(q, k, v, bq, bk, bh)
        want = dense_attention(q, k, v)
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(want), atol=3e-5,
            err_msg=f"seed={seed} shape=({b},{h},{nq},{nk},{hd}) blocks=({bq},{bk},{bh})",
        )


class TestFuzzBackward:
    @pytest.mark.parametrize("seed", [100, 101, 102])
    def test_random_shapes_grads_match_dense(self, seed):
        g, b, h, nq, nk, hd = _draw(seed)
        nq, nk = min(nq, 128), min(nk, 700)  # keep interpret-mode runtime sane
        q, k, v = _qkv(g, b, h, nq, nk, hd)
        blocks = pick_blocks(nq, nk)

        def loss_flash(q, k, v):
            return jnp.sum(jnp.square(flash_cross_attention(q, k, v, *blocks)))

        def loss_dense(q, k, v):
            return jnp.sum(jnp.square(dense_attention(q, k, v)))

        g_f = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        g_d = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
        for a, e, name in zip(g_f, g_d, "qkv"):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(e), atol=1e-3,
                err_msg=f"seed={seed} grad {name} shape=({b},{h},{nq},{nk},{hd})",
            )


class TestFuzzLayoutNative:
    """Token-major packed kernel (the training path) with ragged kv_valid."""

    @pytest.mark.parametrize("seed", [200, 201, 202, 203])
    def test_prepadded_kv_valid_random(self, seed):
        g = np.random.default_rng(seed)
        b = int(g.integers(1, 3))
        hd = 64  # padded head dim (128 % hd == 0); hpack fills the lane block
        h = int(g.choice([1, 2, 4]))
        nq = int(g.integers(1, 180))
        kv_valid = int(g.integers(1, 900))
        bk = 128
        nk_pad = -(-kv_valid // bk) * bk  # KV pre-padded to a block multiple
        qp = jnp.asarray(g.standard_normal((b, nq, h * hd)).astype(np.float32))
        kp = np.zeros((b, nk_pad, h * hd), np.float32)
        vp = np.zeros((b, nk_pad, h * hd), np.float32)
        kp[:, :kv_valid] = g.standard_normal((b, kv_valid, h * hd))
        vp[:, :kv_valid] = g.standard_normal((b, kv_valid, h * hd))
        kp, vp = jnp.asarray(kp), jnp.asarray(vp)

        o = flash_cross_attention_ln(qp, kp, vp, h, hd, block_k=bk,
                                     kv_valid=kv_valid)
        split = lambda x, n: x[:, :n].reshape(b, n, h, hd).transpose(0, 2, 1, 3)
        want = dense_attention(split(qp, nq), split(kp, kv_valid), split(vp, kv_valid))
        want = want.transpose(0, 2, 1, 3).reshape(b, nq, h * hd)
        np.testing.assert_allclose(
            np.asarray(o), np.asarray(want), atol=3e-5,
            err_msg=f"seed={seed} (b={b},h={h},nq={nq},kv={kv_valid},pad={nk_pad})",
        )
        # pad rows contribute nothing to gradients either
        def loss(kp, vp):
            return jnp.sum(jnp.square(
                flash_cross_attention_ln(qp, kp, vp, h, hd, block_k=bk,
                                         kv_valid=kv_valid)))

        dk, dv = jax.grad(loss, argnums=(0, 1))(kp, vp)
        assert float(jnp.abs(dk[:, kv_valid:]).max()) == 0.0
        assert float(jnp.abs(dv[:, kv_valid:]).max()) == 0.0

    def test_hpack_divides(self):
        assert pick_qkv_hpack(8, 64) == 2
        assert pick_qkv_hpack(3, 64) == 1
        assert pick_qkv_hpack(6, 32) == 3
