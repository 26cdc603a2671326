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


class TestLayoutNativeCross:
    """Layout-native cross-attention on token-major lane-packed projections
    (ops/flash_attention.py::flash_cross_attention_ln) incl. the zero-padded
    head dim (decoder hd=48 -> 64) and the decoder module wiring."""

    def _packed(self, rng, b, h, nq, nk, hd):
        q = jnp.asarray(rng.standard_normal((b, h, nq, hd)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((b, h, nk, hd)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((b, h, nk, hd)).astype(np.float32))
        pack = lambda x: x.transpose(0, 2, 1, 3).reshape(b, x.shape[2], h * hd)
        return (q, k, v), (pack(q), pack(k), pack(v))

    @pytest.mark.parametrize("nq,nk,bk", [(37, 300, 128), (64, 2100, 1024)])
    def test_matches_dense_hd64(self, rng, nq, nk, bk):
        from crossscore_tpu.ops.flash_attention import flash_cross_attention_ln

        (q, k, v), (qp, kp, vp) = self._packed(rng, 2, 2, nq, nk, 64)
        o = flash_cross_attention_ln(qp, kp, vp, 2, 64, 32, bk)
        want = dense_attention(q, k, v)
        want = want.transpose(0, 2, 1, 3).reshape(o.shape)
        np.testing.assert_allclose(np.asarray(o), np.asarray(want), atol=2e-5)

    def test_padded_head_dim_with_prescale(self, rng):
        """hd=48 padded to 64: zero lanes + q-prescale reproduce the true
        1/sqrt(48) softmax exactly."""
        from crossscore_tpu.ops.flash_attention import flash_cross_attention_ln

        b, h, nq, nk, hd = 1, 2, 40, 260, 48
        (q, k, v), _ = self._packed(rng, b, h, nq, nk, hd)
        pad = lambda x: jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 64 - hd)))
        pack = lambda x: x.transpose(0, 2, 1, 3).reshape(b, x.shape[2], h * 64)
        prescale = (64 ** 0.5) / (hd ** 0.5)
        o = flash_cross_attention_ln(pack(pad(q * prescale)), pack(pad(k)),
                                     pack(pad(v)), h, 64, 0, 128)
        want = dense_attention(q, k, v).transpose(0, 2, 1, 3)
        got = np.asarray(o).reshape(b, nq, h, 64)[..., :hd]
        np.testing.assert_allclose(got, np.asarray(want), atol=2e-5)
        # padded output lanes are exactly zero
        np.testing.assert_array_equal(np.asarray(o).reshape(b, nq, h, 64)[..., hd:], 0)

    def test_hd_true_matches_padded_path(self, rng):
        """hd_true=48 (narrow QK fwd + narrow-everything bwd on the 64-pad
        packing) is EXACT vs the full-width path: the skipped lanes are
        structurally zero, so fwd output, dq, dk, dv and the zero pad-lane
        grads must all match to float exactness."""
        from crossscore_tpu.ops.flash_attention import flash_cross_attention_ln

        b, h, hd, nq, nk = 2, 4, 48, 37, 3 * 37  # 2 lane blocks, K=3 views
        (q, k, v), _ = self._packed(rng, b, h, nq, nk, hd)
        pad = lambda x: jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 64 - hd)))
        pack = lambda x: x.transpose(0, 2, 1, 3).reshape(b, x.shape[2], h * 64)
        prescale = (64 ** 0.5) / (hd ** 0.5)
        qp, kp, vp = pack(pad(q * prescale)), pack(pad(k)), pack(pad(v))

        def loss(qp, kp, vp, hd_true):
            o = flash_cross_attention_ln(qp, kp, vp, h, 64, 0, 128, 0, hd_true)
            return jnp.sum(jnp.square(o) * jnp.cos(o)), o

        g_ref, o_ref = (
            jax.grad(lambda *a: loss(*a, 0)[0], argnums=(0, 1, 2))(qp, kp, vp),
            loss(qp, kp, vp, 0)[1],
        )
        g_nt, o_nt = (
            jax.grad(lambda *a: loss(*a, hd)[0], argnums=(0, 1, 2))(qp, kp, vp),
            loss(qp, kp, vp, hd)[1],
        )
        np.testing.assert_array_equal(np.asarray(o_nt), np.asarray(o_ref))
        for a, b_ in zip(g_nt, g_ref):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
        # pad-lane grads are exactly zero in the narrow path
        for g in g_nt:
            g4 = np.asarray(g).reshape(b, -1, h, 64)
            np.testing.assert_array_equal(g4[..., hd:], 0)

    def test_grads_match_dense(self, rng):
        from crossscore_tpu.ops.flash_attention import flash_cross_attention_ln

        (q, k, v), (qp, kp, vp) = self._packed(rng, 1, 2, 24, 150, 64)

        def loss_ln(qp, kp, vp):
            return jnp.sum(jnp.square(flash_cross_attention_ln(qp, kp, vp, 2, 64, 0, 128)))

        def loss_dense(qp, kp, vp):
            un = lambda x: x.reshape(1, x.shape[1], 2, 64).transpose(0, 2, 1, 3)
            return jnp.sum(jnp.square(dense_attention(un(qp), un(kp), un(vp))))

        g_ln = jax.grad(loss_ln, argnums=(0, 1, 2))(qp, kp, vp)
        g_d = jax.grad(loss_dense, argnums=(0, 1, 2))(qp, kp, vp)
        for a, b_ in zip(g_ln, g_d):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4)

    def test_grads_match_dense_multi_laneblock(self, rng):
        """The token-major backward kernel (_bwd_cross_ln_pallas) at the
        production decoder layout: 8 heads x hd 64 = 4 lane blocks of 2
        packed heads, unaligned nq (37), multi-block KV (nk=3*37 padded to
        block_k) — dq/dk/dv must match dense autodiff."""
        from crossscore_tpu.ops.flash_attention import flash_cross_attention_ln

        h, hd, nq, nk = 8, 64, 37, 111
        (q, k, v), (qp, kp, vp) = self._packed(rng, 2, h, nq, nk, hd)

        def loss_ln(qp, kp, vp):
            o = flash_cross_attention_ln(qp, kp, vp, h, hd, 0, 128)
            return jnp.sum(jnp.square(o) * jnp.cos(o))

        def loss_dense(qp, kp, vp):
            un = lambda x: x.reshape(2, x.shape[1], h, hd).transpose(0, 2, 1, 3)
            o = dense_attention(un(qp), un(kp), un(vp)).transpose(0, 2, 1, 3)
            o = o.reshape(2, nq, h * hd)
            return jnp.sum(jnp.square(o) * jnp.cos(o))

        g_ln = jax.grad(loss_ln, argnums=(0, 1, 2))(qp, kp, vp)
        g_d = jax.grad(loss_dense, argnums=(0, 1, 2))(qp, kp, vp)
        for a, b_ in zip(g_ln, g_d):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4)

    def test_grads_match_dense_hd128_hpack1(self, rng):
        """hd=128 = one head per lane block (hpack=1) — the degenerate
        packing the ViT-L stress config trains through (d_model=1024, 8
        heads; PERFORMANCE.md r4 stress section). Fwd + dq/dk/dv must match
        dense autodiff with NO lane padding in play."""
        from crossscore_tpu.ops.flash_attention import flash_cross_attention_ln

        h, hd, nq, nk = 4, 128, 37, 290
        (q, k, v), (qp, kp, vp) = self._packed(rng, 2, h, nq, nk, hd)

        o = flash_cross_attention_ln(qp, kp, vp, h, hd, 0, 128)
        want = dense_attention(q, k, v).transpose(0, 2, 1, 3).reshape(o.shape)
        np.testing.assert_allclose(np.asarray(o), np.asarray(want), atol=2e-5)

        def loss_ln(qp, kp, vp):
            out = flash_cross_attention_ln(qp, kp, vp, h, hd, 0, 128)
            return jnp.sum(jnp.square(out) * jnp.cos(out))

        def loss_dense(qp, kp, vp):
            un = lambda x: x.reshape(2, x.shape[1], h, hd).transpose(0, 2, 1, 3)
            out = dense_attention(un(qp), un(kp), un(vp)).transpose(0, 2, 1, 3)
            out = out.reshape(2, nq, h * hd)
            return jnp.sum(jnp.square(out) * jnp.cos(out))

        g_ln = jax.grad(loss_ln, argnums=(0, 1, 2))(qp, kp, vp)
        g_d = jax.grad(loss_dense, argnums=(0, 1, 2))(qp, kp, vp)
        for a, b_ in zip(g_ln, g_d):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4)

    def test_prepad_kv_valid_matches_unpadded(self, rng):
        """Pre-padded KV tokens + kv_valid (decoder-memory pre-pad path)
        reproduce the unpadded kernel exactly: same fwd output, same dq and
        real-row dk/dv grads, exactly-zero grads on the pad rows."""
        from crossscore_tpu.ops.flash_attention import (
            flash_cross_attention_ln, pick_cross_ln_prepad,
        )

        h, hd, nq, nk = 2, 64, 24, 150
        _, (qp, kp, vp) = self._packed(rng, 1, h, nq, nk, hd)
        bq, bk, nk_p = pick_cross_ln_prepad(nq, nk)
        assert nk_p % bk == 0 and nk_p >= nk
        kp_p = jnp.pad(kp, ((0, 0), (0, nk_p - nk), (0, 0)))
        vp_p = jnp.pad(vp, ((0, 0), (0, nk_p - nk), (0, 0)))

        def loss(fn_args):
            q_, k_, v_, valid = fn_args
            o = flash_cross_attention_ln(q_, k_, v_, h, hd, bq, bk, valid)
            return jnp.sum(jnp.square(o) * jnp.cos(o)), o

        (g_q, g_k, g_v), o_ref = (
            jax.grad(lambda a: loss((a[0], a[1], a[2], 0))[0],
                     argnums=0)((qp, kp, vp)),
            loss((qp, kp, vp, 0))[1],
        )
        (gp_q, gp_k, gp_v), o_pre = (
            jax.grad(lambda a: loss((a[0], a[1], a[2], nk))[0],
                     argnums=0)((qp, kp_p, vp_p)),
            loss((qp, kp_p, vp_p, nk))[1],
        )
        np.testing.assert_allclose(np.asarray(o_pre), np.asarray(o_ref), atol=1e-6)
        np.testing.assert_allclose(np.asarray(gp_q), np.asarray(g_q), atol=1e-5)
        np.testing.assert_allclose(np.asarray(gp_k[:, :nk]), np.asarray(g_k), atol=1e-5)
        np.testing.assert_allclose(np.asarray(gp_v[:, :nk]), np.asarray(g_v), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(gp_k[:, nk:]), 0)
        np.testing.assert_array_equal(np.asarray(gp_v[:, nk:]), 0)

    def test_decoder_prepad_memory_matches_xla(self, rng):
        """CrossReferenceDecoder(pallas) pre-pads memory once for the stack
        (decoder.py memory_valid path); outputs and param grads must match
        the xla impl at a non-block-multiple KV count."""
        from crossscore_tpu.models.decoder import CrossReferenceDecoder

        tgt = jnp.asarray(rng.standard_normal((2, 30, 128)).astype(np.float32))
        mem = jnp.asarray(rng.standard_normal((2, 333, 128)).astype(np.float32))
        dec_x = CrossReferenceDecoder(128, 2, 2, attention_impl="xla")
        dec_p = CrossReferenceDecoder(128, 2, 2, attention_impl="pallas")
        params = dec_x.init(jax.random.PRNGKey(0), tgt, mem)["params"]
        out_x, _ = dec_x.apply({"params": params}, tgt, mem)
        out_p, _ = dec_p.apply({"params": params}, tgt, mem)
        np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x), atol=5e-5)

        def loss(dec, p):
            o, _ = dec.apply({"params": p}, tgt, mem)
            return jnp.sum(jnp.square(o))

        g_x = jax.grad(lambda p: loss(dec_x, p))(params)
        g_p = jax.grad(lambda p: loss(dec_p, p))(params)
        jax.tree.map(
            lambda a, b_: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=2e-3, rtol=1e-3
            ),
            g_x, g_p,
        )

    def test_mha_module_parity_and_param_tree(self, rng):
        """TorchStyleMHA(pallas) routes through the layout-native path with
        the SAME param tree as the xla path, same outputs, same grads."""
        from crossscore_tpu.models.decoder import TorchStyleMHA

        query = jnp.asarray(rng.standard_normal((2, 30, 96)).astype(np.float32))
        memory = jnp.asarray(rng.standard_normal((2, 170, 96)).astype(np.float32))
        mha_x = TorchStyleMHA(96, 2, jnp.float32, "xla")       # hd=48
        mha_p = TorchStyleMHA(96, 2, jnp.float32, "pallas")
        params = mha_x.init(jax.random.PRNGKey(0), query, memory, memory)["params"]
        params_p = mha_p.init(jax.random.PRNGKey(0), query, memory, memory)["params"]
        assert jax.tree.structure(params) == jax.tree.structure(params_p)
        out_x, _ = mha_x.apply({"params": params}, query, memory, memory)
        out_p, _ = mha_p.apply({"params": params}, query, memory, memory)
        np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x), atol=5e-5)

        def loss(fn, p):
            return jnp.sum(jnp.square(fn.apply({"params": p}, query, memory, memory)[0]))

        g_x = jax.grad(lambda p: loss(mha_x, p))(params)
        g_p = jax.grad(lambda p: loss(mha_p, p))(params)
        jax.tree.map(
            lambda a, b_: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=2e-3, rtol=1e-3
            ),
            g_x, g_p,
        )


class TestShapeFuzz:
    """Odd-shape sweep for every kernel family (CPU interpret): edge blocks,
    non-multiple token counts, 1-token axes, many heads."""

    CASES = [
        # (b, h, nq, nk, hd)
        (1, 1, 1, 1, 48),
        (1, 2, 7, 129, 48),
        (3, 3, 130, 65, 64),
        (2, 4, 33, 1025, 32),
        (1, 6, 200, 391, 64),
    ]

    @pytest.mark.parametrize("b,h,nq,nk,hd", CASES)
    def test_head_major_v2(self, rng, b, h, nq, nk, hd):
        from crossscore_tpu.ops.flash_attention import flash_cross_attention, pick_blocks

        q, k, v = _rand_qkv(rng, b=b, h=h, nq=nq, nk=nk, hd=hd)
        ours = flash_cross_attention(q, k, v, *pick_blocks(nq, nk))
        np.testing.assert_allclose(np.asarray(ours), np.asarray(dense_attention(q, k, v)),
                                   atol=3e-5)

    @pytest.mark.parametrize("b,h,nq,nk,hd", [c for c in CASES if 128 % c[4] == 0 and c[1] % (128 // c[4]) == 0])
    def test_layout_native_cross(self, rng, b, h, nq, nk, hd):
        from crossscore_tpu.ops.flash_attention import (
            flash_cross_attention_ln, pick_cross_ln_blocks,
        )

        q, k, v = _rand_qkv(rng, b=b, h=h, nq=nq, nk=nk, hd=hd)
        pack = lambda x: x.transpose(0, 2, 1, 3).reshape(b, x.shape[2], h * hd)
        bq, bk = pick_cross_ln_blocks(nq, nk)
        o = flash_cross_attention_ln(pack(q), pack(k), pack(v), h, hd, bq, bk)
        want = pack(dense_attention(q, k, v))
        np.testing.assert_allclose(np.asarray(o), np.asarray(want), atol=3e-5)

    @pytest.mark.parametrize("n", [1, 9, 127, 129, 300])
    def test_layout_native_self(self, rng, n):
        from crossscore_tpu.ops.flash_attention import _flash_qkv_fwd

        b, h, hd = 2, 2, 64
        qkv = jnp.asarray(rng.standard_normal((b, n, 3 * h * hd)).astype(np.float32))
        o, _, _ = _flash_qkv_fwd(qkv, h, block_q=0, hpack=2)
        q, k, v = (qkv.reshape(b, n, 3, h, hd).transpose(2, 0, 3, 1, 4)[i] for i in range(3))
        want = dense_attention(q, k, v).transpose(0, 2, 1, 3).reshape(b, n, h * hd)
        np.testing.assert_allclose(np.asarray(o), np.asarray(want), atol=3e-5)


class TestMultiKvBackward:
    """The multi-KV Pallas backward (decoder cross-attention training path)."""

    @pytest.mark.parametrize("nq,nk", [(70, 2100), (37, 3000)])
    def test_grads_match_dense_long_kv(self, rng, nq, nk):
        q, k, v = _rand_qkv(rng, b=1, h=2, nq=nq, nk=nk, hd=48)

        def loss_flash(q, k, v):
            from crossscore_tpu.ops.flash_attention import pick_blocks

            return jnp.sum(jnp.square(flash_cross_attention(q, k, v, *pick_blocks(nq, nk))))

        def loss_dense(q, k, v):
            return jnp.sum(jnp.square(dense_attention(q, k, v)))

        g_f = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        g_d = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(g_f, g_d, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3,
                                       err_msg=name)

    def test_bwd_pallas_multi_matches_bwd_xla(self, rng):
        """Direct A/B of the two long-KV backward implementations on the same
        residuals."""
        from crossscore_tpu.ops.flash_attention import (
            _bwd_pallas_multi, _bwd_xla, _flash_fwd, pick_blocks,
        )

        q, k, v = _rand_qkv(rng, b=1, h=2, nq=64, nk=2600, hd=48)
        bq, bk, bh = pick_blocks(64, 2600)
        o, l, m = _flash_fwd(q, k, v, block_q=bq, block_k=bk, block_h=bh)
        do = jnp.asarray(rng.standard_normal(o.shape).astype(np.float32))
        res = (q, k, v, o, l, m)
        dq_p, dk_p, dv_p = _bwd_pallas_multi(q, k, v, o, do, l, m)
        dq_x, dk_x, dv_x = _bwd_xla(res, do, block_k=1024)
        for a, b, name in [(dq_p, dq_x, "dq"), (dk_p, dk_x, "dk"), (dv_p, dv_x, "dv")]:
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4,
                                       err_msg=name)
