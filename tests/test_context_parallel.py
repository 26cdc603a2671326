"""Context-parallel cross-attention over the 8-device virtual mesh."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from crossscore_tpu.ops.context_parallel import context_parallel_cross_attention
from crossscore_tpu.models.decoder import dense_attention
from crossscore_tpu.parallel import make_mesh


class TestContextParallelAttention:
    def _run(self, rng, n_ctx, nq=64, nk=512, b=2, h=2, hd=48):
        q = jnp.asarray(rng.standard_normal((b, h, nq, hd)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((b, h, nk, hd)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((b, h, nk, hd)).astype(np.float32))

        devices = np.asarray(jax.devices()[:n_ctx])
        mesh = Mesh(devices, ("ctx",))

        fn = shard_map(
            lambda q, k, v: context_parallel_cross_attention(q, k, v, axis_name="ctx"),
            mesh=mesh,
            in_specs=(P(), P(None, None, "ctx", None), P(None, None, "ctx", None)),
            out_specs=P(),
            check_vma=False,  # pallas_call outputs don't declare vma
        )
        out = fn(q, k, v)
        expected = dense_attention(q, k, v)
        return np.asarray(out), np.asarray(expected)

    def test_matches_dense_8way(self, rng):
        out, expected = self._run(rng, n_ctx=8)
        np.testing.assert_allclose(out, expected, atol=5e-5)

    def test_matches_dense_2way_uneven_tokens(self, rng):
        # nk=300 -> 150 tokens/shard, not a block multiple: exercises padding
        out, expected = self._run(rng, n_ctx=2, nk=300)
        np.testing.assert_allclose(out, expected, atol=5e-5)

    def test_extreme_logits_stable_across_shards(self, rng):
        q = jnp.asarray(rng.standard_normal((1, 1, 32, 16)).astype(np.float32)) * 20
        k = jnp.asarray(rng.standard_normal((1, 1, 256, 16)).astype(np.float32)) * 20
        v = jnp.asarray(rng.standard_normal((1, 1, 256, 16)).astype(np.float32))
        mesh = Mesh(np.asarray(jax.devices()[:4]), ("ctx",))
        fn = shard_map(
            lambda q, k, v: context_parallel_cross_attention(q, k, v, axis_name="ctx"),
            mesh=mesh,
            in_specs=(P(), P(None, None, "ctx", None), P(None, None, "ctx", None)),
            out_specs=P(),
            check_vma=False,  # pallas_call outputs don't declare vma
        )
        out = np.asarray(fn(q, k, v))
        assert np.isfinite(out).all()
        expected = np.asarray(dense_attention(q, k, v))
        np.testing.assert_allclose(out, expected, atol=1e-4)


class TestContextParallelGradients:
    def test_grads_match_dense(self, rng):
        b, h, nq, nk, hd = 1, 2, 40, 256, 32
        q = jnp.asarray(rng.standard_normal((b, h, nq, hd)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((b, h, nk, hd)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((b, h, nk, hd)).astype(np.float32))
        mesh = Mesh(np.asarray(jax.devices()[:4]), ("ctx",))

        def sharded_loss(q, k, v):
            def inner(q, k, v):
                out = context_parallel_cross_attention(q, k, v, axis_name="ctx")
                return jax.lax.psum(jnp.sum(out**2), axis_name="ctx") / 4.0

            return shard_map(
                inner, mesh=mesh,
                in_specs=(P(), P(None, None, "ctx", None), P(None, None, "ctx", None)),
                out_specs=P(), check_vma=False,
            )(q, k, v)

        def dense_loss(q, k, v):
            return jnp.sum(dense_attention(q, k, v) ** 2)

        g_cp = jax.grad(sharded_loss, argnums=(0, 1, 2))(q, k, v)
        g_d = jax.grad(dense_loss, argnums=(0, 1, 2))(q, k, v)
        for a, b_, name in zip(g_cp, g_d, "qkv"):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=1e-4, err_msg=f"grad {name}"
            )
