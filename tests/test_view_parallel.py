"""Reference-view parallelism: sharded K views == single-device forward."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from crossscore_tpu.models import CrossScoreNet, CrossScoreConfig, ViTConfig
from crossscore_tpu.parallel import make_mesh
from crossscore_tpu.parallel.view_parallel import make_view_parallel_apply

VIT = ViTConfig(hidden_size=64, num_layers=2, num_heads=4, patch_size=14, image_size=56)


def _cfg(impl):
    return CrossScoreConfig(
        backbone=VIT, pe_h=6, pe_w=6, decoder_heads=4, attention_impl=impl
    )


class TestViewParallel:
    def test_matches_single_device(self, rng):
        b, k, hw = 1, 8, 56
        query = jnp.asarray(rng.standard_normal((b, hw, hw, 3)).astype(np.float32))
        refs = jnp.asarray(rng.standard_normal((b, k, hw, hw, 3)).astype(np.float32))

        ref_model = CrossScoreNet(_cfg("xla"))
        params = ref_model.init(jax.random.PRNGKey(0), query, refs)["params"]
        expected = ref_model.apply({"params": params}, query, refs)["score_map_ref_cross"]

        mesh = make_mesh(4)  # 4-way view parallelism over the 'data' axis
        cp_model = CrossScoreNet(_cfg("cp:data"))
        fn = make_view_parallel_apply(cp_model, mesh)
        out = fn(params, query, refs)

        assert out.shape == expected.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=5e-5)

    def test_wrong_impl_raises(self):
        mesh = make_mesh(2)
        model = CrossScoreNet(_cfg("xla"))
        with pytest.raises(ValueError, match="cp:"):
            make_view_parallel_apply(model, mesh)

    def test_wrong_axis_name_raises(self):
        """A cp model whose AXIS doesn't match the mesh axis must fail at
        the guard (regression: only the 'cp:' prefix was checked, so the
        mismatch died deep in tracing with an unbound-axis-name error)."""
        mesh = make_mesh(2)  # axis name: 'data'
        model = CrossScoreNet(_cfg("cp:view"))
        with pytest.raises(ValueError, match="cp:data"):
            make_view_parallel_apply(model, mesh)

    def test_gradients_flow(self, rng):
        """Training through view parallelism: grads wrt decoder params match
        the single-device model (backbone frozen via stop_gradient)."""
        b, k, hw = 1, 4, 56
        query = jnp.asarray(rng.standard_normal((b, hw, hw, 3)).astype(np.float32))
        refs = jnp.asarray(rng.standard_normal((b, k, hw, hw, 3)).astype(np.float32))
        gt = jnp.asarray(rng.random((b, hw, hw)).astype(np.float32))

        ref_model = CrossScoreNet(_cfg("xla"))
        params = ref_model.init(jax.random.PRNGKey(0), query, refs)["params"]

        def loss_single(p):
            out = ref_model.apply({"params": p}, query, refs)["score_map_ref_cross"]
            return jnp.abs(out - gt).mean()

        mesh = make_mesh(4)
        cp_model = CrossScoreNet(_cfg("cp:data"))
        fn = make_view_parallel_apply(cp_model, mesh)

        def loss_cp(p):
            return jnp.abs(fn(p, query, refs) - gt).mean()

        g1 = jax.grad(loss_single)(params)["head_fc2"]["kernel"]
        g2 = jax.grad(loss_cp)(params)["head_fc2"]["kernel"]
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)

    def test_cached_tokens_vp_matches_single_device(self, rng):
        """cache x view-parallel: precomputed reference tokens sharded over
        the view axis (make_view_parallel_apply_tokens) reproduce the dense
        single-device forward exactly (the serving composition in
        tasks/predict.py)."""
        from crossscore_tpu.models.crossscore import make_backbone_encoder
        from crossscore_tpu.parallel.view_parallel import (
            make_view_parallel_apply_tokens,
        )

        b, k, hw = 1, 8, 56
        query = jnp.asarray(rng.standard_normal((b, hw, hw, 3)).astype(np.float32))
        refs = jnp.asarray(rng.standard_normal((b, k, hw, hw, 3)).astype(np.float32))

        ref_model = CrossScoreNet(_cfg("xla"))
        params = ref_model.init(jax.random.PRNGKey(0), query, refs)["params"]
        expected = ref_model.apply({"params": params}, query, refs)["score_map_ref_cross"]

        encode = make_backbone_encoder(_cfg("cp:data"))
        tokens = encode(params, refs.reshape(b * k, hw, hw, 3))
        tokens = tokens.reshape(b, k, *tokens.shape[1:])

        mesh = make_mesh(4)
        cp_model = CrossScoreNet(_cfg("cp:data"))
        fn = make_view_parallel_apply_tokens(cp_model, mesh)
        out = fn(params, query, tokens)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=5e-5)

    def test_cached_tokens_vp_host_local_mesh(self, rng):
        """cache x view-parallel x multi-host: the per-process step runs on a
        host-LOCAL 'view' mesh (parallel.local_view_mesh) — simulated here by
        a sub-mesh of 4 of the 8 devices, as one host of a two-host slice —
        and must still match the dense forward. Data parallelism across hosts
        is the per-process query shard, exercised by the multi-host loader
        tests; this pins the per-host compute."""
        from jax.sharding import Mesh
        from crossscore_tpu.models.crossscore import make_backbone_encoder
        from crossscore_tpu.parallel import local_view_mesh
        from crossscore_tpu.parallel.view_parallel import (
            make_view_parallel_apply_tokens,
        )

        # single-process: local_view_mesh() covers all devices with the
        # 'view' axis — shape and axis-name contract
        lm = local_view_mesh()
        assert lm.axis_names == ("view",)
        assert lm.devices.size == len(jax.local_devices())

        b, k, hw = 2, 4, 56
        query = jnp.asarray(rng.standard_normal((b, hw, hw, 3)).astype(np.float32))
        refs = jnp.asarray(rng.standard_normal((b, k, hw, hw, 3)).astype(np.float32))

        ref_model = CrossScoreNet(_cfg("xla"))
        params = ref_model.init(jax.random.PRNGKey(0), query, refs)["params"]
        expected = ref_model.apply({"params": params}, query, refs)["score_map_ref_cross"]

        encode = make_backbone_encoder(_cfg("cp:view"))
        tokens = encode(params, refs.reshape(b * k, hw, hw, 3))
        tokens = tokens.reshape(b, k, *tokens.shape[1:])

        sub = Mesh(np.asarray(jax.devices()[:4]), ("view",))
        cp_model = CrossScoreNet(_cfg("cp:view"))
        fn = make_view_parallel_apply_tokens(cp_model, sub)
        out = fn(params, query, tokens)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=5e-5)
