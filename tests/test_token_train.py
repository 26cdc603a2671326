"""Token-space training, stage 1: the decoder-only graph.

``query_tokens`` + ``ref_tokens`` + ``token_grid`` skip the frozen backbone
entirely (``models/crossscore.py``). Exactness contract: feeding the SAME
tokens the in-graph encoder would produce yields the same score map and the
same trainable-param gradients — so training on precomputed tokens is the
same optimisation problem whenever the tokens match (the token-space CROP
approximation is a separate, documented semantic choice tested in stage 2).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crossscore_tpu.models import CrossScoreConfig, CrossScoreNet
from crossscore_tpu.models.crossscore import make_backbone_encoder
from crossscore_tpu.models.dinov2 import VIT_PRESETS


@pytest.fixture(scope="module")
def setup():
    cfg = CrossScoreConfig(backbone=VIT_PRESETS["dinov2-test"])
    model = CrossScoreNet(cfg)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((2, 56, 70, 3)), jnp.float32)
    r = jnp.asarray(rng.standard_normal((2, 3, 56, 70, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), q, r)["params"]
    return cfg, model, params, q, r


def _tokens(cfg, model, params, q, r):
    encode = make_backbone_encoder(cfg)
    b, k = r.shape[:2]
    # one grouped call (queries then refs) — the same batch shape the pixel
    # graph uses, so the tokens are bitwise identical to the in-graph encode
    all_tok = encode(params, jnp.concatenate([q, r.reshape(b * k, *r.shape[2:])]))
    return all_tok[:b], all_tok[b:].reshape(b, k, *all_tok.shape[1:])


class TestDecoderOnlyGraph:
    def test_matches_pixel_graph(self, setup):
        cfg, model, params, q, r = setup
        q_tok, r_tok = _tokens(cfg, model, params, q, r)
        want = model.apply({"params": params}, q, r)["score_map_ref_cross"]
        got = model.apply(
            {"params": params}, None, None, ref_tokens=r_tok,
            query_tokens=q_tok, token_grid=(4, 5),
        )["score_map_ref_cross"]
        # bit-identical on a single device; the 8-virtual-device test env
        # partitions CPU ops differently per graph -> ~5e-7 reduction noise
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

    def test_gradients_match_pixel_graph(self, setup):
        """Same tokens => same loss surface for the trainable params: the
        decoder-only step optimises exactly what the pixel step does."""
        cfg, model, params, q, r = setup
        q_tok, r_tok = _tokens(cfg, model, params, q, r)
        gt = jnp.asarray(np.random.default_rng(1).random((2, 56, 70)), jnp.float32)

        def pixel_loss(p):
            m = model.apply({"params": p}, q, r)["score_map_ref_cross"]
            return jnp.abs(m - gt).mean()

        def token_loss(p):
            m = model.apply(
                {"params": p}, None, None, ref_tokens=r_tok,
                query_tokens=q_tok, token_grid=(4, 5),
            )["score_map_ref_cross"]
            return jnp.abs(m - gt).mean()

        g_pix = jax.grad(pixel_loss)(params)
        g_tok = jax.grad(token_loss)(params)
        flat_pix = jax.tree_util.tree_flatten_with_path(g_pix)[0]
        flat_tok = {jax.tree_util.keystr(p): g for p, g in
                    jax.tree_util.tree_flatten_with_path(g_tok)[0]}
        checked = 0
        for path, g in flat_pix:
            name = jax.tree_util.keystr(path)
            if "backbone" in name:
                continue  # frozen either way (stop_gradient)
            np.testing.assert_allclose(
                np.asarray(flat_tok[name]), np.asarray(g), atol=1e-6, err_msg=name
            )
            checked += 1
        assert checked > 10

    def test_train_step_consumes_token_batches(self, setup):
        """make_train_step needs no variant: loss_fn branches on the
        query/tokens batch key, and a few steps reduce the loss."""
        import optax

        from crossscore_tpu.train.step import create_train_state, make_train_step

        cfg, model, params, q, r = setup
        q_tok, r_tok = _tokens(cfg, model, params, q, r)
        gt = jnp.asarray(np.random.default_rng(2).random((2, 56, 70)), jnp.float32)
        batch = {
            "query/tokens": q_tok,
            "reference/cross/tokens": r_tok,
            "query/score_map": gt,
        }
        tx = optax.adamw(1e-3)
        state = create_train_state(params, tx)
        step = jax.jit(make_train_step(model, tx))
        state, m0 = step(state, batch)
        for _ in range(10):
            state, m = step(state, batch)
        assert float(m["loss"]) < float(m0["loss"])

    def test_guards(self, setup):
        cfg, model, params, q, r = setup
        q_tok, r_tok = _tokens(cfg, model, params, q, r)
        with pytest.raises(ValueError, match="requires ref_tokens"):
            model.apply({"params": params}, None, None, query_tokens=q_tok,
                        token_grid=(4, 5))
        with pytest.raises(ValueError, match="not both"):
            model.apply({"params": params}, q, None, ref_tokens=r_tok,
                        query_tokens=q_tok, token_grid=(4, 5))
        with pytest.raises(ValueError, match="token_grid is"):
            model.apply({"params": params}, None, None, ref_tokens=r_tok,
                        query_tokens=q_tok, token_grid=(5, 5))
        with pytest.raises(ValueError, match="pixel-space"):
            model.apply({"params": params}, None, None, ref_tokens=r_tok,
                        query_tokens=q_tok, token_grid=(4, 5),
                        valid_hw=jnp.asarray([56, 70]))
