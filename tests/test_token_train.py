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

    def test_encoder_uint8_wire_matches_float(self, setup):
        """make_backbone_encoder normalises raw-uint8 inputs on device
        (data.dataset.wire_uint8) — the token-mode lazy-encode and
        tasks.encode_tokens paths must produce the same tokens either wire
        format ships."""
        from crossscore_tpu.io.images import normalize_imagenet

        cfg, model, params, _, _ = setup
        encode = make_backbone_encoder(cfg)
        rng = np.random.default_rng(11)
        u8 = rng.integers(0, 256, (2, 56, 70, 3)).astype(np.uint8)
        f32 = normalize_imagenet(u8.astype(np.float32) / 255.0)
        t_u8 = encode(params, jnp.asarray(u8))
        t_f32 = encode(params, jnp.asarray(f32, jnp.float32))
        np.testing.assert_allclose(np.asarray(t_u8), np.asarray(t_f32),
                                   atol=1e-5, rtol=1e-5)

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


# ---------------------------------------------------------------- stage 2

from crossscore_tpu.data.synthetic import generate  # noqa: E402
from crossscore_tpu.data.token_train import (  # noqa: E402
    _WINDOW_SEED_OFFSET, TokenSpaceLoader, aligned_window, crop_token_grid,
)


@pytest.fixture(scope="module")
def token_ws(tmp_path_factory):
    root = tmp_path_factory.mktemp("tokdata")
    generate(root, hw=(84, 112), scenes_per_split={"train": 2, "val": 1, "test": 1})
    return root


def _uncropped_ds(root, deterministic=False):
    from crossscore_tpu.data import NvsDataset

    return NvsDataset(
        dataset_path=str(root),
        resolution="res_540",
        data_split="train",
        neighbour_config={"strategy": "random", "cross": 2, "deterministic": deterministic},
        metric_type="ssim",
        metric_min=0,
        metric_max=1,
        crop_size=None,
        crop_mode="integer_patches",
        return_item_paths=True,
    )


def _token_loader(setup, root, crop=56, batch_size=3, **kw):
    from crossscore_tpu.data.token_cache import RefTokenCache

    cfg, model, params, _, _ = setup
    encode = jax.jit(make_backbone_encoder(cfg))
    cache = RefTokenCache(lambda imgs, valid_hw=None: encode(params, imgs), encode_batch=4)
    kw.setdefault("num_workers", 2)
    return TokenSpaceLoader(
        _uncropped_ds(root), cache, crop_size=crop,
        batch_size=batch_size, shuffle=True, seed=3, **kw
    ), cache


class TestWindowPrimitives:
    def test_crop_token_grid_matches_manual(self):
        rng = np.random.default_rng(0)
        toks = rng.standard_normal((5, 6 * 8, 16)).astype(np.float32)
        got = crop_token_grid(toks, (6, 8), (2, 3), (3, 4))
        want = toks.reshape(5, 6, 8, 16)[:, 2:5, 3:7].reshape(5, 12, 16)
        np.testing.assert_array_equal(got, want)

    def test_aligned_window_bounds_and_determinism(self):
        rng = np.random.default_rng(0)
        seen = set()
        for _ in range(64):
            i, j = aligned_window((6, 8), (4, 5), rng)
            assert 0 <= i <= 2 and 0 <= j <= 3
            seen.add((i, j))
        assert len(seen) > 3  # actually samples the offset space
        assert aligned_window((6, 8), (4, 5), rng, deterministic=True) == (0, 0)
        with pytest.raises(ValueError, match="larger"):
            aligned_window((3, 8), (4, 5), rng)


class TestTokenSpaceLoader:
    def test_batch_layout_and_correspondence(self, setup, token_ws):
        """Shapes are the decoder-only batch contract; the score-map crop is
        the PIXEL window of the query's token window (re-derived from the
        loader's documented rng stream); ref windows are independent."""
        from crossscore_tpu.data.loader import _fold_rng

        loader, cache = _token_loader(setup, token_ws)
        batches = list(loader.epoch(0))
        assert len(batches) == loader.batches_per_epoch()
        b0 = batches[0]
        assert b0["query/tokens"].shape == (3, 16, 64)       # 4x4 grid, D=64
        assert b0["reference/cross/tokens"].shape == (3, 2, 16, 64)
        assert b0["query/score_map"].shape == (3, 56, 56)

        # re-derive item 0's window from the documented stream
        idx0 = int(loader._plan(0)[0][2]["indices"][0])
        rng = _fold_rng(loader.seed + _WINDOW_SEED_OFFSET, 0, idx0)
        ds = loader.dataset
        item = ds.get_item(idx0, _fold_rng(loader.seed, 0, idx0))
        full_grid = (item["query/img"].shape[0] // 14, item["query/img"].shape[1] // 14)
        i, j = aligned_window(full_grid, (4, 4), rng)
        np.testing.assert_array_equal(
            b0["query/score_map"][0],
            item["query/score_map"][i * 14 : i * 14 + 56, j * 14 : j * 14 + 56],
        )
        # and the token window is the same window of the full-image tokens
        q_full = cache.gather(
            [[item["item_paths"]["query/img"]]],
            item["query/img"][None, None],
        )[0, 0]
        np.testing.assert_array_equal(
            b0["query/tokens"][0], crop_token_grid(q_full, full_grid, (i, j), (4, 4))
        )

    def test_deterministic_epoch_reproduces(self, setup, token_ws):
        loader, _ = _token_loader(setup, token_ws)
        a = [b["query/tokens"] for b in loader.epoch(1)]
        b = [b["query/tokens"] for b in loader.epoch(1)]
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)
        c = [b["query/tokens"] for b in loader.epoch(2)]
        assert any(
            x.shape != y.shape or not np.array_equal(x, y) for x, y in zip(a, c)
        )

    def test_cache_warm_after_first_epoch(self, setup, token_ws):
        loader, cache = _token_loader(setup, token_ws)
        list(loader.epoch(0))
        misses_after_e0 = cache.misses
        assert misses_after_e0 > 0
        list(loader.epoch(1))
        assert cache.misses == misses_after_e0  # epoch 2+: pure numpy slicing

    def test_decode_skip_bit_identical_and_skips(self, setup, token_ws):
        """With the ``query_pixel_skip``/``ref_pixel_skip`` hooks wired (as
        tasks.train does), cached images' pixels are never decoded and the
        token batches stay BIT-IDENTICAL to the no-skip loader — in the cold
        first epoch (late repeats already skip) and in the warm second."""
        from crossscore_tpu.data import fastimage

        if not fastimage.available():
            pytest.skip("native fastimage unavailable (skip path is fused-only)")
        loader_a, cache_a = _token_loader(setup, token_ws)
        loader_b, cache_b = _token_loader(setup, token_ws)
        ds_b = loader_b.dataset
        ds_b.query_pixel_skip = cache_b.has
        ds_b.ref_pixel_skip = cache_b.has
        for epoch in (0, 1):
            for x, y in zip(loader_a.epoch(epoch), loader_b.epoch(epoch)):
                for key in ("query/tokens", "reference/cross/tokens",
                            "query/score_map"):
                    np.testing.assert_array_equal(x[key], y[key], err_msg=key)
        assert cache_b.skipped_decodes > 0  # warm epoch decoded no pixels
        # skipped slots resolve cache-only: no placeholder was ever encoded
        assert cache_b.misses == cache_a.misses

    def test_overfit_decreases_loss(self, setup, token_ws):
        """The decoder-only step TRAINS from token batches end-to-end."""
        import optax

        from crossscore_tpu.train.step import create_train_state, make_train_step

        cfg, model, params, _, _ = setup
        loader, _ = _token_loader(setup, token_ws, batch_size=4)
        batch = next(iter(loader.epoch(0)))
        batch = {k: v for k, v in batch.items() if k != "_valid"}
        tx = optax.adamw(3e-3)
        state = create_train_state(params, tx)
        step = jax.jit(make_train_step(model, tx))
        state, m0 = step(state, batch)
        for _ in range(15):
            state, m = step(state, batch)
        assert float(m["loss"]) < 0.7 * float(m0["loss"])

    def test_guards(self, setup, token_ws):
        from crossscore_tpu.data import NvsDataset

        cfg, model, params, _, _ = setup
        with pytest.raises(ValueError, match="uncropped"):
            ds = NvsDataset(
                dataset_path=str(token_ws), resolution="res_540", data_split="train",
                neighbour_config={"strategy": "random", "cross": 2, "deterministic": True},
                metric_type="ssim", metric_min=0, metric_max=1,
                crop_size=56, crop_mode="dataset_default", return_item_paths=True,
            )
            TokenSpaceLoader(ds, None, crop_size=56, batch_size=2)
        with pytest.raises(ValueError, match="return_item_paths"):
            ds = _uncropped_ds(token_ws)
            ds.return_item_paths = False
            TokenSpaceLoader(ds, None, crop_size=56, batch_size=2)
        with pytest.raises(ValueError, match="multiple"):
            TokenSpaceLoader(_uncropped_ds(token_ws), None, crop_size=50, batch_size=2)

    def test_cache_capacity_capped_by_corpus(self, setup, token_ws):
        """The startup working-set check must not refuse a cache that holds
        the ENTIRE distinct-image corpus — eviction can never occur there,
        whatever the in-flight window is (regression: `need` ignored the
        dataset size, so small-corpus configs failed at startup)."""
        from crossscore_tpu.data.token_cache import RefTokenCache
        from crossscore_tpu.tasks.encode_tokens import unique_image_paths

        cfg, model, params, _, _ = setup
        encode = jax.jit(make_backbone_encoder(cfg))
        ds = _uncropped_ds(token_ws)
        n_corpus = len(unique_image_paths(ds))
        # big batch/prefetch => in-flight working set far above max_items
        cache = RefTokenCache(
            lambda imgs, valid_hw=None: encode(params, imgs),
            encode_batch=4, max_items=n_corpus,
        )
        TokenSpaceLoader(ds, cache, crop_size=56, batch_size=8,
                         num_workers=2, prefetch_batches=8)  # must not raise
        # but a cache smaller than BOTH the corpus and the working set
        # still fails fast
        tiny = RefTokenCache(
            lambda imgs, valid_hw=None: encode(params, imgs),
            encode_batch=4, max_items=2,
        )
        with pytest.raises(ValueError, match="working set"):
            TokenSpaceLoader(_uncropped_ds(token_ws), tiny, crop_size=56,
                             batch_size=8, num_workers=2, prefetch_batches=8)

    def test_cache_capacity_warns_without_native_decoder(
            self, setup, token_ws, monkeypatch):
        """Without the native decoder the decode-skip hooks are never
        installed (tasks/train.py gates them on fastimage.available()), so
        every slot carries real pixels and eviction just re-encodes — the
        undersized-cache check must warn, not refuse to start (regression:
        it raised unconditionally)."""
        import warnings

        from crossscore_tpu.data import fastimage
        from crossscore_tpu.data.token_cache import RefTokenCache

        cfg, model, params, _, _ = setup
        encode = jax.jit(make_backbone_encoder(cfg))
        monkeypatch.setattr(fastimage, "available", lambda: False)
        tiny = RefTokenCache(
            lambda imgs, valid_hw=None: encode(params, imgs),
            encode_batch=4, max_items=2,
        )
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            TokenSpaceLoader(_uncropped_ds(token_ws), tiny, crop_size=56,
                             batch_size=8, num_workers=2, prefetch_batches=8)
        assert any("working set" in str(w.message) for w in caught)


# ---------------------------------------------------------------- stage 3

class TestTokenTrainCLI:
    """this_main.token_space_train=true drives tasks.train end-to-end: the
    token loader feeds the decoder-only step, validation stays on the pixel
    path, checkpoints resume."""

    OVERRIDES = [
        "trainer.accelerator=cpu",
        "model.tpu.compute_dtype=float32",
        "model.backbone.preset=dinov2-test",
        "data.neighbour_config.cross=2",
        "data.loader.train.batch_size=2",
        "data.loader.validation.batch_size=2",
        "data.loader.train.num_workers=2",
        "data.loader.validation.num_workers=2",
        "data.transforms.crop_size=56",
        "this_main.resize_short_side=-1",
        "this_main.token_space_train=true",
        "trainer.num_sanity_val_steps=1",
        "trainer.limit_val_batches=1",
        "logger.vis_scalar_every_n_train_steps=1",
    ]

    def test_train_run_and_resume(self, token_ws, tmp_path, monkeypatch):
        import json

        from crossscore_tpu.tasks.train import main

        monkeypatch.chdir(tmp_path)
        overrides = self.OVERRIDES + [f"data.dataset.path=[{token_ws}]"]
        run_dir = main(overrides + ["trainer.max_epochs=1", "alias=tok1"])
        rows = [json.loads(l) for l in (run_dir / "metrics.jsonl").read_text().splitlines()]
        train_losses = [r["train/loss"] for r in rows if "train/loss" in r]
        assert train_losses and all(np.isfinite(train_losses))
        assert any("validation/loss" in r for r in rows)  # pixel-path val ran

        run2 = main(
            overrides
            + [
                "trainer.max_epochs=2",
                f"trainer.ckpt_path_to_load={run_dir / 'ckpt'}",
                "alias=tok2",
            ]
        )
        rows2 = [json.loads(l) for l in (run2 / "metrics.jsonl").read_text().splitlines()]
        steps2 = [r["step"] for r in rows2 if "train/loss" in r]
        steps1 = [r["step"] for r in rows if "train/loss" in r]
        assert steps2 and min(steps2) > min(steps1)

    def test_overfit_converges(self, token_ws, tmp_path, monkeypatch):
        """trainer.overfit_batches under token mode: deterministic windows,
        loss drops — the token gradient path TRAINS through the CLI."""
        import json

        from crossscore_tpu.tasks.train import main

        monkeypatch.chdir(tmp_path)
        run_dir = main(
            self.OVERRIDES
            + [
                f"data.dataset.path=[{token_ws}]",
                "trainer.overfit_batches=1",
                "trainer.max_epochs=30",
                "trainer.num_sanity_val_steps=0",
                "trainer.limit_val_batches=0",
                "trainer.optimizer.lr=3e-3",
                "alias=tokover",
            ]
        )
        rows = [json.loads(l) for l in (run_dir / "metrics.jsonl").read_text().splitlines()]
        losses = [r["train/loss_cross"] for r in rows if "train/loss_cross" in r]
        assert losses[-1] < 0.5 * losses[0]


class TestEncodeTokensCLI:
    """tasks.encode_tokens: offline token precompute into the shared disk
    store — a training run pointed at the store never touches the encoder."""

    def test_offline_store_makes_training_encode_free(self, token_ws, tmp_path, monkeypatch):
        from crossscore_tpu.data.token_cache import RefTokenCache
        from crossscore_tpu.tasks.encode_tokens import main as encode_main

        monkeypatch.chdir(tmp_path)
        store = tmp_path / "tokens"
        overrides = [
            "trainer.accelerator=cpu",
            "model.tpu.compute_dtype=float32",
            "model.backbone.preset=dinov2-test",
            "data.neighbour_config.cross=2",
            f"data.dataset.path=[{token_ws}]",
            "data.loader.train.num_workers=2",
            "this_main.resize_short_side=-1",
            f"this_main.ref_token_cache_dir={store}",
            "seed=0",
        ]
        n = encode_main(overrides)
        assert n > 0
        assert len(list(store.glob("*.npz"))) == n

        # a loader whose encoder is FORBIDDEN must still serve a full epoch
        # from the store (weights must match: tie them via a fixed seed in a
        # fresh init — the CLI warned accordingly; equality of tokens is
        # separately guaranteed by the cache keys + deterministic init)
        def forbidden(imgs, valid_hw=None):
            raise AssertionError("encoder called despite a warm store")

        cache = RefTokenCache(forbidden, persist_dir=store)
        loader = TokenSpaceLoader(
            _uncropped_ds(token_ws), cache, crop_size=56,
            batch_size=2, shuffle=True, num_workers=2, seed=5,
        )
        batches = list(loader.epoch(0))
        assert batches and cache.disk_hits > 0 and cache.misses == 0

    def test_shard_splits_the_walk(self, token_ws, tmp_path, monkeypatch):
        from crossscore_tpu.tasks.encode_tokens import main as encode_main

        monkeypatch.chdir(tmp_path)
        base = [
            "trainer.accelerator=cpu",
            "model.tpu.compute_dtype=float32",
            "model.backbone.preset=dinov2-test",
            "data.neighbour_config.cross=2",
            f"data.dataset.path=[{token_ws}]",
            "this_main.resize_short_side=-1",
            "seed=0",
        ]
        s0 = tmp_path / "t0"
        n0 = encode_main(base + [f"this_main.ref_token_cache_dir={s0}",
                                 "this_main.encode_shard=0/2"])
        n1 = encode_main(base + [f"this_main.ref_token_cache_dir={s0}",
                                 "this_main.encode_shard=1/2"])
        full = tmp_path / "tfull"
        n_all = encode_main(base + [f"this_main.ref_token_cache_dir={full}"])
        assert n0 + n1 == n_all
        assert len(list(s0.glob("*.npz"))) == len(list(full.glob("*.npz")))


class TestTokenLoaderMultiHost:
    def test_two_shards_cover_the_epoch_disjointly(self, setup, token_ws):
        """num_shards=2: window rng keys on the GLOBAL dataset index, so the
        union of both shards' batches equals a single-host epoch's items
        (same windows for the same index, reference DistributedSampler
        semantics)."""
        full, _ = _token_loader(setup, token_ws, batch_size=2)

        def items_of(loader):
            out = {}
            for bi, batch in enumerate(loader._plan(0)):
                chunk = batch[2]["indices"]
                for idx in chunk:
                    out[int(idx)] = True
            return set(out)

        sh0, _ = _token_loader(setup, token_ws, batch_size=2,
                               shard_index=0, num_shards=2)
        sh1, _ = _token_loader(setup, token_ws, batch_size=2,
                               shard_index=1, num_shards=2)
        i_all, i0, i1 = items_of(full), items_of(sh0), items_of(sh1)
        assert i0 | i1 == i_all
        # wrap-around padding may duplicate a few head items across shards;
        # true disjointness holds for the non-padded majority
        assert len(i0 & i1) <= 1

        # same global index -> same token window on either shard
        common = int(next(iter(i0)))
        def window_of(loader, idx):
            from crossscore_tpu.data.loader import _fold_rng
            rng = _fold_rng(loader.seed + _WINDOW_SEED_OFFSET, 0, idx)
            return aligned_window((6, 8), loader.crop_grid, rng)
        assert window_of(sh0, common) == window_of(full, common)


def test_token_loader_over_record_shards_matches_filesystem(setup, token_ws, tmp_path):
    """Composition: token-space training reads full images through the
    record-shard store (data/records.py) bit-identically to the filesystem
    walk — same windows, same tokens, same score-map crops."""
    from crossscore_tpu.data import NvsDataset
    from crossscore_tpu.data.records import pack
    from crossscore_tpu.data.token_cache import RefTokenCache

    pack(token_ws, tmp_path / "packed", shard_mb=64, verbose=False)

    cfg, model, params, _, _ = setup
    encode = jax.jit(make_backbone_encoder(cfg))

    def loader(record_dir=None):
        ds = NvsDataset(
            dataset_path=str(token_ws), resolution="res_540", data_split="train",
            neighbour_config={"strategy": "random", "cross": 2, "deterministic": False},
            metric_type="ssim", metric_min=0, metric_max=1,
            crop_size=None, crop_mode="integer_patches", return_item_paths=True,
            record_dir=record_dir,
        )
        cache = RefTokenCache(lambda imgs, valid_hw=None: encode(params, imgs), encode_batch=4)
        return TokenSpaceLoader(ds, cache, crop_size=56, batch_size=2,
                                shuffle=True, num_workers=2, seed=11)

    fs_batches = list(loader().epoch(0))
    rec_batches = list(loader(str(tmp_path / "packed")).epoch(0))
    assert len(fs_batches) == len(rec_batches)
    for a, b in zip(fs_batches, rec_batches):
        for key in ("query/tokens", "reference/cross/tokens", "query/score_map"):
            np.testing.assert_array_equal(np.asarray(a[key]), np.asarray(b[key]))


def test_parallel_slicing_matches_serial(setup, token_ws):
    """The per-item slice pool (multi-core hosts) is bitwise identical to the
    serial path — rng streams are per-item, so order cannot matter."""
    serial, _ = _token_loader(setup, token_ws, batch_size=4, num_workers=1)
    parallel, _ = _token_loader(setup, token_ws, batch_size=4, num_workers=4)
    for a, b in zip(serial.epoch(0), parallel.epoch(0)):
        for key in ("query/tokens", "reference/cross/tokens", "query/score_map"):
            np.testing.assert_array_equal(np.asarray(a[key]), np.asarray(b[key]))


def test_window_primitives_fuzz():
    """Randomized grids/windows: crop_token_grid equals the naive gather for
    arbitrary leading dims, dtypes, and window positions."""
    rng = np.random.default_rng(42)
    for _ in range(25):
        gh, gw = int(rng.integers(2, 12)), int(rng.integers(2, 12))
        ch, cw = int(rng.integers(1, gh + 1)), int(rng.integers(1, gw + 1))
        d = int(rng.integers(1, 9)) * 8
        lead = () if rng.random() < 0.5 else (int(rng.integers(1, 4)),)
        dtype = rng.choice([np.float32, np.float16])
        toks = rng.standard_normal((*lead, gh * gw, d)).astype(dtype)
        i, j = aligned_window((gh, gw), (ch, cw), rng)
        got = crop_token_grid(toks, (gh, gw), (i, j), (ch, cw))
        want = toks.reshape(*lead, gh, gw, d)[..., i:i + ch, j:j + cw, :]
        want = want.reshape(*lead, ch * cw, d)
        np.testing.assert_array_equal(got, want)
        # window always in bounds
        assert 0 <= i <= gh - ch and 0 <= j <= gw - cw


class TestTrainRecipe:
    """this_main.train_recipe=token_fast — the one-flag production recipe
    (tasks/train.py apply_train_recipe)."""

    def _cfg(self, extra):
        from crossscore_tpu.tasks.common import parse_cli

        return parse_cli("default", TestTokenTrainCLI.OVERRIDES[:9] + extra)

    def test_composes_fast_path_keys(self):
        from crossscore_tpu.tasks.train import apply_train_recipe

        from crossscore_tpu.data.token_train import token_working_set

        cfg = self._cfg([
            "this_main.train_recipe=token_fast",
            "data.transforms.crop_size=28",
            "this_main.resize_short_side=84",
        ])
        assert apply_train_recipe(cfg) == "token_fast"
        assert cfg.this_main.token_space_train is True
        assert cfg.data.dataset.wire_uint8 is True
        # cache sized by the loader's own working-set formula (one source)
        need = token_working_set(
            int(cfg.data.loader.train.prefetch_factor), 2, 2)
        assert int(cfg.this_main.ref_token_cache_max_items) >= need

    def test_coverage_guard_measured_points(self, token_ws):
        """token_fast_coverage_guard on the dataset's true image sizes:
        the three measured A/B points (0.69 coverage equal; 0.45 and 0.16
        regressed, docs/results/ab_token_vs_pixel_*) motivate the 0.6 area
        threshold — low-coverage geometry must warn and fall back."""
        from crossscore_tpu.confsys import set_key
        from crossscore_tpu.tasks.train import token_fast_coverage_guard

        ds = _uncropped_ds(token_ws)  # 84x112 full images
        cfg = self._cfg([])
        # crop 56 -> 56^2/(84*112) = 33% coverage: below the 0.6 default
        set_key(cfg, "data.transforms.crop_size", 56)
        with pytest.warns(RuntimeWarning, match="token_fast_min_coverage"):
            assert token_fast_coverage_guard(cfg, ds) is False
        # crop 84 -> 75% coverage: engages silently
        set_key(cfg, "data.transforms.crop_size", 84)
        assert token_fast_coverage_guard(cfg, ds) is True
        # the knob moves the cut
        set_key(cfg, "data.transforms.crop_size", 56)
        set_key(cfg, "this_main.token_fast_min_coverage", 0.2)
        assert token_fast_coverage_guard(cfg, ds) is True

    def test_unknown_recipe_raises(self):
        from crossscore_tpu.tasks.train import apply_train_recipe

        cfg = self._cfg(["this_main.train_recipe=warp9"])
        with pytest.raises(ValueError, match="train_recipe"):
            apply_train_recipe(cfg)

    def test_coverage_guard_concat_dataset(self, token_ws):
        """Multi-root corpora (ConcatDataset) go through the same guard —
        get_item_shape dispatches to the owning leaf."""
        from crossscore_tpu.confsys import set_key
        from crossscore_tpu.data.nvs_index import ConcatDataset
        from crossscore_tpu.tasks.train import token_fast_coverage_guard

        ds = ConcatDataset([_uncropped_ds(token_ws), _uncropped_ds(token_ws)])
        cfg = self._cfg([])
        set_key(cfg, "data.transforms.crop_size", 84)  # 75% coverage
        assert token_fast_coverage_guard(cfg, ds) is True
        set_key(cfg, "data.transforms.crop_size", 56)  # 33%
        with pytest.warns(RuntimeWarning, match="token_fast_min_coverage"):
            assert token_fast_coverage_guard(cfg, ds) is False

    def test_e2e_low_coverage_falls_back_to_pixel(self, token_ws, tmp_path,
                                                   monkeypatch):
        """Default coverage threshold on the toy corpus (33% coverage):
        tasks.train must warn, rebuild the pixel dataset, and complete on
        the reference crop path."""
        import json

        from crossscore_tpu.tasks.train import main

        monkeypatch.chdir(tmp_path)
        overrides = [
            o for o in TestTokenTrainCLI.OVERRIDES
            if not o.startswith("this_main.token_space_train")
        ] + [
            f"data.dataset.path=[{token_ws}]",
            "this_main.train_recipe=token_fast",
            "trainer.max_epochs=1",
            "alias=lowcov",
        ]
        with pytest.warns(RuntimeWarning, match="token_fast_min_coverage"):
            run_dir = main(overrides)
        rows = [json.loads(l) for l in (run_dir / "metrics.jsonl").read_text().splitlines()]
        losses = [r["train/loss"] for r in rows if "train/loss" in r]
        assert losses and all(np.isfinite(losses))

    def test_e2e_train_run(self, token_ws, tmp_path, monkeypatch):
        """The one-flag recipe drives tasks.train end-to-end on CPU: token
        loader + uint8 wire + sized cache, finite losses, pixel-path val."""
        import json

        from crossscore_tpu.tasks.train import main

        monkeypatch.chdir(tmp_path)
        overrides = [
            o for o in TestTokenTrainCLI.OVERRIDES
            if not o.startswith("this_main.token_space_train")
        ] + [
            f"data.dataset.path=[{token_ws}]",
            "this_main.train_recipe=token_fast",
            # toy CPU geometry: crop 56 on 84x112 images = 33% coverage
            "this_main.token_fast_min_coverage=0.2",
            "trainer.max_epochs=1",
            "alias=recipe",
        ]
        run_dir = main(overrides)
        rows = [json.loads(l) for l in (run_dir / "metrics.jsonl").read_text().splitlines()]
        train_losses = [r["train/loss"] for r in rows if "train/loss" in r]
        assert train_losses and all(np.isfinite(train_losses))
        assert any("validation/loss" in r for r in rows)
