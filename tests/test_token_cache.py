"""Cached-reference serving path: RefTokenCache unit tests, model-level
exactness of the ``ref_tokens`` input, and an e2e predict run asserting the
cache produces identical outputs to the uncached path."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crossscore_tpu.data.token_cache import RefTokenCache


def _fake_encoder(counter):
    """(B, H, W, 3) -> (B, 4, 2) tokens derived from the pixel sum; counts
    encode-batch calls."""

    def encode(imgs):
        counter["calls"] += 1
        counter["images"] += imgs.shape[0]
        s = imgs.reshape(imgs.shape[0], -1).sum(axis=1)
        return np.tile(s[:, None, None], (1, 4, 2)).astype(np.float32)

    return encode


class TestRefTokenCache:
    def _mk(self, tmp_path, n):
        paths = []
        for i in range(n):
            p = tmp_path / f"ref_{i}.png"
            p.write_bytes(b"x")
            paths.append(str(p))
        return paths

    def test_dedup_within_batch_and_across_calls(self, tmp_path, rng):
        counter = {"calls": 0, "images": 0}
        cache = RefTokenCache(_fake_encoder(counter), encode_batch=4)
        paths = self._mk(tmp_path, 3)
        imgs = rng.standard_normal((2, 2, 8, 8, 3)).astype(np.float32)
        # batch uses refs [0,1] and [1,2]: 3 unique among 4 slots
        imgs[0, 1] = imgs[1, 0]
        ref_paths = [[paths[0], paths[1]], [paths[1], paths[2]]]  # [k][b] layout
        ref_paths = [list(col) for col in zip(*ref_paths)]  # -> [k][b]
        out = cache.gather(ref_paths, imgs)
        assert out.shape == (2, 2, 4, 2)
        assert counter["calls"] == 1  # 3 misses pad to one 4-batch
        # exactness: each slot equals the fake encoding of its own pixels
        for bb in range(2):
            for kk in range(2):
                expect = imgs[bb, kk].sum()
                np.testing.assert_allclose(out[bb, kk, 0, 0], expect, rtol=1e-6)
        # second gather: all hits, no new encode calls
        cache.gather(ref_paths, imgs)
        assert counter["calls"] == 1

    def test_nostack_gather_returns_cache_buffers(self, tmp_path, rng):
        """``stack=False`` returns the cache's OWN arrays (zero-copy — the
        token-space loader slices windows straight out of them) with values
        identical to the stacked form."""
        counter = {"calls": 0, "images": 0}
        cache = RefTokenCache(_fake_encoder(counter), encode_batch=4)
        paths = self._mk(tmp_path, 4)
        imgs = rng.standard_normal((2, 2, 8, 8, 3)).astype(np.float32)
        ref_paths = [[paths[0], paths[1]], [paths[2], paths[3]]]  # [k][b]
        stacked = cache.gather(ref_paths, imgs)
        nested = cache.gather(ref_paths, imgs, stack=False)
        assert counter["calls"] == 1  # second gather was all-hits
        assert isinstance(nested, list) and len(nested) == 2
        for bb in range(2):
            for kk in range(2):
                np.testing.assert_array_equal(nested[bb][kk], stacked[bb, kk])
                # identity, not a copy: the array IS the cached buffer
                key = cache._key(ref_paths[kk][bb], imgs.shape[2:4])
                assert nested[bb][kk] is cache._cache[key]

    def test_chunking_pads_to_fixed_graph(self, tmp_path, rng):
        counter = {"calls": 0, "images": 0}
        cache = RefTokenCache(_fake_encoder(counter), encode_batch=2)
        paths = self._mk(tmp_path, 5)
        imgs = rng.standard_normal((1, 5, 4, 4, 3)).astype(np.float32)
        ref_paths = [[paths[k]] for k in range(5)]
        cache.gather(ref_paths, imgs)
        assert counter["calls"] == 3  # 5 misses -> chunks of 2 (last padded)
        assert counter["images"] == 6  # every chunk at the fixed batch size

    def test_skipped_slot_rescued_by_same_batch_miss(self, tmp_path, rng):
        """A decode-skipped slot whose entry was evicted is RESCUED when a
        non-skipped slot of the same batch carries real pixels for the same
        image (the miss-encode repopulates the key) — only a skipped slot
        with no RAM, disk, or same-batch pixel source hard-fails."""
        counter = {"calls": 0, "images": 0}
        cache = RefTokenCache(_fake_encoder(counter), encode_batch=2,
                              max_items=8)
        paths = self._mk(tmp_path, 2)
        imgs = rng.standard_normal((2, 1, 4, 4, 3)).astype(np.float32)
        imgs[1, 0] = imgs[0, 0]  # both slots are the same image X
        ref_paths = [[paths[0], paths[0]]]  # [k][b]: X in both batch rows
        # slot (b=0) skipped with its entry NOT cached; slot (b=1) carries
        # the real pixels — gather must encode once and serve both
        out = cache.gather(ref_paths, imgs, skipped=[[True], [False]])
        np.testing.assert_allclose(out[0, 0, 0, 0], imgs[0, 0].sum(), rtol=1e-6)
        np.testing.assert_array_equal(out[0, 0], out[1, 0])
        # with NO pixel source anywhere, the skipped slot still hard-fails
        fresh = RefTokenCache(_fake_encoder(counter), encode_batch=2,
                              max_items=8)
        only_skipped = rng.standard_normal((1, 1, 4, 4, 3)).astype(np.float32)
        with pytest.raises(RuntimeError, match="evicted"):
            fresh.gather([[paths[1]]], only_skipped, skipped=[[True]])

    def test_lru_eviction(self, tmp_path, rng):
        counter = {"calls": 0, "images": 0}
        cache = RefTokenCache(_fake_encoder(counter), encode_batch=1, max_items=2)
        paths = self._mk(tmp_path, 3)
        imgs = rng.standard_normal((1, 1, 4, 4, 3)).astype(np.float32)
        for k in range(3):
            cache.gather([[paths[k]]], imgs)
        assert len(cache) == 2
        cache.gather([[paths[0]]], imgs)  # evicted -> re-encoded
        assert counter["calls"] == 4


class TestModelRefTokens:
    def test_ref_tokens_equals_ref_imgs(self, rng):
        """CrossScoreNet(query, ref_tokens=encode(refs)) must equal
        CrossScoreNet(query, refs) exactly (the backbone is frozen and
        deterministic — reference task/core.py:119-161)."""
        from crossscore_tpu.models import CrossScoreNet, CrossScoreConfig
        from crossscore_tpu.models.crossscore import make_backbone_encoder
        from crossscore_tpu.models.dinov2 import VIT_PRESETS

        cfg = CrossScoreConfig(backbone=VIT_PRESETS["dinov2-test"], pe_h=6, pe_w=6)
        model = CrossScoreNet(cfg)
        query = jnp.asarray(rng.standard_normal((1, 56, 56, 3)), jnp.float32)
        refs = jnp.asarray(rng.standard_normal((1, 2, 56, 56, 3)), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), query, refs)["params"]

        want = model.apply({"params": params}, query, refs)["score_map_ref_cross"]
        encode = make_backbone_encoder(cfg)
        tokens = encode(params, refs.reshape(2, 56, 56, 3)).reshape(1, 2, 16, 64)
        got = model.apply({"params": params}, query, None, ref_tokens=tokens)[
            "score_map_ref_cross"
        ]
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_ref_imgs_and_tokens_mutually_exclusive(self, rng):
        from crossscore_tpu.models import CrossScoreNet, CrossScoreConfig
        from crossscore_tpu.models.dinov2 import VIT_PRESETS

        cfg = CrossScoreConfig(backbone=VIT_PRESETS["dinov2-test"], pe_h=6, pe_w=6)
        model = CrossScoreNet(cfg)
        query = jnp.asarray(rng.standard_normal((1, 56, 56, 3)), jnp.float32)
        refs = jnp.asarray(rng.standard_normal((1, 2, 56, 56, 3)), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), query, refs)["params"]
        with pytest.raises(ValueError, match="not both"):
            model.apply({"params": params}, query, refs,
                        ref_tokens=jnp.zeros((1, 2, 16, 64)))


class TestPredictWithCache:
    @pytest.fixture(scope="class")
    def ws(self, tmp_path_factory):
        from crossscore_tpu.data.synthetic import generate

        root = tmp_path_factory.mktemp("cache_ws")
        generate(root / "datadir", hw=(84, 112),
                 scenes_per_split={"train": 1, "val": 1, "test": 1})
        old = os.getcwd()
        os.chdir(root)
        yield root
        os.chdir(old)

    def test_cached_predict_identical_outputs(self, ws):
        from crossscore_tpu.tasks.predict import main

        common = [
            "trainer.accelerator=cpu",
            "model.tpu.compute_dtype=float32",
            "model.backbone.preset=dinov2-test",
            "data.neighbour_config.cross=2",
            "data.dataset.query_dir=datadir/res_540/s00002/test/ours_1000/renders",
            "data.dataset.reference_dir=datadir/res_540/s00002/train/ours_1000/gt",
            "data.loader.validation.batch_size=2",
            "data.loader.validation.num_workers=2",
            "this_main.resize_short_side=84",
            "this_main.ref_token_cache_encode_batch=2",
        ]
        out_off = main(common + ["this_main.ref_token_cache=off", "alias=nocache"])
        out_on = main(common + ["this_main.ref_token_cache=on", "alias=cache"])
        maps_off = sorted((out_off / "batch" / "score_map_ref_cross").glob("*.png"))
        maps_on = sorted((out_on / "batch" / "score_map_ref_cross").glob("*.png"))
        assert len(maps_off) == len(maps_on) == 3
        for a, b in zip(maps_off, maps_on):
            assert a.name == b.name
            assert a.read_bytes() == b.read_bytes(), a.name


class TestTestTaskWithCache:
    @pytest.fixture(scope="class")
    def ws(self, tmp_path_factory):
        from crossscore_tpu.data.synthetic import generate

        root = tmp_path_factory.mktemp("cache_test_ws")
        generate(root / "datadir", hw=(84, 112),
                 scenes_per_split={"train": 1, "val": 1, "test": 1})
        old = os.getcwd()
        os.chdir(root)
        yield root
        os.chdir(old)

    def test_cached_eval_identical_metrics(self, ws):
        from crossscore_tpu.tasks.test import main

        common = [
            "trainer.accelerator=cpu",
            "model.tpu.compute_dtype=float32",
            "model.backbone.preset=dinov2-test",
            "data.neighbour_config.cross=2",
            "data.dataset.path=[datadir]",
            "data.loader.validation.batch_size=2",
            "data.loader.validation.num_workers=2",
            "this_main.resize_short_side=-1",
            "this_main.ref_token_cache_encode_batch=2",
        ]
        out_off = main(common + ["this_main.ref_token_cache=off", "alias=nc"])
        out_on = main(common + ["this_main.ref_token_cache=on", "alias=wc"])
        # cached metrics match up to float reduction-order noise: the frozen
        # backbone runs on (encode_batch) chunks instead of one B*(1+K) call,
        # and XLA does not guarantee bitwise-equal reductions across batch
        # shapes (observed ~3e-8 relative on CPU fp32). Everything else is
        # exact — the predict e2e test pins byte-identical score maps.
        import pandas as pd

        df_off = pd.read_csv(out_off / "metrics.csv")
        df_on = pd.read_csv(out_on / "metrics.csv")
        assert list(df_off["batch_idx"]) == list(df_on["batch_idx"])
        for col in df_off.columns[1:]:
            np.testing.assert_allclose(df_on[col], df_off[col],
                                       rtol=1e-5, atol=1e-6, err_msg=col)


class TestCacheWithBucketing:
    """Cache x shape-bucketing composition (VERDICT r2 #5): bucket-padded
    batches route through the token cache with per-item valid masks and
    (bucket, valid)-qualified keys; metrics match the uncached bucketed run."""

    def test_bucketed_cached_eval_matches_uncached(self, tmp_path):
        from crossscore_tpu.data.synthetic import generate
        from crossscore_tpu.tasks.test import main

        generate(tmp_path / "datadir", hw=[(84, 112), (112, 84)],
                 scenes_per_split={"train": 1, "test": 2})
        old = os.getcwd()
        os.chdir(tmp_path)
        try:
            common = [
                "trainer.accelerator=cpu",
                "model.tpu.compute_dtype=float32",
                "model.backbone.preset=dinov2-test",
                "data.neighbour_config.cross=2",
                "data.dataset.path=[datadir]",
                "data.loader.validation.batch_size=2",
                "data.loader.validation.num_workers=1",
                "this_main.resize_short_side=-1",
                "this_main.shape_buckets=auto",
                "this_main.bucket_multiple=56",
                "this_main.ref_token_cache_encode_batch=2",
            ]
            out_off = main(common + ["this_main.ref_token_cache=off", "alias=bnc"])
            out_on = main(common + ["this_main.ref_token_cache=on", "alias=bwc"])
        finally:
            os.chdir(old)
        import pandas as pd

        def load(out):
            if not out.is_absolute():
                out = tmp_path / out
            return pd.read_csv(out / "metrics.csv")

        df_off, df_on = load(out_off), load(out_on)
        assert list(df_off["batch_idx"]) == list(df_on["batch_idx"])
        for col in df_off.columns[1:]:
            np.testing.assert_allclose(df_on[col], df_off[col],
                                       rtol=1e-5, atol=1e-6, err_msg=col)


class TestSharedDiskStore:
    """Multi-process serving fleet pattern: ONE packer process fills the
    persistent store; reader processes serve read-only with ZERO encodes."""

    def _paths(self, tmp_path, n):
        paths = []
        for i in range(n):
            p = tmp_path / f"ref_{i}.png"
            p.write_bytes(b"fleet")
            paths.append(str(p))
        return paths

    def test_one_packer_many_readers(self, tmp_path):
        import subprocess
        import sys

        store = tmp_path / "store"
        paths = self._paths(tmp_path, 4)
        # the PACKER is a separate OS process (one packer, N reader fleet)
        script = f"""
import sys; sys.path.insert(0, {str(os.getcwd())!r})
import numpy as np
from crossscore_tpu.data.token_cache import RefTokenCache
def encode(imgs):
    s = imgs.reshape(imgs.shape[0], -1).sum(axis=1)
    return np.tile(s[:, None, None], (1, 4, 2)).astype(np.float32)
cache = RefTokenCache(encode, encode_batch=2, persist_dir={str(store)!r})
imgs = np.ones((1, 4, 8, 8, 3), np.float32)
cache.gather([[p] for p in {paths!r}], imgs)
print("packed", cache.misses)
"""
        res = subprocess.run([sys.executable, "-c", script],
                             capture_output=True, text=True, cwd="/root/repo")
        assert "packed 4" in res.stdout, res.stderr

        def must_not_encode(imgs):
            raise AssertionError("reader fleet must never encode")

        for _ in range(2):  # two independent readers
            reader = RefTokenCache(must_not_encode, persist_dir=str(store))
            imgs = np.ones((1, 4, 8, 8, 3), np.float32)
            out = reader.gather([[p] for p in paths], imgs)
            assert out.shape == (1, 4, 4, 2)
            np.testing.assert_allclose(out[0, :, 0, 0], imgs[0, 0].sum())
            assert reader.disk_hits == 4 and reader.misses == 0

    def test_concurrent_writers_atomic(self, tmp_path):
        """Two caches racing to persist the same keys: atomic tmp+rename means
        readers always see a complete payload."""
        import threading

        store = tmp_path / "store"
        paths = self._paths(tmp_path, 6)
        imgs = np.ones((1, 6, 8, 8, 3), np.float32)

        def encode(x):
            s = x.reshape(x.shape[0], -1).sum(axis=1)
            return np.tile(s[:, None, None], (1, 4, 2)).astype(np.float32)

        errors = []

        def work():
            try:
                c = RefTokenCache(encode, encode_batch=2, persist_dir=str(store))
                c.gather([[p] for p in paths], imgs)
            except Exception as e:  # noqa: BLE001 — the test asserts none
                errors.append(e)

        ts = [threading.Thread(target=work) for _ in range(3)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        # racing writers must not collide on tmp names (unique per writer)
        assert not errors, errors
        reader = RefTokenCache(lambda x: (_ for _ in ()).throw(AssertionError()),
                               persist_dir=str(store))
        out = reader.gather([[p] for p in paths], imgs)
        assert reader.disk_hits == 6


class TestDecodeSkip:
    """Cache-hit references skip the host PNG decode entirely (placeholder
    pixels; tokens resolve from the cache) — outputs must stay identical."""

    @pytest.fixture(scope="class")
    def ws(self, tmp_path_factory):
        from crossscore_tpu.data.synthetic import generate

        root = tmp_path_factory.mktemp("skip_ws")
        generate(root / "datadir", hw=(84, 112),
                 scenes_per_split={"train": 1, "val": 1, "test": 1})
        old = os.getcwd()
        os.chdir(root)
        yield root
        os.chdir(old)

    def test_skip_decode_identical_outputs(self, ws, capsys):
        from crossscore_tpu.data import fastimage
        from crossscore_tpu.tasks.predict import main

        if not fastimage.available():
            pytest.skip("native fastimage unavailable (skip path is fused-only)")
        common = [
            "trainer.accelerator=cpu",
            "model.tpu.compute_dtype=float32",
            "model.backbone.preset=dinov2-test",
            "data.neighbour_config.cross=2",
            "data.dataset.query_dir=datadir/res_540/s00002/test/ours_1000/renders",
            "data.dataset.reference_dir=datadir/res_540/s00002/train/ours_1000/gt",
            "data.loader.validation.batch_size=1",  # refs repeat across batches
            "data.loader.validation.num_workers=1",
            "this_main.resize_short_side=84",
            "this_main.ref_token_cache_encode_batch=2",
            "logger.predict.write.config.vis_img_every_n_steps=-1",
            "logger.predict.write.flag.image_reference=false",
        ]
        out_off = main(common + ["this_main.ref_token_cache=off", "alias=noskip"])
        out_on = main(common + ["this_main.ref_token_cache=on", "alias=skip"])
        log = capsys.readouterr().out
        assert "decode-skip on" in log
        # NOTE: the decode-skip COUNT is racy vs loader prefetch (a batch may
        # be decoded before earlier gathers populate the cache), so only the
        # correctness invariant is asserted here; the deterministic skip
        # mechanics are pinned by test_skip_mechanism_deterministic below.
        maps_off = sorted((out_off / "batch" / "score_map_ref_cross").glob("*.png"))
        maps_on = sorted((out_on / "batch" / "score_map_ref_cross").glob("*.png"))
        assert len(maps_off) == len(maps_on) == 3
        for a, b in zip(maps_off, maps_on):
            assert a.read_bytes() == b.read_bytes(), a.name

    def test_skip_mechanism_deterministic(self, ws, rng):
        """Direct loop: once a reference's tokens are cached, get_item emits a
        zero placeholder + skipped flag, and gather resolves the slot from the
        cache — token-for-token equal to the decoded path."""
        from crossscore_tpu.data import fastimage
        from crossscore_tpu.data.simple_reference import SimpleReference

        if not fastimage.available():
            pytest.skip("native fastimage unavailable (skip path is fused-only)")
        ds = SimpleReference(
            query_dir="datadir/res_540/s00002/test/ours_1000/renders",
            reference_dir="datadir/res_540/s00002/train/ours_1000/gt",
            neighbour_config={"cross": 2, "strategy": "random"},
            resize_short_side=84,
        )
        counter = {"calls": 0, "images": 0}
        cache = RefTokenCache(_fake_encoder(counter), encode_batch=2)

        item1 = ds.get_item(0, np.random.default_rng(0))
        paths = [[p] for p in item1["item_paths"]["reference/cross/imgs"]]
        toks1 = cache.gather(paths, item1["reference/cross/imgs"][None])

        ds.ref_pixel_skip = cache.has
        item2 = ds.get_item(0, np.random.default_rng(0))
        assert item2["reference/skipped"].all()
        assert not item2["reference/cross/imgs"].any()  # placeholders
        toks2 = cache.gather(paths, item2["reference/cross/imgs"][None],
                             skipped=item2["reference/skipped"][None])
        np.testing.assert_array_equal(toks1, toks2)
        assert cache.skipped_decodes == 2
        assert counter["calls"] == 1  # nothing re-encoded on the skip pass


class TestDiskPersistence:
    def test_restart_warm(self, tmp_path, rng):
        """A second cache instance (new process equivalent) resolves every
        reference from the persistent store without re-encoding."""
        paths = []
        for i in range(3):
            p = tmp_path / f"ref_{i}.png"
            p.write_bytes(b"x")
            paths.append(str(p))
        imgs = rng.standard_normal((1, 3, 8, 8, 3)).astype(np.float32)
        ref_paths = [[paths[k]] for k in range(3)]

        c1_count = {"calls": 0, "images": 0}
        cache1 = RefTokenCache(_fake_encoder(c1_count), encode_batch=4,
                               persist_dir=tmp_path / "store")
        toks1 = cache1.gather(ref_paths, imgs)
        assert c1_count["calls"] == 1

        c2_count = {"calls": 0, "images": 0}
        cache2 = RefTokenCache(_fake_encoder(c2_count), encode_batch=4,
                               persist_dir=tmp_path / "store")
        toks2 = cache2.gather(ref_paths, imgs)
        assert c2_count["calls"] == 0  # fully restart-warm
        assert cache2.disk_hits == 3
        np.testing.assert_array_equal(toks1, toks2)
        # has() consults the disk too (decode-skip works restart-warm)
        cache3 = RefTokenCache(_fake_encoder({"calls": 0, "images": 0}),
                               persist_dir=tmp_path / "store")
        assert cache3.has(paths[0], (8, 8))

    def test_mtime_change_invalidates(self, tmp_path, rng):
        import os
        import time as _time

        p = tmp_path / "ref.png"
        p.write_bytes(b"x")
        imgs = rng.standard_normal((1, 1, 8, 8, 3)).astype(np.float32)
        count = {"calls": 0, "images": 0}
        cache = RefTokenCache(_fake_encoder(count), encode_batch=1,
                              persist_dir=tmp_path / "store")
        cache.gather([[str(p)]], imgs)
        os.utime(p, ns=(1, 1))  # re-rendered file -> new mtime -> new key
        cache.gather([[str(p)]], imgs)
        assert count["calls"] == 2

    def test_bf16_tokens_roundtrip(self, tmp_path):
        import jax.numpy as jnp

        def encode(imgs):
            return np.asarray(jnp.ones((imgs.shape[0], 2, 2), jnp.bfloat16))

        p = tmp_path / "r.png"
        p.write_bytes(b"x")
        imgs = np.zeros((1, 1, 4, 4, 3), np.float32)
        cache1 = RefTokenCache(encode, encode_batch=1, persist_dir=tmp_path / "s")
        t1 = cache1.gather([[str(p)]], imgs)
        cache2 = RefTokenCache(encode, encode_batch=1, persist_dir=tmp_path / "s")
        t2 = cache2.gather([[str(p)]], imgs)
        assert t2.dtype == t1.dtype == jnp.bfloat16
        np.testing.assert_array_equal(np.asarray(t1, np.float32),
                                      np.asarray(t2, np.float32))
