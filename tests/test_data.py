"""Data pipeline tests: index semantics, samplers, crops, loader determinism."""

import numpy as np
import pytest

from crossscore_tpu.confsys import Config
from crossscore_tpu.data import (
    NvsDataset,
    SimpleReference,
    Loader,
    SamplerRandom,
    get_crop_params,
)
from crossscore_tpu.data.synthetic import generate


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("nvsdata")
    generate(root, hw=(84, 112), scenes_per_split={"train": 2, "val": 1, "test": 1})
    return root


NEIGHBOUR = {"strategy": "random", "cross": 3, "deterministic": False}


def _make_ds(root, **kw):
    defaults = dict(
        dataset_path=str(root),
        resolution="res_540",
        data_split="train",
        neighbour_config=NEIGHBOUR,
        metric_type="ssim",
        metric_min=0,
        metric_max=1,
        crop_size=56,
        crop_mode="dataset_default",
    )
    defaults.update(kw)
    return NvsDataset(**defaults)


class TestNvsDataset:
    def test_index_counts(self, dataset_root):
        ds = _make_ds(dataset_root)
        # 2 train scenes x (gs_train: 4 renders + gs_test: 3 renders) x 1 iter
        assert len(ds) == 2 * (4 + 3)

    def test_cross_reference_is_other_split(self, dataset_root):
        ds = _make_ds(dataset_root, return_item_paths=True)
        rng = np.random.default_rng(0)
        for idx in range(len(ds)):
            paths = ds.neighbour_selector.select(idx, rng)
            assert "/renders/" in paths["query/img"]
            split = "/train/" if "/train/" in paths["query/img"] else "/test/"
            other = "/test/" if split == "/train/" else "/train/"
            for rp in paths["reference/cross/imgs"]:
                assert other in rp and "/gt/" in rp

    def test_item_shapes_and_normalisation(self, dataset_root):
        ds = _make_ds(dataset_root)
        item = ds.get_item(0, np.random.default_rng(0))
        assert item["query/img"].shape == (56, 56, 3)
        assert item["query/score_map"].shape == (56, 56)
        assert item["reference/cross/imgs"].shape == (3, 56, 56, 3)
        # ImageNet normalised: mean not in [0,1] center but spread around 0
        assert abs(item["query/img"].mean()) < 2.0
        # ssim clamped to [0, 1] for metric_min=0
        assert item["query/score_map"].min() >= 0.0

    def test_ssim_range_n11(self, dataset_root):
        ds = _make_ds(dataset_root, metric_min=-1)
        item = ds.get_item(0, np.random.default_rng(0))
        assert item["query/score_map"].min() < 0.0  # synthetic maps span [-0.8, 0.8]

    def test_mse_is_mae_squared(self, dataset_root):
        ds_mae = _make_ds(dataset_root, metric_type="mae")
        ds_mse = _make_ds(dataset_root, metric_type="mse", crop_mode=None)
        ds_mae.query_crop = None  # compare uncropped
        ds_mae.reference_crop = None
        a = ds_mae.get_item(0, np.random.default_rng(0))["query/score_map"]
        b = ds_mse.get_item(0, np.random.default_rng(0))["query/score_map"]
        np.testing.assert_allclose(b, np.square(a), atol=1e-6)

    def test_zero_reference(self, dataset_root):
        ds = _make_ds(dataset_root, zero_reference=True, crop_mode=None)
        item = ds.get_item(0, np.random.default_rng(0))
        # references are zeros, then ImageNet-normalised
        ref = item["reference/cross/imgs"]
        assert np.allclose(ref, ref[0, 0, 0])

    def test_integer_patches_crop(self, dataset_root):
        ds = _make_ds(dataset_root, crop_mode="integer_patches")
        item = ds.get_item(0, np.random.default_rng(0))
        h, w = item["query/img"].shape[:2]
        assert h % 14 == 0 and w % 14 == 0
        assert item["query/score_map"].shape == (h, w)

    def test_resize_short_side(self, dataset_root):
        ds = _make_ds(dataset_root, crop_mode=None, resize_short_side=56)
        item = ds.get_item(0, np.random.default_rng(0))
        assert min(item["query/img"].shape[:2]) == 56

    def test_resize_conflict_raises(self, dataset_root):
        with pytest.raises(ValueError):
            _make_ds(dataset_root, resize_short_side=40, crop_size=56)


class TestSimpleReference:
    def test_from_flat_dirs(self, dataset_root):
        base = dataset_root / "res_540" / "s00000" / "test" / "ours_1000"
        ds = SimpleReference(
            query_dir=str(base / "renders"),
            reference_dir=str(dataset_root / "res_540" / "s00000" / "train" / "ours_1000" / "gt"),
            neighbour_config=NEIGHBOUR,
            resize_short_side=56,
        )
        assert len(ds) == 3
        item = ds.get_item(0, np.random.default_rng(0))
        assert item["reference/cross/imgs"].shape[0] == 3
        assert np.all(item["query/score_map"] == 0)  # empty metric config
        assert "item_paths" in item

    def test_wire_uint8(self, dataset_root):
        """Regression: SimpleReference sets attrs directly (it does not call
        NvsDataset.__init__), so every new NvsDataset knob consumed inside
        get_item must be plumbed here too — wire_uint8 was missed at first."""
        base = dataset_root / "res_540" / "s00000" / "test" / "ours_1000"
        kw = dict(
            query_dir=str(base / "renders"),
            reference_dir=str(
                dataset_root / "res_540" / "s00000" / "train" / "ours_1000" / "gt"
            ),
            neighbour_config={**NEIGHBOUR, "deterministic": True},
            resize_short_side=56,
        )
        it_f = SimpleReference(**kw).get_item(0, np.random.default_rng(0))
        it_u = SimpleReference(**kw, wire_uint8=True).get_item(
            0, np.random.default_rng(0)
        )
        assert it_u["query/img"].dtype == np.uint8
        assert it_u["reference/cross/imgs"].dtype == np.uint8
        # the float path is the uint8 path ImageNet-normalised (io/images.py)
        from crossscore_tpu.io.images import normalize_imagenet

        np.testing.assert_allclose(
            normalize_imagenet(it_u["query/img"].astype(np.float32) / 255.0),
            it_f["query/img"],
            atol=9e-3,  # <=(0.5/255)/min(std) re-quantisation under the resize
        )


class TestSampler:
    def test_without_replacement(self):
        s = SamplerRandom(3)
        refs = [f"r{i}" for i in range(10)]
        out = s(refs, np.random.default_rng(0))
        assert len(out) == 3 and len(set(out)) == 3

    def test_pads_with_empty(self):
        s = SamplerRandom(5)
        out = s(["a", "b"], np.random.default_rng(0))
        assert len(out) == 5
        assert sorted(out).count("empty_image") == 3
        assert "a" in out and "b" in out

    def test_deterministic_first_k(self):
        s = SamplerRandom(2, deterministic=True)
        assert s(["a", "b", "c"], np.random.default_rng(5)) == ["a", "b"]


class TestCrop:
    def test_deterministic_top_left(self):
        p = get_crop_params((10, 10), (4, 4), np.random.default_rng(0), deterministic=True)
        assert list(p) == [0, 0, 4, 4]

    def test_too_large_raises(self):
        with pytest.raises(ValueError):
            get_crop_params((3, 3), (4, 4), np.random.default_rng(0))


class TestLoader:
    def test_batches_and_shapes(self, dataset_root):
        ds = _make_ds(dataset_root)
        loader = Loader(ds, batch_size=4, num_workers=2, seed=1)
        batches = list(loader.epoch(0))
        assert len(batches) == loader.batches_per_epoch()
        b0 = batches[0]
        assert b0["query/img"].shape == (4, 56, 56, 3)
        assert b0["reference/cross/imgs"].shape == (4, 3, 56, 56, 3)
        assert int(b0["_valid"]) == 4

    def test_last_batch_padded(self, dataset_root):
        ds = _make_ds(dataset_root)  # 14 items
        loader = Loader(ds, batch_size=4, num_workers=2)
        batches = list(loader.epoch(0))
        assert batches[-1]["query/img"].shape[0] == 4
        assert int(batches[-1]["_valid"]) == 14 % 4

    def test_deterministic_given_seed_and_epoch(self, dataset_root):
        ds = _make_ds(dataset_root)
        l1 = Loader(ds, batch_size=4, num_workers=2, seed=7)
        l2 = Loader(ds, batch_size=4, num_workers=3, seed=7)  # worker count irrelevant
        b1 = next(iter(l1.epoch(3)))
        b2 = next(iter(l2.epoch(3)))
        np.testing.assert_array_equal(b1["query/img"], b2["query/img"])
        np.testing.assert_array_equal(b1["reference/cross/imgs"], b2["reference/cross/imgs"])

    def test_epochs_differ(self, dataset_root):
        ds = _make_ds(dataset_root)
        loader = Loader(ds, batch_size=4, num_workers=2, seed=7)
        b0 = next(iter(loader.epoch(0)))
        b1 = next(iter(loader.epoch(1)))
        assert not np.array_equal(b0["query/img"], b1["query/img"])

    def test_sharding_partition(self, dataset_root):
        ds = _make_ds(dataset_root, return_item_paths=True)
        seen = []
        for shard in range(2):
            loader = Loader(
                ds, batch_size=2, num_workers=1, seed=3, shard_index=shard, num_shards=2
            )
            for b in loader.epoch(0):
                seen.extend(b["item_paths"]["query/img"][: int(b["_valid"])])
        assert len(seen) == len(set(seen))  # no duplicates across shards
        assert len(seen) == (len(ds) // 2) * 2


class TestLoaderLifecycle:
    def test_early_break_no_deadlock_many_epochs(self, dataset_root):
        """Early generator abandonment must not deadlock or leak producers."""
        import threading

        ds = _make_ds(dataset_root)
        loader = Loader(ds, batch_size=2, num_workers=2, prefetch_batches=1, seed=0)
        before = threading.active_count()
        for epoch in range(5):
            for i, b in enumerate(loader.epoch(epoch)):
                if i == 0:
                    break  # abandon immediately with a full prefetch queue
        # give producers a moment to unwind
        import time

        time.sleep(1.0)
        after = threading.active_count()
        assert after <= before + 1, f"leaked threads: {before} -> {after}"

    def test_producer_error_propagates(self, dataset_root):
        ds = _make_ds(dataset_root)

        class Broken:
            def __len__(self):
                return 4

            def get_item(self, idx, rng):
                raise RuntimeError("boom")

        loader = Loader(Broken(), batch_size=2, num_workers=2)
        with pytest.raises(RuntimeError, match="boom"):
            list(loader.epoch(0))


class TestShardWrapAndGlobalBatches:
    def test_dataset_smaller_than_shard_count(self, dataset_root):
        """n < num_shards: wrap-around padding must still give every shard
        the same length (unequal shards desynchronise per-process step
        counts feeding collective reductions), with duplicates masked so the
        union of valid items covers the dataset exactly once."""
        ds = _make_ds(dataset_root, return_item_paths=True)
        n = len(ds)
        shards = n + 5  # strictly more shards than samples
        lengths, seen = [], []
        for shard in range(shards):
            loader = Loader(
                ds, batch_size=2, num_workers=1, seed=3,
                shard_index=shard, num_shards=shards,
            )
            idx, n_real = loader._epoch_indices(0)
            lengths.append(len(idx))
            for b in loader.epoch(0):
                seen.extend(b["item_paths"]["query/img"][: int(b["_valid"])])
        assert len(set(lengths)) == 1  # equal-size shards
        assert sorted(set(seen)) == sorted(seen)  # no valid duplicates
        assert len(seen) == n  # every sample exactly once

    def test_prepare_global_shard_valid_mask(self):
        """Multi-host batch prep: the per-process _valid prefix count becomes
        a per-row mask (assembled like any batch array) and a host-only int;
        a shared (2,) _valid_hw is promoted to per-item (B, 2) form."""
        from crossscore_tpu.data.loader import prepare_global_shard

        b = {
            "query/img": np.zeros((4, 8, 8, 3), np.float32),
            "_valid": np.asarray(3, np.int32),
            "_valid_hw": np.asarray([6, 8], np.int32),
        }
        out = prepare_global_shard(b, 4)
        assert isinstance(out["_valid"], int) and out["_valid"] == 3
        np.testing.assert_array_equal(out["_valid_mask"], [1.0, 1.0, 1.0, 0.0])
        assert out["_valid_hw"].shape == (4, 2)
        np.testing.assert_array_equal(out["_valid_hw"][2], [6, 8])
        # batches without _valid pass through untouched
        out2 = prepare_global_shard({"x": np.zeros(3)}, 4)
        assert "_valid_mask" not in out2

    def test_prepare_global_shard_short_batch_rows(self):
        """pad_last=False short final batch: every derived per-row array
        (_valid_mask, promoted _valid_hw) follows the ACTUAL row count, not
        bs — a bs-long derived array would mismatch the rows shipped via
        make_array_from_process_local_data."""
        from crossscore_tpu.data.loader import prepare_global_shard

        b = {
            "query/img": np.zeros((3, 8, 8, 3), np.float32),  # short: 3 < bs=4
            "_valid": np.asarray(3, np.int32),
            "_valid_hw": np.asarray([6, 8], np.int32),
        }
        out = prepare_global_shard(b, 4)
        np.testing.assert_array_equal(out["_valid_mask"], [1.0, 1.0, 1.0])
        assert out["_valid_hw"].shape == (3, 2)

    def test_slow_final_batch_not_dropped(self, dataset_root):
        """The consumer must not conclude EOF while the producer's final
        batch is still in flight (regression: an Empty timeout racing the
        producer's exit could drop queued batches)."""
        import time as _t

        ds = _make_ds(dataset_root)
        n_items = len(ds)
        real_get = ds.get_item

        class SlowTail:
            def __len__(self):
                return n_items

            def get_item(self, i, rng):
                item = real_get(i, rng)
                _t.sleep(0.02)
                return item

        loader = Loader(SlowTail(), batch_size=2, num_workers=1,
                        prefetch_batches=1, seed=0)
        expect = loader.batches_per_epoch()
        for epoch in range(3):
            got = sum(1 for _ in loader.epoch(epoch))
            assert got == expect
