"""Native fastimage decoder: parity with the PIL/numpy path + throughput sanity."""

import numpy as np
import pytest

from crossscore_tpu.data import fastimage
from crossscore_tpu.io.images import (
    image_read,
    image_write,
    metric_map_read,
    metric_map_write,
    normalize_imagenet,
)
from crossscore_tpu.ops.interpolate import resize_bilinear_antialias

pytestmark = pytest.mark.skipif(not fastimage.available(), reason="native lib unavailable")


@pytest.fixture
def img_path(rng, tmp_path):
    img = rng.random((60, 80, 3)).astype(np.float32)
    p = tmp_path / "img.png"
    image_write(p, img)
    return p, image_read(p)


@pytest.fixture
def metric_path(rng, tmp_path):
    m = (rng.random((60, 80)).astype(np.float32) * 2 - 1)
    p = tmp_path / "m.png"
    metric_map_write(p, m, [-1, 1])
    return p, metric_map_read(p, [-1, 1])


class TestLoadRGB:
    def test_plain_decode(self, img_path):
        p, ref = img_path
        out = fastimage.load_rgb(str(p), normalize=False)
        np.testing.assert_allclose(out, ref, atol=1e-6)

    def test_info(self, img_path):
        p, ref = img_path
        h, w, c, b = fastimage.image_info(str(p))
        assert (h, w, c, b) == (60, 80, 3, 8)

    def test_normalized(self, img_path):
        p, ref = img_path
        out = fastimage.load_rgb(str(p), normalize=True)
        np.testing.assert_allclose(out, normalize_imagenet(ref), atol=1e-5)

    def test_resize_matches_numpy(self, img_path):
        p, ref = img_path
        out = fastimage.load_rgb(str(p), resize_hw=(30, 40), normalize=False)
        expected = resize_bilinear_antialias(ref, 30, 40)
        np.testing.assert_allclose(out, expected, atol=2e-4)

    def test_resize_up_matches_numpy(self, img_path):
        p, ref = img_path
        out = fastimage.load_rgb(str(p), resize_hw=(90, 100), normalize=False)
        expected = resize_bilinear_antialias(ref, 90, 100)
        np.testing.assert_allclose(out, expected, atol=2e-4)

    def test_fused_crop(self, img_path):
        p, ref = img_path
        out = fastimage.load_rgb(str(p), crop=(5, 7, 20, 30), normalize=True)
        expected = normalize_imagenet(ref[5:25, 7:37])
        np.testing.assert_allclose(out, expected, atol=1e-5)

    def test_bad_crop_raises(self, img_path):
        p, _ = img_path
        with pytest.raises(IOError):
            fastimage.load_rgb(str(p), crop=(50, 50, 30, 40))

    def test_missing_file_raises(self):
        with pytest.raises(IOError):
            fastimage.load_rgb("/nonexistent.png")


class TestLoadMetric:
    def test_decode_n11(self, metric_path):
        p, ref = metric_path
        out = fastimage.load_metric(str(p), vrange=[-1, 1])
        np.testing.assert_allclose(out, ref, atol=1e-6)

    def test_clamp_and_square(self, metric_path):
        p, ref = metric_path
        out = fastimage.load_metric(str(p), vrange=[-1, 1], clamp01=True)
        np.testing.assert_allclose(out, np.clip(ref, 0, 1), atol=1e-6)

    def test_mae_square(self, rng, tmp_path):
        m = rng.random((30, 40)).astype(np.float32)
        p = tmp_path / "mae.png"
        metric_map_write(p, m, [0, 1])
        ref = metric_map_read(p, [0, 1])
        out = fastimage.load_metric(str(p), vrange=[0, 1], square=True)
        np.testing.assert_allclose(out, np.square(ref), atol=1e-6)

    def test_crop(self, metric_path):
        p, ref = metric_path
        out = fastimage.load_metric(str(p), vrange=[-1, 1], crop=(10, 20, 15, 25))
        np.testing.assert_allclose(out, ref[10:25, 20:45], atol=1e-6)


class TestFusedDatasetParity:
    """The native fused get_item path must produce byte-identical results to
    the PIL/numpy path (same rng stream, same transforms)."""

    @pytest.fixture(scope="class")
    def ds_root(self, tmp_path_factory):
        from crossscore_tpu.data.synthetic import generate

        root = tmp_path_factory.mktemp("fusedds")
        generate(root, hw=(84, 112), scenes_per_split={"train": 1, "val": 1, "test": 1})
        return root

    @pytest.mark.parametrize("kw", [
        dict(metric_type="ssim", metric_min=0, crop_size=56, crop_mode="dataset_default"),
        dict(metric_type="ssim", metric_min=-1, crop_size=56, crop_mode="dataset_default"),
        dict(metric_type="mse", metric_min=0, crop_mode="integer_patches"),
        dict(metric_type="mae", metric_min=0, crop_mode=None, resize_short_side=56),
        dict(metric_type="ssim", metric_min=0, crop_size=56, crop_mode="dataset_default",
             zero_reference=True),
    ])
    def test_matches_pil_path(self, ds_root, kw):
        from crossscore_tpu.data.nvs_index import NvsDataset

        base = dict(
            dataset_path=str(ds_root), resolution="res_540", data_split="train",
            neighbour_config={"strategy": "random", "cross": 6, "deterministic": False},
            metric_min=0, metric_max=1,
        )
        base.update(kw)
        ds = NvsDataset(**base)
        for idx in [0, 3]:
            fused = ds._get_item_fused(
                ds.neighbour_selector.select(idx, np.random.default_rng(idx)),
                np.random.default_rng(100 + idx),
            )
            # replicate with the PIL path: same rng streams
            item_paths = ds.neighbour_selector.select(idx, np.random.default_rng(idx))
            import crossscore_tpu.data.nvs_index as ni

            content = ds.load_content(item_paths)
            rng2 = np.random.default_rng(100 + idx)
            q, sm, refs = content["query/img"], content["query/score_map"], content["reference/cross/imgs"]
            if ds.resize_short_side > 0:
                q = ds._resize(q); sm = ds._resize(sm)
                refs = np.stack([ds._resize(r) for r in refs])
            if ds.crop_mode == "integer_patches":
                nh, nw = q.shape[0] - q.shape[0] % 14, q.shape[1] - q.shape[1] % 14
                q, sm, refs = q[:nh, :nw], sm[:nh, :nw], refs[:, :nh, :nw]
            if ds.query_crop is not None:
                res = ds.query_crop(q, sm, rng=rng2); q, sm = res["out"]
            if ds.reference_crop is not None:
                refs = ds.reference_crop(refs, rng=rng2)["out"]
            if ds.zero_reference:
                refs = np.zeros_like(refs)
            from crossscore_tpu.io.images import normalize_imagenet

            np.testing.assert_allclose(fused["query/img"], normalize_imagenet(q), atol=2e-4)
            np.testing.assert_allclose(fused["query/score_map"], sm, atol=2e-4)
            np.testing.assert_allclose(
                fused["reference/cross/imgs"], normalize_imagenet(refs), atol=2e-4
            )
