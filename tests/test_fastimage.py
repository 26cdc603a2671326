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

    def test_uint8_plain_is_byte_exact(self, img_path):
        # no resize: the u8 wire path is a pure crop copy of the PNG bytes
        p, ref = img_path
        out = fastimage.load_rgb(str(p), as_uint8=True)
        assert out.dtype == np.uint8
        np.testing.assert_array_equal(out, np.rint(ref * 255).astype(np.uint8))

    def test_uint8_crop_is_byte_exact(self, img_path):
        p, ref = img_path
        out = fastimage.load_rgb(str(p), crop=(5, 7, 20, 30), as_uint8=True)
        np.testing.assert_array_equal(
            out, np.rint(ref[5:25, 7:37] * 255).astype(np.uint8)
        )

    def test_uint8_resize_requantises(self, img_path):
        # with a resize the bilinear output is re-quantised to 8 bits:
        # within 0.5/255 of the float path (plus its own resize tolerance)
        p, ref = img_path
        out = fastimage.load_rgb(str(p), resize_hw=(30, 40), as_uint8=True)
        expected = resize_bilinear_antialias(ref, 30, 40)
        assert out.dtype == np.uint8
        np.testing.assert_allclose(
            out.astype(np.float32) / 255.0, expected, atol=0.5 / 255 + 2e-4
        )

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


class TestWireUint8:
    """data.dataset.wire_uint8: raw uint8 pixels on the wire, normalised on
    device. Fused and PIL paths must agree byte-for-byte; the device
    normalise must reproduce the host float path to f32 rounding."""

    @pytest.fixture(scope="class")
    def ds_root(self, tmp_path_factory):
        from crossscore_tpu.data.synthetic import generate

        root = tmp_path_factory.mktemp("wireu8")
        generate(root, hw=(84, 112), scenes_per_split={"train": 1, "val": 1, "test": 1})
        return root

    def _mk(self, ds_root, wire_uint8):
        from crossscore_tpu.data.nvs_index import NvsDataset

        return NvsDataset(
            dataset_path=str(ds_root), resolution="res_540", data_split="train",
            neighbour_config={"strategy": "random", "cross": 3, "deterministic": False},
            metric_type="ssim", metric_min=0, metric_max=1,
            crop_size=56, crop_mode="dataset_default", wire_uint8=wire_uint8,
        )

    def test_fused_matches_pil_bytes(self, ds_root):
        ds = self._mk(ds_root, wire_uint8=True)
        for idx in [0, 2]:
            fused = ds._get_item_fused(
                ds.neighbour_selector.select(idx, np.random.default_rng(idx)),
                np.random.default_rng(50 + idx),
            )
            import os

            os.environ["CROSSSCORE_NO_NATIVE"] = "1"
            try:
                # force the PIL path through get_item's fallback arm by
                # calling the staged logic directly (fastimage stays loaded;
                # the env var only gates get_lib's FIRST call, so replicate
                # the PIL arm the same way TestFusedDatasetParity does)
                item_paths = ds.neighbour_selector.select(idx, np.random.default_rng(idx))
                content = ds.load_content(item_paths)
                rng2 = np.random.default_rng(50 + idx)
                q, sm = content["query/img"], content["query/score_map"]
                refs = content["reference/cross/imgs"]
                res = ds.query_crop(q, sm, rng=rng2)
                q, sm = res["out"]
                refs = ds.reference_crop(refs, rng=rng2)["out"]
            finally:
                del os.environ["CROSSSCORE_NO_NATIVE"]
            assert fused["query/img"].dtype == np.uint8
            assert fused["reference/cross/imgs"].dtype == np.uint8
            np.testing.assert_array_equal(
                fused["query/img"], np.clip(np.rint(q * 255), 0, 255).astype(np.uint8)
            )
            np.testing.assert_array_equal(
                fused["reference/cross/imgs"],
                np.clip(np.rint(refs * 255), 0, 255).astype(np.uint8),
            )
            np.testing.assert_allclose(fused["query/score_map"], sm, atol=2e-4)

    def test_device_normalise_matches_host(self, ds_root):
        import jax.numpy as jnp
        from crossscore_tpu.models.crossscore import _normalize_u8

        ds_u8 = self._mk(ds_root, wire_uint8=True)
        ds_f32 = self._mk(ds_root, wire_uint8=False)
        item_u8 = ds_u8.get_item(0, np.random.default_rng(7))
        item_f32 = ds_f32.get_item(0, np.random.default_rng(7))
        dev = np.asarray(_normalize_u8(jnp.asarray(item_u8["query/img"])))
        np.testing.assert_allclose(dev, item_f32["query/img"], atol=1e-6)
        dev_r = np.asarray(_normalize_u8(jnp.asarray(item_u8["reference/cross/imgs"])))
        np.testing.assert_allclose(dev_r, item_f32["reference/cross/imgs"], atol=1e-6)

    def test_pil_path_roundtrip_exact(self, ds_root, monkeypatch):
        # the PIL fallback arm (non-PNG or no native lib) must emit the same
        # u8 bytes as the fused arm for unresized 8-bit sources
        from crossscore_tpu.data import fastimage as fi

        ds = self._mk(ds_root, wire_uint8=True)
        fused = ds.get_item(1, np.random.default_rng(9))
        monkeypatch.setattr(fi, "available", lambda: False)
        pil = ds.get_item(1, np.random.default_rng(9))
        assert pil["query/img"].dtype == np.uint8
        np.testing.assert_array_equal(fused["query/img"], pil["query/img"])
        np.testing.assert_array_equal(
            fused["reference/cross/imgs"], pil["reference/cross/imgs"]
        )
