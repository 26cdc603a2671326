"""Tests for image / metric-map codecs (uint16 round-trip parity)."""

import numpy as np

from crossscore_tpu.io import (
    image_read,
    image_write,
    metric_map_read,
    metric_map_write,
    normalize_imagenet,
    denormalize_imagenet,
)


class TestMetricMapCodec:
    def test_round_trip_01(self, rng, tmp_path):
        m = rng.random((20, 30)).astype(np.float32)
        p = tmp_path / "m.png"
        metric_map_write(p, m, [0, 1])
        back = metric_map_read(p, [0, 1])
        np.testing.assert_allclose(back, m, atol=1.0 / 65535)

    def test_round_trip_n11(self, rng, tmp_path):
        m = (rng.random((20, 30)).astype(np.float32) * 2 - 1)
        p = tmp_path / "m.png"
        metric_map_write(p, m, [-1, 1])
        back = metric_map_read(p, [-1, 1])
        np.testing.assert_allclose(back, m, atol=2.0 / 65535)

    def test_extremes(self, tmp_path):
        m = np.array([[0.0, 1.0], [0.5, 0.25]], dtype=np.float32)
        p = tmp_path / "m.png"
        metric_map_write(p, m, [0, 1])
        back = metric_map_read(p, [0, 1])
        assert back.min() >= 0.0 and back.max() <= 1.0
        np.testing.assert_allclose(back, m, atol=1.0 / 65535)


class TestImageIO:
    def test_round_trip(self, rng, tmp_path):
        img = rng.random((16, 24, 3)).astype(np.float32)
        p = tmp_path / "img.png"
        image_write(p, img)
        back = image_read(p)
        assert back.shape == (16, 24, 3)
        np.testing.assert_allclose(back, img, atol=1.0 / 255 + 1e-6)

    def test_imagenet_norm_round_trip(self, rng):
        img = rng.random((8, 8, 3)).astype(np.float32)
        np.testing.assert_allclose(denormalize_imagenet(normalize_imagenet(img)), img, atol=1e-6)

    def test_grayscale_promoted(self, tmp_path):
        from PIL import Image

        arr = (np.arange(64, dtype=np.uint8).reshape(8, 8))
        Image.fromarray(arr, mode="L").save(tmp_path / "g.png")
        img = image_read(tmp_path / "g.png")
        assert img.shape == (8, 8, 3)
