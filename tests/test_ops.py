"""Unit tests for primitive ops, with torch golden checks where parity matters."""

import numpy as np
import pytest
import jax.numpy as jnp

from crossscore_tpu.ops import (
    jigsaw_to_image,
    image_to_jigsaw,
    interpolate_bilinear_align_corners,
    interpolate_bicubic,
    resize_bilinear_antialias,
    psnr2mse,
    mse2psnr,
    abs2psnr,
    correlation,
)

torch = pytest.importorskip("torch")


class TestJigsaw:
    def test_round_trip(self, rng):
        img = jnp.asarray(rng.standard_normal((2, 28, 42)).astype(np.float32))
        patches = image_to_jigsaw(img, 14)
        assert patches.shape == (2, 2 * 3, 14, 14)
        back = jigsaw_to_image(patches, (2, 3))
        np.testing.assert_array_equal(np.asarray(back), np.asarray(img))

    def test_matches_torch_reference_semantics(self, rng):
        """Golden check vs the reference's view/permute formulation
        (reference utils/misc/image.py:8-21)."""
        x_np = rng.standard_normal((3, 6, 4, 5)).astype(np.float32)
        grid = (2, 3)
        t = torch.tensor(x_np)
        tv = t.view(3, 2, 3, 4, 5).permute(0, 1, 3, 2, 4).contiguous().view(3, 8, 15)
        ours = jigsaw_to_image(jnp.asarray(x_np), grid)
        np.testing.assert_allclose(np.asarray(ours), tv.numpy(), rtol=0, atol=0)


class TestInterpolate:
    @pytest.mark.parametrize("in_hw,out_hw", [((40, 40), (37, 37)), ((40, 40), (16, 29)), ((5, 7), (11, 3)), ((8, 8), (8, 8))])
    def test_bilinear_align_corners_matches_torch(self, rng, in_hw, out_hw):
        """PE interpolation parity incl. the reference's +1e-4 epsilon trick
        (reference model/positional_encoding.py:61-69): with align_corners=True
        the epsilon only fixes the output-size floor, which we take directly."""
        src = rng.standard_normal((*in_hw, 3)).astype(np.float32)
        ours = interpolate_bilinear_align_corners(jnp.asarray(src), *out_hw)
        t = torch.nn.functional.interpolate(
            torch.tensor(src).permute(2, 0, 1)[None],
            scale_factor=((out_hw[0] + 1e-4) / in_hw[0], (out_hw[1] + 1e-4) / in_hw[1]),
            mode="bilinear",
            align_corners=True,
        )[0].permute(1, 2, 0)
        assert t.shape == tuple([*out_hw, 3])
        np.testing.assert_allclose(np.asarray(ours), t.numpy(), atol=5e-5)

    @pytest.mark.parametrize("in_hw,out_hw", [((37, 37), (28, 28)), ((16, 16), (37, 23))])
    def test_bicubic_matches_torch(self, rng, in_hw, out_hw):
        src = rng.standard_normal((*in_hw, 4)).astype(np.float32)
        ours = interpolate_bicubic(jnp.asarray(src), *out_hw)
        t = torch.nn.functional.interpolate(
            torch.tensor(src).permute(2, 0, 1)[None],
            size=out_hw,
            mode="bicubic",
            align_corners=False,
        )[0].permute(1, 2, 0)
        np.testing.assert_allclose(np.asarray(ours), t.numpy(), atol=1e-4)

    @pytest.mark.parametrize("in_hw,out_hw", [((64, 48), (32, 24)), ((30, 40), (60, 80)), ((54, 96), (54, 96))])
    def test_resize_antialias_matches_torch(self, rng, in_hw, out_hw):
        """torchvision Resize(antialias=True) delegates to this torch op."""
        src = rng.random((*in_hw, 3)).astype(np.float32)
        ours = resize_bilinear_antialias(src, *out_hw)
        t = torch.nn.functional.interpolate(
            torch.tensor(src).permute(2, 0, 1)[None],
            size=out_hw,
            mode="bilinear",
            align_corners=False,
            antialias=True,
        )[0].permute(1, 2, 0)
        np.testing.assert_allclose(ours, t.numpy(), atol=2e-4)


class TestMetrics:
    def test_psnr_round_trip(self):
        mse = jnp.asarray(0.01)
        np.testing.assert_allclose(float(psnr2mse(mse2psnr(mse))), 0.01, rtol=1e-4)

    def test_abs2psnr_matches_torch(self):
        a = 0.125
        expected = (-10 * torch.log10(torch.tensor(a) ** 2)).item()
        np.testing.assert_allclose(float(abs2psnr(jnp.asarray(a))), expected, rtol=1e-6)

    def test_correlation_matches_torch_corrcoef(self, rng):
        a = rng.standard_normal((8, 9)).astype(np.float32)
        b = (0.5 * a + 0.5 * rng.standard_normal((8, 9))).astype(np.float32)
        ours = float(correlation(jnp.asarray(a), jnp.asarray(b)))
        x = torch.stack([torch.tensor(a).flatten(), torch.tensor(b).flatten()])
        expected = x.corrcoef()[0, 1].item()
        np.testing.assert_allclose(ours, expected, atol=1e-6)
