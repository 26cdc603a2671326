"""Shape-bucketed inference: padded + masked forward == unpadded forward.

VERDICT r1 #2: the reference resizes the short side only, so every aspect
ratio is a new XLA graph (10-25 min per cold TPU compile). Bucketing pads
inputs to a static bucket shape with traced valid dims: attention masks +
valid-grid positional embeddings make the valid output region equal the
unpadded run, and ONE compiled graph serves every shape in the bucket.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from crossscore_tpu.models import CrossScoreNet, CrossScoreConfig, ViTConfig

VIT = ViTConfig(hidden_size=64, num_layers=2, num_heads=4, patch_size=14, image_size=56)
MCFG = CrossScoreConfig(backbone=VIT, pe_h=6, pe_w=6, decoder_heads=4, decoder_layers=2)


@pytest.fixture(scope="module")
def model_and_params():
    model = CrossScoreNet(MCFG)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((1, 56, 56, 3)).astype(np.float32))
    r = jnp.asarray(rng.standard_normal((1, 2, 56, 56, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), q, r)["params"]
    return model, params


def _pad_to(x, hw):
    h, w = hw
    pad = [(0, 0)] * x.ndim
    pad[-3] = (0, h - x.shape[-3])
    pad[-2] = (0, w - x.shape[-2])
    return jnp.pad(x, pad)


@pytest.mark.parametrize("true_hw", [(56, 56), (56, 84), (84, 70), (42, 98)])
def test_padded_masked_forward_matches_unpadded(model_and_params, true_hw):
    model, params = model_and_params
    bucket = (98, 112)
    rng = np.random.default_rng(hash(true_hw) % 2**31)
    h, w = true_hw
    q = jnp.asarray(rng.standard_normal((2, h, w, 3)).astype(np.float32))
    r = jnp.asarray(rng.standard_normal((2, 3, h, w, 3)).astype(np.float32))

    ref = model.apply({"params": params}, q, r)["score_map_ref_cross"]

    out = model.apply(
        {"params": params},
        _pad_to(q, bucket),
        _pad_to(r, bucket),
        valid_hw=(jnp.asarray(h, jnp.int32), jnp.asarray(w, jnp.int32)),
    )["score_map_ref_cross"]
    got = out[:, :h, :w]
    diff = float(jnp.abs(got - ref).max())
    assert diff < 2e-4, (true_hw, diff)


def test_mixed_aspect_test_cli(tmp_path):
    """e2e: a mixed-aspect NVS tree evaluates through the test CLI with
    shape bucketing — every frame scored exactly once, metrics finite.
    (Without bucketing this dataset cannot even collate: shapes differ.)"""
    import os

    from crossscore_tpu.data.synthetic import generate
    from crossscore_tpu.tasks.test import main

    generate(
        tmp_path / "datadir",
        hw=[(84, 112), (112, 84)],
        scenes_per_split={"train": 1, "test": 2},
    )
    old = os.getcwd()
    os.chdir(tmp_path)
    try:
        out_dir = main([
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
            "alias=buckets",
        ])
    finally:
        os.chdir(old)
    if not out_dir.is_absolute():
        out_dir = tmp_path / out_dir
    import csv as _csv

    with open(out_dir / "metrics.csv") as f:
        rows = list(_csv.DictReader(f))
    data_rows = [r for r in rows if r["batch_idx"] != "mean"]
    # 2 test scenes x (4 gs_train + 3 gs_test query frames) = 14 items; both
    # shapes round up to the SAME (112, 112) bucket, and bucket-PACKED
    # batches mix them -> ceil(14/2) = 7 batches (8 under the old
    # exact-shape grouping — one graph AND fewer padded batches now)
    assert len(data_rows) == 7
    assert all(np.isfinite(float(r["test/loss"])) for r in data_rows)
    csvs = list((out_dir / "score_summary").rglob("*.csv"))
    assert csvs
    import pandas as pd

    df = pd.concat([pd.read_csv(c) for c in csvs])
    assert len(df) == 14  # every frame summarised exactly once


def test_one_graph_serves_all_shapes_in_bucket(model_and_params):
    """jit-cache probe: four different valid shapes through ONE bucket reuse
    ONE compiled graph (valid dims are traced, bucket dims static)."""
    model, params = model_and_params
    bucket = (98, 112)

    @jax.jit
    def fwd(q, r, h, w):
        return model.apply({"params": params}, q, r, valid_hw=(h, w))[
            "score_map_ref_cross"
        ]

    rng = np.random.default_rng(0)
    for h, w in [(56, 56), (56, 84), (84, 70), (42, 98)]:
        q = _pad_to(jnp.asarray(rng.standard_normal((1, h, w, 3)), jnp.float32), bucket)
        r = _pad_to(
            jnp.asarray(rng.standard_normal((1, 3, h, w, 3)), jnp.float32), bucket
        )
        fwd(q, r, jnp.asarray(h, jnp.int32), jnp.asarray(w, jnp.int32))
    assert fwd._cache_size() == 1


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_per_item_valid_hw_matches_unpadded(impl, rng):
    """A bucket-PACKED batch mixing two shapes (per-item (B, 2) valid_hw)
    equals the unpadded per-shape runs — through the dense AND the masked
    layout-native pallas kernels (interpret mode)."""
    import dataclasses

    mcfg = dataclasses.replace(MCFG, attention_impl=impl)
    model = CrossScoreNet(mcfg)
    H = W = 84
    q = jnp.asarray(rng.standard_normal((2, H, W, 3)).astype(np.float32))
    r = jnp.asarray(rng.standard_normal((2, 2, H, W, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), q[:1], r[:1])["params"]

    vhw = jnp.asarray([[84, 84], [56, 70]], jnp.int32)
    out = model.apply({"params": params}, q, r, valid_hw=vhw)["score_map_ref_cross"]

    want0 = model.apply({"params": params}, q[:1], r[:1])["score_map_ref_cross"]
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(want0[0]), atol=5e-4)
    q1, r1 = q[1:, :56, :70], r[1:, :, :56, :70]
    want1 = model.apply({"params": params}, q1, r1)["score_map_ref_cross"]
    np.testing.assert_allclose(np.asarray(out[1, :56, :70]), np.asarray(want1[0]),
                               atol=5e-4)


def test_forced_bucket_predict_matches_plain(tmp_path):
    """Predict with buckets FORCED on a single-shape dir exercises the
    per-item (B, 2) valid_hw path end-to-end (padded inputs, masked kernels,
    per-item host-side crops). Score maps match the plain run to mask-exact
    float tolerance (padded+masked attention is tolerance-exact, not
    bit-exact; at uint16 quantization that is a couple of counts)."""
    import os

    from crossscore_tpu.data.synthetic import generate
    from crossscore_tpu.tasks.predict import main

    generate(tmp_path / "datadir", hw=(84, 112),
             scenes_per_split={"train": 1, "test": 1})
    old = os.getcwd()
    os.chdir(tmp_path)
    try:
        common = [
            "trainer.accelerator=cpu",
            "model.tpu.compute_dtype=float32",
            "model.backbone.preset=dinov2-test",
            "data.neighbour_config.cross=2",
            "data.dataset.query_dir=datadir/res_540/s00001/test/ours_1000/renders",
            "data.dataset.reference_dir=datadir/res_540/s00001/train/ours_1000/gt",
            "data.loader.validation.batch_size=2",
            "this_main.resize_short_side=84",
            "logger.predict.write.config.score_map_colour_mode=gray",
        ]
        out_plain = main(common + ["this_main.shape_buckets=off", "alias=plain"])
        out_forced = main(common + ["this_main.shape_buckets=on",
                                    "this_main.bucket_multiple=56", "alias=forced"])
    finally:
        os.chdir(old)
    for out in (out_plain, out_forced):
        assert out.is_absolute() or True
    a = sorted((tmp_path / out_plain / "batch" / "score_map_ref_cross").glob("*.png")
               if not out_plain.is_absolute()
               else (out_plain / "batch" / "score_map_ref_cross").glob("*.png"))
    b = sorted((tmp_path / out_forced / "batch" / "score_map_ref_cross").glob("*.png")
               if not out_forced.is_absolute()
               else (out_forced / "batch" / "score_map_ref_cross").glob("*.png"))
    assert len(a) == len(b) == 3
    from PIL import Image

    for x, y in zip(a, b):
        assert x.name == y.name
        pa = np.asarray(Image.open(x)).astype(np.int64)
        pb = np.asarray(Image.open(y)).astype(np.int64)
        assert pa.shape == pb.shape, x.name
        # uint16 gray maps; 2e-4 float tolerance ~= 13 counts of 65535
        assert np.abs(pa - pb).max() <= 32, (x.name, np.abs(pa - pb).max())
