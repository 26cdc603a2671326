"""Unit tests: batch writer layout, summarisers, metric loggers, visualiser."""

import json

import numpy as np
import pandas as pd
import pytest
from PIL import Image

from crossscore_tpu.confsys import load_config, set_key
from crossscore_tpu.io.batch_writer import BatchWriter, get_vrange
from crossscore_tpu.io.summariser import (
    SummaryWriterPredictedOnline,
    SummaryWriterPredictedOnlineTestPrediction,
    SummaryWriterGroundTruth,
    SummaryReader,
)
from crossscore_tpu.io.images import normalize_imagenet, metric_map_read
from crossscore_tpu.utils.metric_logger import (
    MetricLoggerScalar,
    MetricLoggerHistogram,
    MetricLoggerCorrelation,
)
from crossscore_tpu.utils.vis import gray2rgb, attn2rgb, make_visualiser


def _fake_batch(rng, b=2, k=2, hw=28):
    deep = "datadir/ptr/gaussian/map-free-reloc/res_540/s0007{}/test/ours_1000/renders/frame_0000{}.png"
    return {
        "query/img": normalize_imagenet(rng.random((b, hw, hw, 3)).astype(np.float32)),
        "query/score_map": rng.random((b, hw, hw)).astype(np.float32),
        "reference/cross/imgs": normalize_imagenet(
            rng.random((b, k, hw, hw, 3)).astype(np.float32)
        ),
        "_valid": np.asarray(b, np.int32),
        "item_paths": {
            "query/img": [deep.format(i, i) for i in range(b)],
            "query/score_map": ["x"] * b,
            "reference/cross/imgs": [
                [f"datadir/ptr/gaussian/mfr/res_540/s/train/ours_1000/gt/frame_{j}{i}.png" for i in range(b)]
                for j in range(k)
            ],
        },
    }


def _outputs(rng, b=2, hw=28):
    return {"score_map_ref_cross": rng.random((b, hw, hw)).astype(np.float32)}


class TestVrange:
    def test_table(self):
        assert get_vrange("ssim", 0, 1) == ([-1, 1], [0, 1])
        assert get_vrange("mae", 0, 1) == ([0, 1], [0, 1])
        with pytest.raises(ValueError):
            get_vrange("nope", 0, 1)


class TestBatchWriter:
    def _writer(self, tmp_path, mode="gray"):
        cfg = load_config("default_test")
        set_key(cfg, "logger.test.out_dir", str(tmp_path))
        cfg.logger.test.write.config.score_map_colour_mode = mode
        return BatchWriter(cfg, "test"), cfg

    def test_gray_uint16_roundtrip(self, rng, tmp_path):
        writer, _ = self._writer(tmp_path, "gray")
        batch, outputs = _fake_batch(rng), _outputs(rng)
        writer.write_out(batch, outputs, local_rank=0, batch_idx=3)
        files = sorted((tmp_path / "batch" / "score_map_ref_cross").glob("*.png"))
        assert len(files) == 2
        assert files[0].name.startswith("r0_B0003_b000_")
        decoded = metric_map_read(files[0], vrange=[-1, 1])
        np.testing.assert_allclose(decoded, outputs["score_map_ref_cross"][0], atol=1e-4)

    def test_rgb_mode_and_json(self, rng, tmp_path):
        cfg = load_config("default_predict")
        set_key(cfg, "logger.predict.out_dir", str(tmp_path))
        cfg.logger.predict.write.flag.item_path_json = True
        writer = BatchWriter(cfg, "predict")
        batch, outputs = _fake_batch(rng), _outputs(rng)
        writer.write_out(batch, outputs, local_rank=0, batch_idx=0)
        rgb_file = next((tmp_path / "batch" / "score_map_ref_cross").glob("*.png"))
        img = np.array(Image.open(rgb_file))
        assert img.ndim == 3 and img.shape[2] == 3  # turbo RGB
        j = json.loads((tmp_path / "batch" / "item_path_json" / "r0_B0000.json").read_text())
        assert np.array(j["reference/cross/imgs"]).shape == (2, 2)  # transposed to (B, K)
        # query + reference images written
        assert len(list((tmp_path / "batch" / "image_query").glob("*.png"))) == 2
        refs = list((tmp_path / "batch" / "image_reference").rglob("*.png"))
        assert len(refs) == 4

    def test_uint8_wire_images_roundtrip(self, rng, tmp_path):
        """wire_uint8 batches: saved query/reference PNGs must be the RAW
        pixels, not ImageNet-denormalised garbage (regression: an explicit
        float32 cast before to_display_rgb defeated its dtype branch and
        wrote near-solid-white images)."""
        cfg = load_config("default_predict")
        set_key(cfg, "logger.predict.out_dir", str(tmp_path))
        writer = BatchWriter(cfg, "predict")
        batch, outputs = _fake_batch(rng), _outputs(rng)
        q_u8 = rng.integers(0, 255, batch["query/img"].shape, dtype=np.uint8)
        r_u8 = rng.integers(
            0, 255, batch["reference/cross/imgs"].shape, dtype=np.uint8
        )
        batch["query/img"], batch["reference/cross/imgs"] = q_u8, r_u8
        writer.write_out(batch, outputs, local_rank=0, batch_idx=0)
        saved = sorted((tmp_path / "batch" / "image_query").glob("*.png"))
        assert len(saved) == 2
        got = np.array(Image.open(saved[0]))
        np.testing.assert_array_equal(got, q_u8[0])
        ref_png = sorted((tmp_path / "batch" / "image_reference").rglob("*.png"))[0]
        np.testing.assert_array_equal(np.array(Image.open(ref_png)), r_u8[0, 0])

    def test_padded_items_not_written(self, rng, tmp_path):
        writer, _ = self._writer(tmp_path)
        batch, outputs = _fake_batch(rng), _outputs(rng)
        batch["_valid"] = np.asarray(1, np.int32)
        writer.write_out(batch, outputs, local_rank=0, batch_idx=0)
        assert len(list((tmp_path / "batch" / "score_map_ref_cross").glob("*.png"))) == 1


class TestSummarisers:
    def test_online_summary_csv(self, rng, tmp_path):
        s = SummaryWriterPredictedOnlineTestPrediction("ssim", 0, dir_out=str(tmp_path))
        batch, outputs = _fake_batch(rng), _outputs(rng)
        s.update(batch, outputs)
        s.update(batch, outputs)
        assert len(s) == 4
        s.summarise()
        csvs = list((tmp_path / "score_summary").rglob("*.csv"))
        assert len(csvs) == 1
        assert csvs[0].parent.name == "map-free-reloc" and csvs[0].stem == "gaussian"
        df = pd.read_csv(csvs[0])
        assert list(df.columns)[-1] == "pred_ssim_0_1"
        expected = outputs["score_map_ref_cross"].reshape(2, -1).mean(1)
        got = df.drop_duplicates("image_name").sort_values("image_name")["pred_ssim_0_1"]
        np.testing.assert_allclose(sorted(got), sorted(expected), atol=1e-4)

    def test_metric_str_variants(self):
        assert SummaryWriterPredictedOnline("ssim", -1).columns[-1] == "pred_ssim_-1_1"
        assert SummaryWriterPredictedOnline("mae", 0).columns[-1] == "pred_mae"

    def test_gt_summary_and_reader(self, tmp_path):
        from crossscore_tpu.data.synthetic import generate

        root = tmp_path / "d"
        generate(root, hw=(28, 28), scenes_per_split={"train": 1, "val": 0, "test": 0},
                 n_train_imgs=2, n_test_imgs=2)
        # layout expectation: dir_in = <...>/<method>/<dataset>/res_dir; emulate
        dir_in = root / "res_540"
        out = tmp_path / "summary"
        w = SummaryWriterGroundTruth(dir_in=dir_in, dir_out=out, num_workers=2)
        w.write_csv()
        csvs = list(out.rglob("*.csv"))
        assert len(csvs) == 1
        df = pd.read_csv(csvs[0])
        assert len(df) == 4  # 2 imgs x (train+test)
        assert {"gt_ssim_-1_1", "gt_mae", "gt_psnr"} <= set(df.columns)

        summary = SummaryReader.read_summary(
            out, csvs[0].parent.name, [""], [""], [""], []
        )
        assert "method_name" in summary.columns
        SummaryReader.check_summary_gt_prediction_rows(summary, summary)


class TestMetricLoggers:
    def test_scalar_bounded(self):
        m = MetricLoggerScalar(max_length=3)
        for i in range(5):
            m.update(float(i))
        assert len(m) <= 3
        assert m.compute() == pytest.approx(np.mean([3, 4]))

    def test_histogram(self):
        m = MetricLoggerHistogram(max_length=None)
        m.update(np.zeros(10))
        m.update(np.ones(10))
        counts, edges = m.compute(bins=2)
        assert counts.sum() == 20

    def test_correlation(self, rng):
        m = MetricLoggerCorrelation(max_length=None)
        a = rng.random((5, 5))
        m.update(a, a)
        assert m.compute() == pytest.approx(1.0, abs=1e-5)


class TestVisualiser:
    def test_figures_save(self, rng, tmp_path):
        cfg = load_config("default_predict")
        vis = make_visualiser(cfg)
        fig = vis.vis(_fake_batch(rng), _outputs(rng))
        fig.savefig(tmp_path / "f.png")
        assert (tmp_path / "f.png").stat().st_size > 0

    def test_attn_visualiser(self, rng, tmp_path):
        cfg = load_config("default_predict", overrides=["model.need_attn_weights=true"])
        vis = make_visualiser(cfg)
        batch, outputs = _fake_batch(rng), _outputs(rng)
        outputs["attn_weights_map_ref_cross"] = rng.random((2, 2, 2, 2, 2, 2)).astype(np.float32)
        fig = vis.vis(batch, outputs)
        fig.savefig(tmp_path / "a.png")
        assert (tmp_path / "a.png").stat().st_size > 0

    def test_colormaps(self, rng):
        g = gray2rgb(rng.random((8, 8)).astype(np.float32), (0, 1))
        assert g.shape == (8, 8, 3) and g.dtype == np.uint8
        a = attn2rgb(rng.random((8, 8)).astype(np.float32))
        assert a.shape == (8, 8, 3) and a.dtype == np.uint8
