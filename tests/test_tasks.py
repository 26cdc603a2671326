"""End-to-end CLI task tests on a synthetic dataset (CPU, tiny model preset).

These drive the public surfaces exactly as predict.sh / the reference CLIs do,
checking the on-disk output layout contract.
"""

import json
import os

import numpy as np
import pytest

from crossscore_tpu.data.synthetic import generate

SMALL_OVERRIDES = [
    "trainer.accelerator=cpu",
    "model.tpu.compute_dtype=float32",
    "model.backbone.preset=dinov2-test",
    "data.neighbour_config.cross=2",
]


@pytest.fixture(scope="module")
def ws(tmp_path_factory):
    """Workspace with a synthetic dataset; tasks run with cwd inside it."""
    root = tmp_path_factory.mktemp("tasks_ws")
    generate(root / "datadir", hw=(84, 112), scenes_per_split={"train": 1, "val": 1, "test": 1})
    old = os.getcwd()
    os.chdir(root)
    yield root
    os.chdir(old)


class TestPredictTask:
    def test_predict_outputs(self, ws):
        from crossscore_tpu.tasks.predict import main

        out_dir = main(
            SMALL_OVERRIDES
            + [
                "data.dataset.query_dir=datadir/res_540/s00002/test/ours_1000/renders",
                "data.dataset.reference_dir=datadir/res_540/s00002/train/ours_1000/gt",
                "data.loader.validation.batch_size=2",
                "data.loader.validation.num_workers=2",
                "this_main.resize_short_side=84",
                "alias=scene",
            ]
        )
        assert (out_dir / "vis" / "r0_B0000_b0.png").exists()
        maps = sorted((out_dir / "batch" / "score_map_ref_cross").glob("*.png"))
        assert len(maps) == 3  # all query frames, incl. padded final batch trimmed
        assert "r0_B0000_b000" in maps[0].name
        csvs = list((out_dir / "score_summary").rglob("*.csv"))
        assert len(csvs) == 1
        import pandas as pd

        df = pd.read_csv(csvs[0])
        assert list(df.columns) == ["scene_name", "rendered_dir", "image_name", "pred_ssim_0_1"]
        assert len(df) == 3
        assert df["pred_ssim_0_1"].between(0, 1).all()


class TestTestTask:
    def test_metrics_csv_and_outputs(self, ws):
        from crossscore_tpu.tasks.test import main

        out_dir = main(
            SMALL_OVERRIDES
            + [
                "data.dataset.path=[datadir]",
                "data.loader.validation.batch_size=2",
                "data.loader.validation.num_workers=2",
                "this_main.resize_short_side=-1",
                "alias=eval",
            ]
        )
        assert (out_dir / "metrics.csv").exists()
        lines = (out_dir / "metrics.csv").read_text().strip().splitlines()
        assert lines[0].startswith("batch_idx,test/loss")
        assert lines[-1].startswith("mean,")
        # gray uint16 score maps
        maps = list((out_dir / "batch" / "score_map_ref_cross").glob("*.png"))
        assert maps
        from PIL import Image

        assert np.array(Image.open(maps[0])).dtype in (np.uint16, np.int32)
        # item path jsons
        jsons = list((out_dir / "batch" / "item_path_json").glob("*.json"))
        assert jsons
        data = json.loads(jsons[0].read_text())
        assert "query/img" in data and "reference/cross/imgs" in data


class TestTrainTask:
    def test_short_training_run_and_resume(self, ws):
        from crossscore_tpu.tasks.train import main

        overrides = SMALL_OVERRIDES + [
            "data.dataset.path=[datadir]",
            "data.loader.train.batch_size=2",
            "data.loader.validation.batch_size=2",
            "data.loader.train.num_workers=2",
            "data.loader.validation.num_workers=2",
            "data.transforms.crop_size=56",
            "this_main.resize_short_side=-1",
            "trainer.num_sanity_val_steps=1",
            "trainer.limit_val_batches=1",
            "logger.vis_scalar_every_n_train_steps=1",
        ]
        run_dir = main(overrides + ["trainer.max_epochs=1", "alias=t1"])
        assert (run_dir / "metrics.jsonl").exists()
        rows = [json.loads(l) for l in (run_dir / "metrics.jsonl").read_text().splitlines()]
        assert any("train/loss" in r for r in rows)
        assert any("validation/loss" in r for r in rows)
        ckpts = list((run_dir / "ckpt").iterdir())
        assert ckpts, "save_last checkpoint missing"

        run2 = main(
            overrides
            + [
                "trainer.max_epochs=2",
                f"trainer.ckpt_path_to_load={run_dir / 'ckpt'}",
                "alias=t2",
            ]
        )
        rows2 = [json.loads(l) for l in (run2 / "metrics.jsonl").read_text().splitlines()]
        steps = [r["step"] for r in rows2 if "train/loss" in r]
        assert steps and min(steps) > min(r["step"] for r in rows if "train/loss" in r)

    def test_wire_uint8_train_run(self, ws):
        """wire_uint8 batches drive the full loop — loader, device normalise,
        metrics, and the uint8-aware visualiser path (io/images.py
        ``to_display_rgb``)."""
        from crossscore_tpu.tasks.train import main

        run_dir = main(SMALL_OVERRIDES + [
            "data.dataset.path=[datadir]",
            "data.dataset.wire_uint8=true",
            "data.loader.train.batch_size=2",
            "data.loader.validation.batch_size=2",
            "data.loader.train.num_workers=2",
            "data.loader.validation.num_workers=2",
            "data.transforms.crop_size=56",
            "this_main.resize_short_side=-1",
            "trainer.max_epochs=1",
            "trainer.num_sanity_val_steps=1",
            "trainer.limit_val_batches=1",
            "logger.vis_scalar_every_n_train_steps=1",
            "logger.vis_imgs_every_n_train_steps=2",
            "alias=u8",
        ])
        rows = [json.loads(l) for l in (run_dir / "metrics.jsonl").read_text().splitlines()]
        assert any("train/loss" in r for r in rows)
        assert any("validation/loss" in r for r in rows)
        assert list((run_dir / "vis").glob("*.png")), "uint8 vis path wrote no figure"

    def test_scoped_vmem_knob_ignored_on_cpu(self, ws):
        """model.tpu.scoped_vmem_kib forwards a TPU-only XLA flag as per-jit
        compiler options (the 2x-res ViT-L unblock, PERFORMANCE.md r4); on a
        CPU backend the flag is unknown, so the knob must gate itself off —
        a train run with it set completes rather than crashing at jit time."""
        from crossscore_tpu.tasks.train import main

        run_dir = main(SMALL_OVERRIDES + [
            "data.dataset.path=[datadir]",
            "model.tpu.scoped_vmem_kib=32768",
            "data.loader.train.batch_size=2",
            "data.loader.validation.batch_size=2",
            "data.transforms.crop_size=56",
            "this_main.resize_short_side=-1",
            "trainer.max_epochs=1",
            "trainer.max_steps=1",
            "trainer.num_sanity_val_steps=0",
            "trainer.limit_val_batches=1",
            "logger.vis_scalar_every_n_train_steps=1",
            "alias=svk",
        ])
        rows = [json.loads(l) for l in (run_dir / "metrics.jsonl").read_text().splitlines()]
        assert any("train/loss" in r for r in rows)

    def test_check_val_every_n_epoch(self, ws):
        """Lightning's check_val_every_n_epoch semantics: validation runs
        when (epoch+1) % n == 0 — 3 epochs at n=2 validate exactly once."""
        from crossscore_tpu.tasks.train import main

        run_dir = main(SMALL_OVERRIDES + [
            "data.dataset.path=[datadir]",
            "data.loader.train.batch_size=2",
            "data.loader.validation.batch_size=2",
            "data.transforms.crop_size=56",
            "this_main.resize_short_side=-1",
            "trainer.num_sanity_val_steps=0",
            "trainer.limit_val_batches=1",
            "trainer.max_epochs=3",
            "trainer.check_val_every_n_epoch=2",
            "alias=valcad",
        ])
        rows = [json.loads(l) for l in (run_dir / "metrics.jsonl").read_text().splitlines()]
        assert sum("validation/loss" in r for r in rows) == 1

    def test_mid_epoch_resume_identical_trajectory(self, ws):
        """Kill training mid-epoch, resume from the checkpoint: the loss
        trajectory must be identical to an uninterrupted run (the loop cursor
        — epoch + batch-in-epoch — is part of the train state, so resume
        re-enters the SAME epoch at the SAME batch; reference resumes
        Lightning's exact loop state)."""
        from crossscore_tpu.tasks.train import main

        overrides = SMALL_OVERRIDES + [
            "data.dataset.path=[datadir]",
            "data.loader.train.batch_size=2",
            "data.loader.validation.batch_size=2",
            "data.loader.train.num_workers=1",
            "data.loader.validation.num_workers=1",
            "data.transforms.crop_size=56",
            "this_main.resize_short_side=-1",
            "trainer.num_sanity_val_steps=0",
            "trainer.limit_train_batches=3",
            "trainer.limit_val_batches=1",
            "trainer.max_epochs=2",
            "logger.vis_scalar_every_n_train_steps=1",
        ]

        def losses_by_step(run_dir):
            rows = [
                json.loads(l) for l in (run_dir / "metrics.jsonl").read_text().splitlines()
            ]
            return {r["step"]: r["train/loss_cross"] for r in rows if "train/loss_cross" in r}

        full = losses_by_step(main(overrides + ["alias=full"]))
        # interrupted at step 4 = epoch 1, batch 1 (3 steps per epoch)
        part = main(overrides + ["trainer.max_steps=4", "alias=part"])
        resumed = losses_by_step(
            main(overrides + [f"trainer.ckpt_path_to_load={part / 'ckpt'}", "alias=res"])
        )
        assert set(full) == {1, 2, 3, 4, 5, 6}
        assert set(resumed) == {5, 6}, "resume must re-enter mid-epoch, not restart it"
        for step in resumed:
            assert resumed[step] == pytest.approx(full[step], rel=1e-5), step


class TestFullValidationSet:
    def test_padded_final_val_batch_equals_exact_mean(self, ws):
        """The training val loader keeps the final partial batch (reference
        torch DataLoader default drop_last=False, task/train.py:86-103) and
        masks the padded duplicates: with a val set NOT divisible by the batch
        size, the weighted val loss must equal the exact per-item mean (= a
        batch_size=1 run over the same samples)."""
        from crossscore_tpu.tasks.train import main

        common = SMALL_OVERRIDES + [
            "data.dataset.path=[datadir]",
            "data.loader.train.batch_size=2",
            "data.loader.train.num_workers=1",
            "data.loader.validation.num_workers=1",
            "data.transforms.crop_size=56",
            "this_main.resize_short_side=-1",
            "trainer.num_sanity_val_steps=999",
            "trainer.max_epochs=0",
            "logger.cache_size.validation.n_fig=0",
        ]

        def val_loss(alias, bs):
            run_dir = main(
                common + [f"data.loader.validation.batch_size={bs}", f"alias={alias}"]
            )
            rows = [
                json.loads(l) for l in (run_dir / "metrics.jsonl").read_text().splitlines()
            ]
            r = [x for x in rows if "validation/loss" in x]
            assert len(r) == 1
            return r[0]["validation/loss"]

        # 7 val items: bs=2 -> 3 full batches + 1 padded single-item batch
        assert val_loss("vb2", 2) == pytest.approx(val_loss("vb1", 1), rel=2e-5)


class TestRunReproducibility:
    def test_config_snapshot_and_hparams_warning(self, ws, capsys):
        """Every run dir carries the composed config (hydra writes
        .hydra/config.yaml, reference config/default.yaml:6-8) and every ckpt
        dir carries hparams.yaml (Lightning save_hyperparameters,
        task/core.py:170); resuming under a different config warns loudly."""
        from crossscore_tpu.tasks.train import main

        overrides = SMALL_OVERRIDES + [
            "data.dataset.path=[datadir]",
            "data.loader.train.batch_size=2",
            "data.loader.validation.batch_size=2",
            "data.loader.train.num_workers=1",
            "data.loader.validation.num_workers=1",
            "data.transforms.crop_size=56",
            "this_main.resize_short_side=-1",
            "trainer.num_sanity_val_steps=0",
            "trainer.limit_train_batches=1",
            "trainer.limit_val_batches=1",
            "trainer.max_epochs=1",
        ]
        run_dir = main(overrides + ["alias=snap"])
        import yaml

        snap = yaml.safe_load((run_dir / "config.yaml").read_text())
        assert snap["model"]["backbone"]["preset"] == "dinov2-test"
        hp = yaml.safe_load((run_dir / "ckpt" / "hparams.yaml").read_text())
        assert hp["trainer"]["optimizer"]["lr"] == snap["trainer"]["optimizer"]["lr"]
        assert hp["data"]["transforms"]["crop_size"] == 56

        capsys.readouterr()
        main(
            overrides
            + [
                f"trainer.ckpt_path_to_load={run_dir / 'ckpt'}",
                "trainer.optimizer.lr=1e-5",
                "trainer.max_epochs=2",
                "alias=snap2",
            ]
        )
        out = capsys.readouterr().out
        assert "differs from the checkpoint's hparams" in out
        assert "optimizer.lr" in out


class TestViewParallelPredict:
    def test_view_parallel_matches_single_device(self, ws):
        """model.tpu.view_parallel=on shards K=8 refs over the 8-device CPU
        mesh and must produce byte-identical score maps to the off path
        (VERDICT r1 #8: view parallelism reachable from the CLI)."""
        from crossscore_tpu.tasks.predict import main

        common = SMALL_OVERRIDES + [
            "data.dataset.query_dir=datadir/res_540/s00002/test/ours_1000/renders",
            "data.dataset.reference_dir=datadir/res_540/s00002/train/ours_1000/gt",
            "data.neighbour_config.cross=8",
            "data.loader.validation.batch_size=2",
            "data.loader.validation.num_workers=1",
            "this_main.resize_short_side=84",
        ]
        out_off = main(common + ["model.tpu.view_parallel=off", "alias=vp_off"])
        out_on = main(common + ["model.tpu.view_parallel=on", "alias=vp_on"])
        maps_off = sorted((out_off / "batch" / "score_map_ref_cross").glob("*.png"))
        maps_on = sorted((out_on / "batch" / "score_map_ref_cross").glob("*.png"))
        assert [p.name for p in maps_off] == [p.name for p in maps_on] and maps_off
        import imageio.v3 as iio

        for a, b in zip(maps_off, maps_on):
            va, vb = iio.imread(a).astype(np.int32), iio.imread(b).astype(np.int32)
            assert np.abs(va - vb).max() <= 1, a.name  # uint16 quantised maps


class TestViewParallelCachedPredict:
    def test_vp_with_token_cache_matches_vp_plain(self, ws):
        """cache x view-parallel composition (VERDICT r2 #5): cached reference
        tokens sharded over the view axis produce the same score maps as the
        uncached view-parallel path (context-parallel softmax is token-source
        agnostic)."""
        from crossscore_tpu.tasks.predict import main

        common = SMALL_OVERRIDES + [
            "data.dataset.query_dir=datadir/res_540/s00002/test/ours_1000/renders",
            "data.dataset.reference_dir=datadir/res_540/s00002/train/ours_1000/gt",
            "data.neighbour_config.cross=8",
            "data.loader.validation.batch_size=2",
            "data.loader.validation.num_workers=1",
            "this_main.resize_short_side=84",
            "model.tpu.view_parallel=on",
            "this_main.ref_token_cache_encode_batch=4",
        ]
        out_plain = main(common + ["this_main.ref_token_cache=off", "alias=vpnc"])
        out_cached = main(common + ["this_main.ref_token_cache=on", "alias=vpwc"])
        maps_a = sorted((out_plain / "batch" / "score_map_ref_cross").glob("*.png"))
        maps_b = sorted((out_cached / "batch" / "score_map_ref_cross").glob("*.png"))
        assert [p.name for p in maps_a] == [p.name for p in maps_b] and maps_a
        import imageio.v3 as iio

        for a, b in zip(maps_a, maps_b):
            va, vb = iio.imread(a).astype(np.int32), iio.imread(b).astype(np.int32)
            assert np.abs(va - vb).max() <= 1, a.name  # uint16 quantised maps


class TestMultiHostCachedServing:
    """cache x multi-host composition (VERDICT r2 #5, the last exclusion):
    each process predicts its own index shard on its LOCAL devices. Emulated
    by patching process_count/process_index and running each rank in turn —
    the shard plan, the host-local cached step, _valid masking of wrap-around
    duplicates and rank-qualified outputs are exactly the multi-host code
    path; only the cross-process runtime itself is out of reach here."""

    CACHE_COMMON = SMALL_OVERRIDES + [
        "data.dataset.query_dir=datadir/res_540/s00002/test/ours_1000/renders",
        "data.dataset.reference_dir=datadir/res_540/s00002/train/ours_1000/gt",
        "data.loader.validation.batch_size=2",
        "data.loader.validation.num_workers=1",
        "this_main.resize_short_side=84",
        "model.tpu.view_parallel=off",
        "this_main.ref_token_cache=on",
        "this_main.ref_token_cache_encode_batch=4",
    ]

    @staticmethod
    def _summary_rows(out_dir):
        import pandas as pd

        csvs = list((out_dir / "score_summary").rglob("*.csv"))
        assert len(csvs) == 1
        df = pd.read_csv(csvs[0])
        return {r.image_name: float(r.pred_ssim_0_1) for r in df.itertuples()}

    def test_two_rank_cached_predict_shards_disjoint_and_exact(self, ws, monkeypatch):
        import jax

        from crossscore_tpu.tasks.predict import main

        single = self._summary_rows(main(self.CACHE_COMMON + ["alias=mh_single"]))
        assert len(single) == 3

        rank_rows = []
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        for rank in (0, 1):
            monkeypatch.setattr(jax, "process_index", lambda r=rank: r)
            out = main(self.CACHE_COMMON + [f"alias=mh_rank{rank}"])
            rank_rows.append(self._summary_rows(out))
            # rank-qualified filenames keep a shared out dir collision-free
            maps = list((out / "batch" / "score_map_ref_cross").glob("*.png"))
            assert maps and all(p.name.startswith(f"r{rank}_") for p in maps)

        names = [set(r) for r in rank_rows]
        assert names[0] & names[1] == set()  # disjoint shards
        assert names[0] | names[1] == set(single)  # full coverage, exactly once
        for rows in rank_rows:  # same crops, same math -> same scores
            for name, val in rows.items():
                assert abs(val - single[name]) < 1e-5, name

    def test_two_rank_cached_test_global_metric_reduction(self, ws, monkeypatch):
        """tasks.test under emulated 2-process: the metrics.csv mean row must
        equal the single-host full-set mean via all_process_weighted_mean.
        The allgather is stubbed to hand rank 1 the sums rank 0 contributed —
        the reduction math itself is the code under test."""
        import csv as csvmod

        import jax

        from crossscore_tpu.tasks.test import main

        common = SMALL_OVERRIDES + [
            "data.dataset.path=[datadir]",
            "data.loader.validation.batch_size=2",
            "data.loader.validation.num_workers=1",
            "this_main.resize_short_side=-1",
            "model.tpu.view_parallel=off",
            "this_main.ref_token_cache=on",
            "this_main.ref_token_cache_encode_batch=4",
        ]

        def mean_row(out_dir):
            with open(out_dir / "metrics.csv") as f:
                rows = list(csvmod.DictReader(f))
            assert rows[-1]["batch_idx"] == "mean"
            return {k: float(v) for k, v in rows[-1].items() if k != "batch_idx"}

        single = mean_row(main(common + ["alias=mht_single"]))

        from jax.experimental import multihost_utils

        contributed = []

        def fake_allgather(x, **kw):
            contributed.append(np.asarray(x).copy())
            return np.stack(contributed)  # rank1 sees rank0's sums + its own

        monkeypatch.setattr(multihost_utils, "process_allgather", fake_allgather)
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        for rank in (0, 1):
            monkeypatch.setattr(jax, "process_index", lambda r=rank: r)
            combined = mean_row(main(common + [f"alias=mht_rank{rank}"]))
        assert len(contributed) == 2
        # loss is linear in items -> the weighted cross-process reduction is
        # exact; corr/psnr are batch-POOLED (reference semantics), so a
        # different shard/batch grouping legitimately shifts them a little
        # (exactly as reference DDP does) — assert they stay close
        assert abs(combined["test/loss"] - single["test/loss"]) < 1e-6
        assert abs(combined["test/loss_cross"] - single["test/loss_cross"]) < 1e-6
        assert abs(combined["test/corr_cross"] - single["test/corr_cross"]) < 0.05
        assert abs(combined["test/psnr_cross"] - single["test/psnr_cross"]) < 0.1


class TestPredictEdgeCases:
    def test_k_exceeds_available_refs_pads_with_empty(self, ws):
        """K=6 > 4 available references: sampler pads with empty_image zeros."""
        from crossscore_tpu.tasks.predict import main

        out_dir = main(
            SMALL_OVERRIDES
            + [
                "data.dataset.query_dir=datadir/res_540/s00002/test/ours_1000/renders",
                "data.dataset.reference_dir=datadir/res_540/s00002/train/ours_1000/gt",
                "data.neighbour_config.cross=6",
                "data.loader.validation.batch_size=3",
                "data.loader.validation.num_workers=1",
                "this_main.resize_short_side=84",
                "alias=pad",
            ]
        )
        maps = list((out_dir / "batch" / "score_map_ref_cross").glob("*.png"))
        assert len(maps) == 3
        refs = list((out_dir / "batch" / "image_reference").rglob("*.png"))
        assert len(refs) == 3 * 6  # every query gets 6 refs incl. padded ones

    def test_mae_metric_test_path(self, ws):
        from crossscore_tpu.tasks.test import main

        out_dir = main(
            SMALL_OVERRIDES
            + [
                "data.dataset.path=[datadir]",
                "model.predict.metric.type=mae",
                "data.loader.validation.batch_size=2",
                "data.loader.validation.num_workers=1",
                "this_main.resize_short_side=-1",
                "alias=mae",
            ]
        )
        csvs = list((out_dir / "score_summary").rglob("*.csv"))
        import pandas as pd

        df = pd.read_csv(csvs[0])
        assert "pred_mae" in df.columns
        # gray maps written in the mae intrinsic range [0,1]
        from crossscore_tpu.io.images import metric_map_read

        m = metric_map_read(next((out_dir / "batch" / "score_map_ref_cross").glob("*.png")), [0, 1])
        assert 0 <= m.min() and m.max() <= 1

    def test_attn_weights_written(self, ws):
        from crossscore_tpu.tasks.predict import main

        out_dir = main(
            SMALL_OVERRIDES
            + [
                "data.dataset.query_dir=datadir/res_540/s00002/test/ours_1000/renders",
                "data.dataset.reference_dir=datadir/res_540/s00002/train/ours_1000/gt",
                "model.need_attn_weights=true",
                "model.need_attn_weights_head_id=1",
                "logger.predict.write.flag.attn_weights=true",
                "data.loader.validation.batch_size=3",
                "data.loader.validation.num_workers=1",
                "this_main.resize_short_side=84",
                "alias=attn",
            ]
        )
        attn_pngs = list((out_dir / "batch" / "attn_weights").rglob("*.png"))
        assert len(attn_pngs) == 3 * 2  # 3 queries x K=2 refs, centre patch


class TestProfilingFlag:
    def test_trace_written(self, ws):
        from crossscore_tpu.tasks.train import main

        run_dir = main(
            SMALL_OVERRIDES
            + [
                "data.dataset.path=[datadir]",
                "data.loader.train.batch_size=1",
                "data.loader.validation.batch_size=1",
                "data.loader.train.num_workers=1",
                "data.loader.validation.num_workers=1",
                "data.transforms.crop_size=56",
                "this_main.resize_short_side=-1",
                "trainer.num_sanity_val_steps=0",
                "trainer.limit_val_batches=1",
                "trainer.max_epochs=4",
                "trainer.max_steps=23",
                "trainer.do_profiling=true",
                "alias=prof",
            ]
        )
        import glob

        traces = glob.glob(str(run_dir / "profiler" / "**" / "*.xplane.pb"), recursive=True)
        assert traces, f"no profiler trace under {run_dir}/profiler"


class TestPredictCropMode:
    def test_dataset_default_crop(self, ws):
        from crossscore_tpu.tasks.predict import main

        out_dir = main(
            SMALL_OVERRIDES
            + [
                "data.dataset.query_dir=datadir/res_540/s00002/test/ours_1000/renders",
                "data.dataset.reference_dir=datadir/res_540/s00002/train/ours_1000/gt",
                "this_main.crop_mode=dataset_default",
                "data.transforms.crop_size=56",
                "this_main.resize_short_side=84",
                "data.loader.validation.batch_size=3",
                "data.loader.validation.num_workers=1",
                "alias=cropped",
            ]
        )
        from PIL import Image

        maps = list((out_dir / "batch" / "score_map_ref_cross").glob("*.png"))
        img = Image.open(maps[0])
        assert img.size == (56, 56)  # crop applied


class TestLRScheduleE2E:
    def test_epoch_decay_follows_actual_steps(self, ws):
        """StepLR(step_size=2 epochs) with limit_train_batches=2: the LR must
        halve after 4 optimiser steps (2 actual-steps/epoch), not after
        2*batches_per_epoch steps (the pre-fix behaviour)."""
        import json
        from crossscore_tpu.tasks.train import main

        run_dir = main(
            SMALL_OVERRIDES
            + [
                "data.dataset.path=[datadir]",
                "data.loader.train.batch_size=2",
                "data.loader.validation.batch_size=2",
                "data.loader.train.num_workers=1",
                "data.loader.validation.num_workers=1",
                "data.transforms.crop_size=56",
                "this_main.resize_short_side=-1",
                "trainer.num_sanity_val_steps=0",
                "trainer.limit_val_batches=1",
                "trainer.limit_train_batches=2",
                "trainer.max_epochs=4",
                "trainer.lr_scheduler.step_size=2",
                "logger.vis_scalar_every_n_train_steps=1",
                "alias=lr",
            ]
        )
        rows = [json.loads(l) for l in (run_dir / "metrics.jsonl").read_text().splitlines()]
        lr_by_step = {r["step"]: r["train/lr"] for r in rows if "train/lr" in r}
        base = lr_by_step[1]
        assert lr_by_step[4] == pytest.approx(base)          # still epoch 2
        assert lr_by_step[5] == pytest.approx(base * 0.5)    # decayed after 2 epochs
        assert lr_by_step[8] == pytest.approx(base * 0.5)


class TestMultiMethodEval:
    """BASELINE config #4's EVAL semantics over a multi-method ConcatDataset
    (VERDICT r4 #6): three method roots with DISTINCT degradation processes
    (data/synthetic.py DEGRADATIONS) -> per-(dataset, method) score_summary
    CSVs (reference ``utils/io/score_summariser.py:241-250`` layout) and GT
    summaries that rank the methods by their score scales."""

    @pytest.fixture(scope="class")
    def mm_ws(self, tmp_path_factory):
        from crossscore_tpu.data.synthetic import generate_method_tree

        root = tmp_path_factory.mktemp("mm_ws")
        roots = generate_method_tree(
            root / "corpus",
            hw=(84, 112),
            scenes_per_split={"train": 1, "val": 1, "test": 1},
            n_train_imgs=3,
            n_test_imgs=2,
        )
        old = os.getcwd()
        os.chdir(root)
        yield root, roots
        os.chdir(old)

    def test_concat_eval_writes_per_method_summaries(self, mm_ws):
        import pandas as pd

        from crossscore_tpu.tasks.test import main

        root, roots = mm_ws
        paths = ",".join(str(r) for r in roots)
        out = main(
            SMALL_OVERRIDES
            + [
                f"data.dataset.path=[{paths}]",
                "data.loader.validation.batch_size=2",
                "data.loader.validation.num_workers=1",
                "this_main.resize_short_side=-1",
                "alias=mm",
            ]
        )
        csvs = sorted((out / "score_summary" / "synthmfr").glob("*.csv"))
        assert [c.stem for c in csvs] == ["gaussian", "nerfacto", "tensorf"]
        for c in csvs:
            df = pd.read_csv(c)
            # 1 test-split scene x (3 gs_train + 2 gs_test renders), each
            # summarised exactly once
            assert len(df) == 5, c
            assert "pred_ssim_0_1" in df.columns
            # each (rendered_dir, image) summarised exactly once
            assert not df.duplicated(["rendered_dir", "image_name"]).any()

    def test_gt_summary_ranks_methods_by_degradation_scale(self, mm_ws):
        import pandas as pd

        from crossscore_tpu.tasks.summarise_score_gt import main as gt_main

        root, roots = mm_ws
        out = root / "gt_summary"
        for r in roots:
            gt_main(["--dir_in", str(r / "res_540"), "--dir_out", str(out), "-n", "2"])
        means = {
            m: pd.read_csv(out / "synthmfr" / f"{m}.csv")["gt_ssim_0_1"].mean()
            for m in ("gaussian", "tensorf", "nerfacto")
        }
        # distinct processes, distinct scales: gauss (1-1.6f) < blur (1-0.9f)
        # < quant (1-0.5f) over the same field distribution
        assert means["gaussian"] < means["tensorf"] < means["nerfacto"]
        assert means["tensorf"] - means["gaussian"] > 0.05
        assert means["nerfacto"] - means["tensorf"] > 0.05
