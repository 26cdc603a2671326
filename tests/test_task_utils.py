"""Unit tests for task plumbing: checkpoint cadence, out dirs, batch-size guard."""

import time

import numpy as np
import jax.numpy as jnp
import pytest

from crossscore_tpu.confsys import load_config, set_key
from crossscore_tpu.io.checkpoint import CheckpointManager, save_params, load_params
from crossscore_tpu.tasks.common import resolve_out_dir, confirm_batch_size, resolve_limit


class TestCheckpointManager:
    def test_wall_clock_interval(self, tmp_path):
        mgr = CheckpointManager(tmp_path, train_time_interval_hours=1e-6)  # ~3.6ms
        time.sleep(0.01)
        assert mgr.should_save(step=1)
        mgr.close()

    def test_every_n_steps(self, tmp_path):
        mgr = CheckpointManager(tmp_path, train_time_interval_hours=None, every_n_train_steps=5)
        assert not mgr.should_save(step=4)
        assert mgr.should_save(step=5)
        mgr.close()

    def test_every_n_epochs(self, tmp_path):
        mgr = CheckpointManager(tmp_path, train_time_interval_hours=None, every_n_epochs=2)
        assert not mgr.should_save(step=10, epoch_end=True, epoch=0)
        assert mgr.should_save(step=10, epoch_end=True, epoch=1)
        mgr.close()

    def test_save_restore_roundtrip(self, tmp_path):
        state = {"w": jnp.arange(6.0).reshape(2, 3), "step": jnp.asarray(7)}
        mgr = CheckpointManager(tmp_path, train_time_interval_hours=None)
        mgr.save(7, state, force=True)
        mgr.wait()
        assert mgr.latest_step() == 7
        restored = mgr.restore(None, like=state)
        np.testing.assert_array_equal(np.asarray(restored["w"]), np.asarray(state["w"]))
        mgr.close()

    def test_restore_empty_raises(self, tmp_path):
        mgr = CheckpointManager(tmp_path, train_time_interval_hours=None)
        with pytest.raises(FileNotFoundError):
            mgr.restore(None, like={"x": jnp.zeros(1)})
        mgr.close()


class TestParamsCheckpoint:
    def test_round_trip(self, tmp_path):
        params = {"a": {"k": jnp.ones((3, 4))}, "b": jnp.zeros(5)}
        save_params(tmp_path / "p", params)
        back = load_params(tmp_path / "p", like=params)
        np.testing.assert_array_equal(np.asarray(back["a"]["k"]), np.ones((3, 4)))


class TestOutDirs:
    def test_derives_from_ckpt_path(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        ckpt = tmp_path / "run" / "ckpt" / "best"
        ckpt.mkdir(parents=True)
        cfg = load_config("default_predict", overrides=[
            f"trainer.ckpt_path_to_load={ckpt}", "alias=x",
        ])
        out = resolve_out_dir(cfg, "predict")
        assert out.exists()
        assert str(out).startswith(str(tmp_path / "run" / "predict"))
        assert str(out).endswith("_x")

    def test_no_ckpt_uses_log_tree(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        cfg = load_config("default_predict")
        out = resolve_out_dir(cfg, "predict")
        assert "predict_empty_ckpt" in str(out)


class TestBatchSizeGuard:
    def test_noninteractive_warns_and_proceeds(self, capsys):
        cfg = load_config("default_predict", overrides=[
            "data.loader.validation.batch_size=32",
        ])
        confirm_batch_size(cfg)  # stdin not a tty under pytest
        assert "WARNING" in capsys.readouterr().out
        assert cfg.data.loader.validation.batch_size == 32

    def test_force_silences(self, capsys):
        cfg = load_config("default_predict", overrides=[
            "data.loader.validation.batch_size=32", "this_main.force_batch_size=true",
        ])
        confirm_batch_size(cfg)
        assert capsys.readouterr().out == ""

    def test_crop_mode_skips(self, capsys):
        cfg = load_config("default_predict", overrides=[
            "data.loader.validation.batch_size=32", "this_main.crop_mode=dataset_default",
        ])
        confirm_batch_size(cfg)
        assert capsys.readouterr().out == ""


class TestResolveLimit:
    def test_bool_rejected(self):
        with pytest.raises(ValueError):
            resolve_limit(True, 10)
