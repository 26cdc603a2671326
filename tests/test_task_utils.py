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

    def test_wall_clock_split_for_multihost_decisions(self, tmp_path):
        """Multi-host callers need the wall-clock component separated: the
        step/epoch cadences are deterministic in (config, step) and uniform
        across processes, but the interval clock is per-host and must be
        proc0-broadcast (orbax saves of global arrays are collective)."""
        mgr = CheckpointManager(tmp_path, train_time_interval_hours=1e-6)
        time.sleep(0.01)
        assert mgr.wall_clock_due()
        # deterministic-only view ignores the (due) wall clock
        assert not mgr.should_save(step=1, wall_clock=False)
        mgr.close()
        mgr2 = CheckpointManager(
            tmp_path, train_time_interval_hours=1e-6, every_n_train_steps=5
        )
        time.sleep(0.01)
        assert mgr2.should_save(step=5, wall_clock=False)
        assert not mgr2.should_save(step=4, wall_clock=False)
        mgr2.close()

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

    def test_torn_save_restores_last_complete_step(self, tmp_path):
        """Crash consistency: a save interrupted mid-write (orbax stages into
        a ``<step>.orbax-checkpoint-tmp-*`` dir and commits by atomic rename)
        must be invisible — a fresh manager sees the last COMPLETE step,
        restores it, and can keep saving past the torn step."""
        like = {"w": jnp.zeros((2, 3)), "step": jnp.asarray(0)}
        mgr = CheckpointManager(tmp_path, train_time_interval_hours=None)
        mgr.save(1, {"w": jnp.full((2, 3), 1.0), "step": jnp.asarray(1)}, force=True)
        mgr.wait()
        mgr.close()

        # fabricate the on-disk residue of a writer killed mid-step-2 save:
        # an uncommitted staging dir with partial payload files
        torn = tmp_path / "2.orbax-checkpoint-tmp-1730000000000000"
        (torn / "default" / "d").mkdir(parents=True)
        (torn / "default" / "_sharding").write_bytes(b"{}")
        (torn / "default" / "d" / "deadbeef").write_bytes(b"\x00" * 128)

        mgr2 = CheckpointManager(tmp_path, train_time_interval_hours=None)
        assert mgr2.latest_step() == 1
        restored = mgr2.restore(None, like=like)
        np.testing.assert_array_equal(np.asarray(restored["w"]), np.ones((2, 3)))
        assert int(restored["step"]) == 1
        # the torn step does not block re-saving it
        mgr2.save(2, {"w": jnp.full((2, 3), 2.0), "step": jnp.asarray(2)}, force=True)
        mgr2.wait()
        assert mgr2.latest_step() == 2
        back = mgr2.restore(None, like=like)
        np.testing.assert_array_equal(np.asarray(back["w"]), np.full((2, 3), 2.0))
        mgr2.close()

    def test_sigkill_mid_async_save_recovers(self, tmp_path):
        """Real torn write: a subprocess completes step 1, starts an ASYNC
        step-2 save of a multi-MB state and hard-exits without waiting.
        Whatever the disk ended up with, a fresh manager must restore a
        CONSISTENT state: step 1, or step 2 if the commit won the race."""
        import subprocess
        import sys
        import textwrap

        script = textwrap.dedent(f"""
            import os, sys
            sys.path.insert(0, {str(__import__('pathlib').Path(__file__).resolve().parents[1])!r})
            import jax; jax.config.update("jax_platforms", "cpu")
            import jax.numpy as jnp
            from crossscore_tpu.io.checkpoint import CheckpointManager
            mgr = CheckpointManager({str(tmp_path)!r}, train_time_interval_hours=None)
            mgr.save(1, {{"w": jnp.full((512, 1024), 1.0), "step": jnp.asarray(1)}}, force=True)
            mgr.wait()
            mgr.save(2, {{"w": jnp.full((512, 1024), 2.0), "step": jnp.asarray(2)}}, force=True)
            os._exit(9)  # no wait(), no atexit: the async writer dies mid-flight
        """)
        proc = subprocess.run([sys.executable, "-c", script], capture_output=True, text=True)
        assert proc.returncode == 9, proc.stderr[-2000:]

        like = {"w": jnp.zeros((512, 1024)), "step": jnp.asarray(0)}
        mgr = CheckpointManager(tmp_path, train_time_interval_hours=None)
        step = mgr.latest_step()
        assert step in (1, 2), f"no complete checkpoint survived: {step}"
        restored = mgr.restore(None, like=like)
        # consistency: payload matches the committed step, no mixed state
        np.testing.assert_array_equal(
            np.asarray(restored["w"]), np.full((512, 1024), float(step))
        )
        assert int(restored["step"]) == step
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


class TestServingPlan:
    """plan_serving_modes: the pure serving-composition decision
    (tasks/predict.py) across device topologies."""

    def _plan(self, **kw):
        from crossscore_tpu.tasks.predict import plan_serving_modes

        base = dict(
            vp_mode="auto", cache_mode="auto", use_buckets=False,
            need_attn_weights=False, zero_reference=False, k_refs=8,
            n_dev=8, n_local=8, n_proc=1, data_mesh_size=8,
        )
        base.update(kw)
        return plan_serving_modes(**base)

    def test_single_host_defaults_cache_no_vp(self):
        # big batch fills the data mesh: plain DP + cache
        p = self._plan()
        assert p == (False, False, True)

    def test_single_host_small_batch_auto_vp(self):
        # B=1 can't fill 8 devices -> auto view-parallel, cache composes
        p = self._plan(data_mesh_size=1)
        assert p.use_vp and not p.vp_local and p.use_cache

    def test_multi_host_cached_vp_goes_local(self):
        # 2 hosts x 4 chips, K=8 % 4 == 0: vp on the host-local view mesh,
        # cache stays on — the closed exclusion
        p = self._plan(n_proc=2, n_dev=8, n_local=4, data_mesh_size=1)
        assert p == (True, True, True)

    def test_multi_host_vp_without_cache_uses_global_mesh(self):
        p = self._plan(cache_mode="off", n_proc=2, n_dev=8, n_local=4,
                       data_mesh_size=1)
        assert p == (True, False, False)

    def test_one_chip_per_host_falls_back_to_global_vp(self):
        # 8 hosts x 1 chip: no local view axis exists, explicit vp runs on
        # the global mesh and the cache is dropped (global-mesh arrays can't
        # be fed host-locally). For uniform hosts with >1 chip this case
        # cannot arise: n_local | n_dev | K implies the local mesh fits.
        p = self._plan(vp_mode="on", n_proc=8, n_dev=8, n_local=1,
                       data_mesh_size=1)
        assert p == (True, False, False)

    def test_multi_host_cache_without_vp(self):
        p = self._plan(n_proc=2, n_dev=8, n_local=4, data_mesh_size=8)
        assert p == (False, False, True)

    def test_buckets_exclude_vp_not_cache(self):
        p = self._plan(use_buckets=True, data_mesh_size=1)
        assert p == (False, False, True)

    def test_attn_weights_disable_both(self):
        p = self._plan(need_attn_weights=True, data_mesh_size=1)
        assert p == (False, False, False)

    def test_zero_reference_disables_cache(self):
        p = self._plan(zero_reference=True)
        assert not p.use_cache


class TestMultiHostHelpers:
    """Host-side halves of the multi-host global-batch design (single-process
    behavior here; the multi-process branches are structure-tested since no
    second process exists in CI)."""

    def test_device_view_passthrough_single_process(self):
        from crossscore_tpu.tasks.common import device_view

        b = {"query/img": np.zeros((2, 4, 4, 3)), "_valid": np.asarray(2)}
        assert device_view(b) is b  # no _valid_mask: untouched

    def test_device_view_strips_host_keys_for_global_batches(self):
        from crossscore_tpu.tasks.common import device_view

        b = {
            "query/img": np.zeros((2, 4, 4, 3)),
            "_valid": 1,  # host int — per-process divergent, must not reach jit
            "_valid_mask": np.asarray([1.0, 0.0], np.float32),
            "item_paths": {"query/img": ["a", "b"]},
        }
        out = device_view(b)
        assert set(out) == {"query/img", "_valid_mask"}

    def test_host_rows_numpy_and_full_arrays(self):
        from crossscore_tpu.tasks.common import host_rows

        a = np.arange(12.0).reshape(4, 3)
        assert host_rows(a) is a
        np.testing.assert_array_equal(host_rows(jnp.asarray(a)), a)

    def test_concat_addressable_rows_matches_full_fetch(self):
        """The shard-concat fallback (the multi-host fetch path) reassembles
        a data-sharded array in global-row order, deduping model-axis
        replicas — pinned against np.asarray on the 8-device CPU mesh."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from crossscore_tpu.parallel import make_mesh
        from crossscore_tpu.tasks.common import _concat_addressable_rows

        a = np.arange(8 * 3.0).reshape(8, 3).astype(np.float32)
        mesh = make_mesh(8)
        sharded = jax.device_put(jnp.asarray(a), NamedSharding(mesh, P("data")))
        np.testing.assert_array_equal(_concat_addressable_rows(sharded), a)
        # replicas over a model axis dedupe to one copy per row range
        mesh2 = make_mesh(8, model_parallel=2)
        sharded2 = jax.device_put(
            jnp.asarray(a), NamedSharding(mesh2, P("data"))
        )
        np.testing.assert_array_equal(_concat_addressable_rows(sharded2), a)


class TestLoadModelParams:
    """tasks/common.py load_model_params directory resolution: a training
    run's ckpt/ MANAGER dir (layout ckpt/<step>/<train state>) must load into
    tasks.test/predict directly — the reference points eval at a checkpoint
    the same way (``task/test.py:134``)."""

    def _model_and_cfg(self):
        import jax

        from crossscore_tpu.models import CrossScoreNet, CrossScoreConfig, ViTConfig

        vit = ViTConfig(hidden_size=32, num_layers=1, num_heads=2,
                        patch_size=14, image_size=28)
        model = CrossScoreNet(CrossScoreConfig(backbone=vit, pe_h=3, pe_w=3,
                                               decoder_heads=2))
        rng = np.random.default_rng(0)
        batch = {
            "query/img": jnp.asarray(rng.standard_normal((1, 28, 28, 3)).astype(np.float32)),
            "reference/cross/imgs": jnp.asarray(
                rng.standard_normal((1, 2, 28, 28, 3)).astype(np.float32)),
        }
        cfg = load_config("default_test")
        set_key(cfg, "seed", 0)
        return model, cfg, batch

    def test_manager_dir_resolves_to_latest_step_params(self, tmp_path):
        import jax

        from crossscore_tpu.tasks.common import load_model_params
        from crossscore_tpu.train import make_optimizer, create_train_state

        model, cfg, batch = self._model_and_cfg()
        params = model.init(jax.random.PRNGKey(0), batch["query/img"],
                            batch["reference/cross/imgs"])["params"]
        marked = jax.tree_util.tree_map(lambda x: x + 1.0, params)
        train_cfg = load_config("default")
        tx, _ = make_optimizer(train_cfg, marked, steps_per_epoch=1)
        state = create_train_state(marked, tx)
        mgr = CheckpointManager(tmp_path / "ckpt", train_time_interval_hours=None)
        mgr.save(3, state, force=True)
        state2 = state.replace(params=jax.tree_util.tree_map(lambda x: x + 1.0, marked))
        mgr.save(7, state2, force=True)  # the LATEST step must win
        mgr.wait()
        mgr.close()

        set_key(cfg, "trainer.ckpt_path_to_load", str(tmp_path / "ckpt"))
        restored = load_model_params(cfg, model, batch)
        lead_a = jax.tree_util.tree_leaves(restored)[0]
        lead_b = jax.tree_util.tree_leaves(state2.params)[0]
        np.testing.assert_allclose(np.asarray(lead_a), np.asarray(lead_b))

    def test_bare_params_dir_still_loads(self, tmp_path):
        from crossscore_tpu.tasks.common import load_model_params
        import jax

        model, cfg, batch = self._model_and_cfg()
        params = model.init(jax.random.PRNGKey(1), batch["query/img"],
                            batch["reference/cross/imgs"])["params"]
        save_params(tmp_path / "p", params)
        set_key(cfg, "trainer.ckpt_path_to_load", str(tmp_path / "p"))
        restored = load_model_params(cfg, model, batch)
        a = jax.tree_util.tree_leaves(restored)[0]
        b = jax.tree_util.tree_leaves(params)[0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_load_params_host_ignores_saved_shardings(self, tmp_path):
        """load_params_host restores to host numpy regardless of platform —
        the reverse converter must read TPU-written checkpoints on any host
        (io/torch_convert.py --reverse)."""
        from crossscore_tpu.io.checkpoint import load_params_host

        tree = {"a": jnp.arange(6.0).reshape(2, 3), "n": {"b": jnp.ones(4)}}
        save_params(tmp_path / "h", tree)
        out = load_params_host(tmp_path / "h")
        assert isinstance(out["a"], np.ndarray)
        np.testing.assert_array_equal(out["a"], np.arange(6.0).reshape(2, 3))
        np.testing.assert_array_equal(out["n"]["b"], np.ones(4))
