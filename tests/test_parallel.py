"""Multi-device SPMD tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from crossscore_tpu.models import CrossScoreNet, CrossScoreConfig, ViTConfig
from crossscore_tpu.parallel import make_mesh, param_shardings, batch_sharding, shard_batch
from crossscore_tpu.train import make_optimizer, make_train_step, make_eval_step, create_train_state
from crossscore_tpu.confsys import load_config

VIT = ViTConfig(hidden_size=64, num_layers=2, num_heads=4, patch_size=14, image_size=56)
MCFG = CrossScoreConfig(backbone=VIT, pe_h=6, pe_w=6, decoder_heads=4)


def _batch(rng, b, hw=56, k=2):
    return {
        "query/img": jnp.asarray(rng.standard_normal((b, hw, hw, 3)).astype(np.float32)),
        "reference/cross/imgs": jnp.asarray(
            rng.standard_normal((b, k, hw, hw, 3)).astype(np.float32)
        ),
        "query/score_map": jnp.asarray(rng.random((b, hw, hw)).astype(np.float32)),
    }


@pytest.fixture(scope="module")
def model_and_params():
    model = CrossScoreNet(MCFG)
    rng = np.random.default_rng(0)
    b = _batch(rng, 1)
    params = model.init(jax.random.PRNGKey(0), b["query/img"], b["reference/cross/imgs"])[
        "params"
    ]
    return model, params


class TestMesh:
    def test_8_devices_available(self):
        assert len(jax.devices()) == 8

    def test_1d_mesh(self):
        mesh = make_mesh()
        assert mesh.axis_names == ("data",)
        assert mesh.devices.shape == (8,)

    def test_2d_mesh(self):
        mesh = make_mesh(8, model_parallel=2)
        assert mesh.axis_names == ("data", "model")
        assert mesh.devices.shape == (4, 2)

    def test_model_parallel_exceeding_devices_raises(self):
        """model_parallel > devices must fail loudly here (regression: the
        batch clamp computed data_par=0 and built an empty mesh that died
        later with an opaque shape error)."""
        with pytest.raises(ValueError, match="exceeds"):
            make_mesh(4, model_parallel=8, batch_size=16)

    def test_oversized_device_request_truncates(self):
        mesh = make_mesh(64)  # only 8 exist
        assert mesh.devices.shape == (8,)

    @pytest.mark.parametrize(
        "n_proc,batch,mp,expect_shape",
        [
            (2, 2, 1, (4,)),    # clamp keeps 2 devices on EACH host
            (2, 3, 1, (6,)),    # 3 per host
            (2, 4, 1, (8,)),    # exact fit
            (2, 8, 1, (8,)),    # per-process batch > per-host devices
            (4, 2, 1, (8,)),
            (4, 1, 1, (4,)),    # down to 1 device per host
            (2, 2, 2, (4, 2)),  # TP x per-host data par 2
            (2, 1, 2, (2, 2)),  # TP x per-host data par clamped to 1
        ],
    )
    def test_multihost_matrix(self, monkeypatch, n_proc, batch, mp, expect_shape):
        """Multi-host make_mesh semantics (r4 regression, VERDICT #1): equal
        per-process device counts, per-process rows divide over that
        process's mesh devices, never a raise for a feasible topology."""
        monkeypatch.setattr(jax, "process_count", lambda: n_proc)
        mesh = make_mesh(model_parallel=mp, batch_size=batch)
        assert mesh.devices.shape == expect_shape
        data_par = expect_shape[0]
        assert data_par % n_proc == 0            # equal per-host share
        assert (batch * n_proc) % data_par == 0  # global batch divides
        assert batch % (data_par // n_proc) == 0  # per-process rows divide

    def test_multihost_selects_equal_devices_per_process_block(self, monkeypatch):
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        mesh = make_mesh(batch_size=2)  # 2 emulated hosts x 4 devices -> keep 2 each
        ids = [d.id for d in mesh.devices.reshape(-1)]
        assert ids == [0, 1, 4, 5]

    def test_device_groups_by_process_index_interleaved(self):
        from crossscore_tpu.parallel.mesh import _device_process_groups

        class FakeDev:
            def __init__(self, i, pi):
                self.id, self.process_index = i, pi

        devs = [FakeDev(i, i % 2) for i in range(8)]  # interleaved order
        g = _device_process_groups(devs, 2)
        assert [d.id for d in g[0]] == [0, 2, 4, 6]
        assert [d.id for d in g[1]] == [1, 3, 5, 7]
        # emulated topology (every device local): contiguous equal chunks
        devs = [FakeDev(i, 0) for i in range(8)]
        g = _device_process_groups(devs, 2)
        assert [d.id for d in g[0]] == [0, 1, 2, 3]
        assert [d.id for d in g[1]] == [4, 5, 6, 7]

    def test_uneven_real_multihost_groups_raise(self):
        """REAL multi-host topologies (distinct process_index values) with
        uneven per-host device counts must refuse — position-chunking would
        hand one process another host's devices and fail far away inside
        make_array_from_process_local_data."""
        from crossscore_tpu.parallel.mesh import _device_process_groups

        class FakeDev:
            def __init__(self, i, pi):
                self.id, self.process_index = i, pi

        devs = [FakeDev(i, 0) for i in range(4)] + [FakeDev(4 + i, 1) for i in range(2)]
        with pytest.raises(ValueError, match="uneven"):
            _device_process_groups(devs, 2)

    def test_device_cap_below_process_count_raises(self, monkeypatch):
        monkeypatch.setattr(jax, "process_count", lambda: 4)
        with pytest.raises(ValueError, match="below the"):
            make_mesh(2, batch_size=8)

    def test_tp_specs(self, model_and_params):
        _, params = model_and_params
        mesh = make_mesh(8, model_parallel=2)
        sh = param_shardings(params, mesh)
        assert sh["decoder"]["layer_0"]["cross_attn"]["q_proj"]["kernel"].spec == P(None, "model")
        assert sh["decoder"]["layer_0"]["cross_attn"]["out_proj"]["kernel"].spec == P("model", None)
        assert sh["backbone"]["block_0"]["attn"]["qkv"]["kernel"].spec == P(None, "model")
        assert sh["backbone"]["block_0"]["fc2"]["kernel"].spec == P("model", None)
        # biases / LN replicated
        assert sh["decoder"]["layer_0"]["norm1"]["scale"].spec == P()


class TestSPMDTrainStep:
    def test_dp_step_matches_single_device(self, model_and_params):
        """Data-parallel sharded step == unsharded step (same numerics)."""
        model, params = model_and_params
        cfg = load_config("default")
        tx, _ = make_optimizer(cfg, params, steps_per_epoch=10)
        rng = np.random.default_rng(1)
        batch = _batch(rng, 8)

        step = make_train_step(model, tx)

        # single-device reference
        state0 = create_train_state(params, tx)
        ref_state, ref_metrics = jax.jit(step)(state0, batch)

        # sharded
        mesh = make_mesh()
        state1 = create_train_state(params, tx)
        state1 = jax.device_put(state1, NamedSharding(mesh, P()))
        sbatch = shard_batch(batch, mesh)
        new_state, metrics = jax.jit(step)(state1, sbatch)

        np.testing.assert_allclose(
            float(metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-6
        )
        a = jax.tree_util.tree_leaves(ref_state.params)
        b = jax.tree_util.tree_leaves(new_state.params)
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-5)

    def test_frozen_params_not_updated(self, model_and_params):
        model, params = model_and_params
        cfg = load_config("default")
        tx, _ = make_optimizer(cfg, params, steps_per_epoch=10)
        state = create_train_state(params, tx)
        batch = _batch(np.random.default_rng(2), 4)
        new_state, _ = jax.jit(make_train_step(model, tx))(state, batch)

        # backbone + PE unchanged
        for key in ["backbone", "pos_enc"]:
            before = jax.tree_util.tree_leaves(params[key])
            after = jax.tree_util.tree_leaves(new_state.params[key])
            for x, y in zip(before, after):
                np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        # decoder/head did change
        assert not np.allclose(
            np.asarray(params["head_fc2"]["kernel"]),
            np.asarray(new_state.params["head_fc2"]["kernel"]),
        )

    def test_tp_step_matches_dp(self, model_and_params):
        """2-D (data x model) TP-sharded step reproduces the replicated step."""
        model, params = model_and_params
        cfg = load_config("default")
        tx, _ = make_optimizer(cfg, params, steps_per_epoch=10)
        batch = _batch(np.random.default_rng(3), 4)

        step = make_train_step(model, tx)
        ref_state, ref_metrics = jax.jit(step)(create_train_state(params, tx), batch)

        mesh = make_mesh(8, model_parallel=2)
        p_shard = param_shardings(params, mesh)
        sparams = jax.device_put(params, p_shard)
        state = create_train_state(sparams, tx)
        sbatch = shard_batch(batch, mesh)
        new_state, metrics = jax.jit(step)(state, sbatch)

        np.testing.assert_allclose(float(metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(new_state.params["head_fc2"]["kernel"]),
            np.asarray(ref_state.params["head_fc2"]["kernel"]),
            atol=1e-5,
        )

    def test_tp_step_matches_dp_vitl_dims(self):
        """TP=2 at ViT-L head geometry — hidden 1024 / 16 heads (hd 64) in the
        backbone, d_model 1024 / 8 heads in the decoder — so the Megatron
        split is exercised at the representative head counts of BASELINE
        config #5 (layers truncated to 2 and a 4x4 grid for CPU speed)."""
        vit = ViTConfig(hidden_size=1024, num_layers=2, num_heads=16,
                        patch_size=14, image_size=56)
        mcfg = CrossScoreConfig(backbone=vit, pe_h=6, pe_w=6, decoder_heads=8)
        model = CrossScoreNet(mcfg)
        b1 = _batch(np.random.default_rng(7), 1)
        params = model.init(
            jax.random.PRNGKey(0), b1["query/img"], b1["reference/cross/imgs"]
        )["params"]
        cfg = load_config("default")
        tx, _ = make_optimizer(cfg, params, steps_per_epoch=10)
        batch = _batch(np.random.default_rng(8), 4)

        step = make_train_step(model, tx)
        ref_state, ref_metrics = jax.jit(step)(create_train_state(params, tx), batch)

        mesh = make_mesh(8, model_parallel=2)
        sh = param_shardings(params, mesh)
        # the split dims must actually shard at these widths
        assert sh["backbone"]["block_0"]["attn"]["qkv"]["kernel"].spec == P(None, "model")
        sparams = jax.device_put(params, sh)
        state = create_train_state(sparams, tx)
        new_state, metrics = jax.jit(step)(state, shard_batch(batch, mesh))

        np.testing.assert_allclose(
            float(metrics["loss"]), float(ref_metrics["loss"]), rtol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(new_state.params["head_fc2"]["kernel"]),
            np.asarray(ref_state.params["head_fc2"]["kernel"]),
            atol=2e-5,
        )

    def test_tp_step_matches_dp_pallas_kernel(self, model_and_params):
        """TP with the PALLAS kernel (attention_impl=tp:model): the flash
        kernel runs under shard_map with heads sharded over the model axis —
        GSPMD cannot partition pallas_call, so this wrapper is the only way to
        keep the fused kernel under tensor parallelism (round-1 known gap)."""
        import dataclasses

        _, params = model_and_params
        model_ref = CrossScoreNet(MCFG)
        model_tp = CrossScoreNet(dataclasses.replace(MCFG, attention_impl="tp:model"))
        cfg = load_config("default")
        tx, _ = make_optimizer(cfg, params, steps_per_epoch=10)
        batch = _batch(np.random.default_rng(3), 4)

        ref_state, ref_metrics = jax.jit(make_train_step(model_ref, tx))(
            create_train_state(params, tx), batch
        )

        mesh = make_mesh(8, model_parallel=2)  # registers the mesh for tp:
        p_shard = param_shardings(params, mesh)
        sparams = jax.device_put(params, p_shard)
        state = create_train_state(sparams, tx)
        sbatch = shard_batch(batch, mesh)
        new_state, metrics = jax.jit(make_train_step(model_tp, tx))(state, sbatch)

        np.testing.assert_allclose(
            float(metrics["loss"]), float(ref_metrics["loss"]), rtol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(new_state.params["head_fc2"]["kernel"]),
            np.asarray(ref_state.params["head_fc2"]["kernel"]),
            atol=2e-5,
        )


class TestEvalStep:
    def test_eval_metrics(self, model_and_params):
        model, params = model_and_params
        batch = _batch(np.random.default_rng(4), 2)
        pred, metrics = jax.jit(make_eval_step(model))(params, batch)
        assert pred.shape == (2, 56, 56)
        assert np.isfinite(float(metrics["loss"]))
        assert -1.0 <= float(metrics["correlation_cross"]) <= 1.0


class TestGraftEntry:
    def test_dryrun_multichip(self):
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).parents[1]))
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)

    def test_dryrun_odd_devices(self):
        import __graft_entry__ as ge

        ge.dryrun_multichip(2)


class TestConvergence:
    def test_overfit_single_batch(self, model_and_params):
        """40 masked-AdamW steps on one batch must cut the loss sharply —
        guards the whole optimisation path (grads, masking, schedule)."""
        model, params = model_and_params
        cfg = load_config("default", overrides=["trainer.optimizer.lr=1e-3"])
        tx, _ = make_optimizer(cfg, params, steps_per_epoch=1000)
        state = create_train_state(params, tx)
        batch = _batch(np.random.default_rng(9), 2)
        step = jax.jit(make_train_step(model, tx), donate_argnums=(0,))

        first = None
        for i in range(40):
            state, metrics = step(state, batch)
            if i == 0:
                first = float(metrics["loss"])
        last = float(metrics["loss"])
        # noise targets bound the reachable loss; a 20% drop in 40 steps
        # guards the mechanism (grads/masking/schedule), observed ~27%
        assert last < first * 0.8, f"loss {first:.4f} -> {last:.4f} did not drop 20%"
