"""Optimizer / schedule unit tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from crossscore_tpu.confsys import load_config
from crossscore_tpu.train.optim import step_lr_schedule, make_optimizer


class TestStepLR:
    def test_epoch_interval(self):
        # step_size=2 epochs, 10 steps/epoch: decay at step 20, 40, ...
        s = step_lr_schedule(1e-3, step_size=2, gamma=0.5, steps_per_epoch=10)
        assert s(0) == 1e-3
        assert s(19) == 1e-3
        assert s(20) == pytest.approx(5e-4)
        assert s(40) == pytest.approx(2.5e-4)

    def test_step_interval(self):
        s = step_lr_schedule(1.0, step_size=5, gamma=0.1, steps_per_epoch=999, interval="step")
        assert s(4) == 1.0 and s(5) == pytest.approx(0.1)

    def test_unknown_interval_raises(self):
        with pytest.raises(ValueError):
            step_lr_schedule(1.0, 1, 0.5, 1, interval="banana")


class TestMakeOptimizer:
    def test_weight_decay_applied_to_trainable_only(self):
        cfg = load_config("default")
        params = {
            "backbone": {"w": jnp.ones((4, 4))},
            "pos_enc": {"pe": jnp.ones((2, 2, 4))},
            "head_fc1": {"kernel": jnp.ones((4, 4)), "bias": jnp.zeros(4)},
        }
        tx, schedule = make_optimizer(cfg, params, steps_per_epoch=10)
        state = tx.init(params)
        zero_grads = {
            "backbone": {"w": jnp.zeros((4, 4))},
            "pos_enc": {"pe": jnp.zeros((2, 2, 4))},
            "head_fc1": {"kernel": jnp.zeros((4, 4)), "bias": jnp.zeros(4)},
        }
        updates, _ = tx.update(zero_grads, state, params)
        # frozen leaves get exactly zero updates
        assert np.all(np.asarray(updates["backbone"]["w"]) == 0)
        assert np.all(np.asarray(updates["pos_enc"]["pe"]) == 0)
        # trainable kernel is decayed even with zero gradient (AdamW weight decay)
        assert np.all(np.asarray(updates["head_fc1"]["kernel"]) < 0)

    def test_unsupported_optimizer_raises(self):
        cfg = load_config("default", overrides=["trainer.optimizer.type=SGD"])
        with pytest.raises(NotImplementedError):
            make_optimizer(cfg, {"head_fc1": {"kernel": jnp.ones(2)}}, 1)
