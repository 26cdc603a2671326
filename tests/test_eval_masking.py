"""Exactly-once evaluation semantics (round-2 fixes).

The reference evaluates every item exactly once: Lightning's
DistributedSampler pads the index space (reference ``task/train.py:111``) and
no padded duplicates enter the metrics. Here: ``_valid`` masks loader padding
out of the jitted eval metrics, and the multi-host index shard pads by
wrap-around with duplicates confined to the final batch's masked suffix.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from crossscore_tpu.models import CrossScoreNet, CrossScoreConfig, ViTConfig
from crossscore_tpu.train import make_eval_step
from crossscore_tpu.data.loader import Loader
from crossscore_tpu.ops.metrics import correlation, masked_correlation

VIT = ViTConfig(hidden_size=64, num_layers=1, num_heads=4, patch_size=14, image_size=56)
MCFG = CrossScoreConfig(backbone=VIT, pe_h=6, pe_w=6, decoder_heads=4, decoder_layers=1)


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


class TestMaskedEvalMetrics:
    def test_padded_batch_metrics_match_unpadded(self, model_and_params):
        """Metrics over a padded 4-item batch (_valid=3, last item repeated)
        must equal metrics over the clean 3-item batch bit-for-bit."""
        model, params = model_and_params
        rng = np.random.default_rng(1)
        clean = _batch(rng, 3)
        padded = {
            k: jnp.concatenate([v, v[-1:]], axis=0) for k, v in clean.items()
        }
        padded["_valid"] = jnp.asarray(3, jnp.int32)

        eval_step = jax.jit(make_eval_step(model))
        _, m_clean = eval_step(params, clean)
        _, m_padded = eval_step(params, padded)
        assert float(m_clean["loss"]) == pytest.approx(float(m_padded["loss"]), rel=1e-6)
        assert float(m_clean["correlation_cross"]) == pytest.approx(
            float(m_padded["correlation_cross"]), rel=1e-5
        )

    def test_unmasked_padded_batch_differs(self, model_and_params):
        """Sanity: without _valid the padded duplicate DOES bias the loss
        (this was the round-1 behaviour the mask fixes)."""
        model, params = model_and_params
        rng = np.random.default_rng(2)
        clean = _batch(rng, 3)
        padded = {k: jnp.concatenate([v, v[-1:]], axis=0) for k, v in clean.items()}
        eval_step = jax.jit(make_eval_step(model))
        _, m_clean = eval_step(params, clean)
        _, m_padded = eval_step(params, padded)
        assert float(m_clean["loss"]) != pytest.approx(float(m_padded["loss"]), rel=1e-9)


class TestMaskedCorrelation:
    def test_full_weights_equals_plain(self):
        rng = np.random.default_rng(0)
        a = rng.standard_normal((4, 9, 9)).astype(np.float32)
        b = (0.5 * a + 0.1 * rng.standard_normal(a.shape)).astype(np.float32)
        plain = float(correlation(jnp.asarray(a), jnp.asarray(b)))
        masked = float(masked_correlation(jnp.asarray(a), jnp.asarray(b), jnp.ones((4, 1, 1))))
        assert plain == pytest.approx(masked, rel=1e-6)

    def test_mask_excludes_rows(self):
        rng = np.random.default_rng(0)
        a = rng.standard_normal((4, 9, 9)).astype(np.float32)
        b = (0.5 * a + 0.1 * rng.standard_normal(a.shape)).astype(np.float32)
        w = jnp.asarray([1.0, 1.0, 1.0, 0.0]).reshape(4, 1, 1)
        masked = float(masked_correlation(jnp.asarray(a), jnp.asarray(b), w))
        sub = float(correlation(jnp.asarray(a[:3]), jnp.asarray(b[:3])))
        assert masked == pytest.approx(sub, rel=1e-6)


class _FakeDataset:
    """Minimal dataset: item i is a single-scalar array with value i."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def get_item(self, i, rng):
        return {"x": np.asarray([float(i)], np.float32)}


class TestShardedExactlyOnce:
    @pytest.mark.parametrize("n,shards,bs", [(11, 3, 2), (10, 3, 4), (7, 2, 3), (8, 2, 2)])
    def test_union_of_valid_prefixes_is_exactly_once(self, n, shards, bs):
        ds = _FakeDataset(n)
        seen = []
        lengths = set()
        for shard in range(shards):
            loader = Loader(
                ds, batch_size=bs, shuffle=False, num_workers=1, seed=0,
                shard_index=shard, num_shards=shards,
            )
            count = 0
            for b in loader.epoch(0):
                valid = int(b["_valid"])
                seen.extend(b["x"][:valid, 0].tolist())
                count += 1
            lengths.add(count)
        assert len(lengths) == 1, "all shards must see the same batch count"
        assert sorted(seen) == list(map(float, range(n)))

    def test_shuffled_epoch_exactly_once(self):
        ds = _FakeDataset(13)
        seen = []
        for shard in range(4):
            loader = Loader(
                ds, batch_size=3, shuffle=True, num_workers=1, seed=5,
                shard_index=shard, num_shards=4,
            )
            for b in loader.epoch(2):
                seen.extend(b["x"][: int(b["_valid"]), 0].tolist())
        assert sorted(seen) == list(map(float, range(13)))


class TestLoaderStartBatch:
    def test_start_batch_skips_exact_prefix(self):
        ds = _FakeDataset(10)
        loader = Loader(ds, batch_size=3, shuffle=True, num_workers=1, seed=7)
        full = [b["x"][:, 0].tolist() for b in loader.epoch(1)]
        skipped = [b["x"][:, 0].tolist() for b in loader.epoch(1, start_batch=2)]
        assert skipped == full[2:]


class TestAllProcessWeightedMean:
    def test_single_process_weighted_mean(self):
        from crossscore_tpu.tasks.common import all_process_weighted_mean

        losses = [1.0, 2.0, 4.0]
        corrs = [0.5, 0.25, 1.0]
        weights = [4, 4, 2]
        got = all_process_weighted_mean([losses, corrs], weights)
        assert got[0] == pytest.approx((4 + 8 + 8) / 10)
        assert got[1] == pytest.approx((2 + 1 + 2) / 10)


class TestValidMaskVector:
    def test_row_mask_matches_subset_metrics(self, model_and_params):
        """The per-row ``_valid_mask`` form (multi-host global batches, where
        valid rows are a prefix per PROCESS block, not a global prefix) must
        reproduce the metrics of the clean subset — including a NON-prefix
        pattern no scalar count could express."""
        model, params = model_and_params
        rng = np.random.default_rng(5)
        full = _batch(rng, 4)
        keep = np.asarray([1.0, 0.0, 1.0, 1.0], np.float32)  # row 1 is padding
        clean = {k: v[np.asarray(keep, bool)] for k, v in full.items()}
        masked = dict(full)
        masked["_valid_mask"] = jnp.asarray(keep)

        eval_step = jax.jit(make_eval_step(model))
        _, m_clean = eval_step(params, clean)
        _, m_masked = eval_step(params, masked)
        assert float(m_clean["loss"]) == pytest.approx(float(m_masked["loss"]), rel=1e-5)
        assert float(m_clean["correlation_cross"]) == pytest.approx(
            float(m_masked["correlation_cross"]), rel=1e-4
        )

    def test_weights_use_model_patch_size(self):
        """_weights floors the _valid_hw extent to the MODEL's patch size
        (regression: a hardcoded 14 skewed masks for patch_size != 14)."""
        from crossscore_tpu.train.step import _weights

        batch = {"_valid_hw": jnp.asarray([20, 33], jnp.int32)}
        w14 = _weights(batch, (1, 42, 42), patch=14)
        w16 = _weights(batch, (1, 42, 42), patch=16)
        assert float(w14[0, :, 0].sum()) == 14  # 20//14*14
        assert float(w14[0, 0, :].sum()) == 28  # 33//14*14
        assert float(w16[0, :, 0].sum()) == 16  # 20//16*16
        assert float(w16[0, 0, :].sum()) == 32  # 33//16*16
