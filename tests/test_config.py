"""Tests for the hydra-style config composition system."""

import pytest

from crossscore_tpu.confsys import load_config, Config, apply_overrides


class TestLoadConfig:
    def test_default_composes_groups(self):
        cfg = load_config("default")
        assert cfg.model.patch_size == 14
        assert cfg.data.neighbour_config.cross == 5
        assert cfg.trainer.optimizer.lr == 5e-4
        assert cfg.data.loader.train.batch_size == 24

    def test_predict_config(self):
        cfg = load_config("default_predict")
        assert cfg.data.dataset.query_dir is None
        assert cfg.logger.predict.write.flag.score_map_prediction is True
        assert cfg.this_main.resize_short_side == 518

    def test_overrides_like_predict_sh(self):
        """The predict.sh override set must port verbatim."""
        cfg = load_config(
            "default_predict",
            overrides=[
                "trainer.devices=[0]",
                "trainer.ckpt_path_to_load=ckpt/CrossScore-v1.0.0.ckpt",
                "data.dataset.query_dir=/tmp/q",
                "data.dataset.reference_dir=/tmp/r",
                "alias=s00076",
            ],
        )
        assert cfg.trainer.devices == [0]
        assert cfg.alias == "s00076"
        assert cfg.data.dataset.query_dir == "/tmp/q"

    def test_data_group_override(self):
        cfg = load_config("default", overrides=["data.neighbour_config.cross=8"])
        assert cfg.data.neighbour_config.cross == 8

    def test_unknown_key_raises(self):
        with pytest.raises(KeyError):
            load_config("default", overrides=["model.not_a_key=1"])

    def test_plus_adds_new_key(self):
        cfg = load_config("default", overrides=["+model.extra.depth=3"])
        assert cfg.model.extra.depth == 3

    def test_value_parsing(self):
        cfg = Config.from_nested({"a": {"b": 1, "s": "x", "n": None, "f": 1.0, "l": [1]}})
        apply_overrides(cfg, ["a.b=2", "a.s=hello", "a.n=null", "a.f=2.5e-3", "a.l=[1,2,3]"])
        assert cfg.a.b == 2 and cfg.a.s == "hello" and cfg.a.n is None
        assert cfg.a.f == 2.5e-3 and cfg.a.l == [1, 2, 3]

    def test_select(self):
        cfg = load_config("default")
        assert cfg.select("model.patch_size") == 14
        assert cfg.select("no.such.key", -1) == -1

    def test_group_selection_from_cli(self):
        """Hydra-style `data=mip360` swaps the whole data group."""
        cfg = load_config("default", overrides=["data=mip360", "data.loader.train.batch_size=4"])
        assert cfg.data.dataset.resolution == "res_400"
        assert cfg.data.loader.train.batch_size == 4  # later dotted override wins

    def test_group_selection_unknown_choice_raises(self):
        with pytest.raises(FileNotFoundError):
            load_config("default", overrides=["data=not_a_preset."])


def test_tristate_normalises_yaml_bool_overrides():
    """CLI `key=on` / `key=off` parse as YAML booleans; every on|off|auto
    knob must compare through tasks.common.tristate (regression:
    `shape_buckets=off` / `ref_token_cache=off` silently meant ON)."""
    from crossscore_tpu.confsys import parse_value
    from crossscore_tpu.tasks.common import tristate

    assert parse_value("off") is False and parse_value("on") is True
    assert tristate(parse_value("off")) == "off"
    assert tristate(parse_value("on")) == "on"
    assert tristate(parse_value("auto")) == "auto"
    assert tristate("AUTO") == "auto"
