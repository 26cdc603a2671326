"""io/aot.py — serialized compiled executables for fleet-warm serving.

The persistent XLA compilation cache makes restarts warm on ONE machine; the
AOT artifact ships ready-to-run executables to a serving fleet. The reference
has no analogue (every ``task/predict.py`` run re-traces + re-compiles,
reference ``task/predict.py:137-146``). Pins: (a) the serialize/deserialize
roundtrip executes and matches, (b) the daemon's save -> load flow produces
bit-identical scores with ZERO fresh compiles on the loading node, (c) the
guard rails (format / environment / configuration mismatches raise precise
errors instead of shape failures mid-request).
"""

import os
import pickle

import numpy as np
import pytest

from crossscore_tpu.data.synthetic import generate

OVERRIDES = [
    "trainer.accelerator=cpu",
    "model.tpu.compute_dtype=float32",
    "model.backbone.preset=dinov2-test",
    "data.neighbour_config.cross=2",
    "data.neighbour_config.deterministic=true",
    "this_main.resize_short_side=84",
    "this_main.serve_max_refs=2",
    "this_main.serve_port=0",
]


@pytest.fixture(scope="module")
def ws(tmp_path_factory):
    root = tmp_path_factory.mktemp("aot_ws")
    generate(root / "datadir", hw=(84, 112), scenes_per_split={"train": 1, "val": 1, "test": 1})
    old = os.getcwd()
    os.chdir(root)
    yield root
    os.chdir(old)


def _dirs(ws):
    scene = sorted((ws / "datadir" / "res_540").iterdir())[0].name
    q = f"datadir/res_540/{scene}/test/ours_1000/renders"
    r = f"datadir/res_540/{scene}/train/ours_1000/gt"
    return q, r


class TestArtifactPrimitives:
    def test_roundtrip_executes(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from crossscore_tpu.io.aot import (
            load_artifact, save_artifact, serialize_compiled,
        )

        f = jax.jit(lambda x: x * 2.0 + 1.0)
        c = f.lower(jax.ShapeDtypeStruct((4,), jnp.float32)).compile()
        save_artifact(tmp_path / "a.aot", {"k": serialize_compiled(c)})
        meta, fns = load_artifact(tmp_path / "a.aot")
        assert meta["platform"] == jax.default_backend()
        got = np.asarray(fns["k"](np.full(4, 3.0, np.float32)))
        np.testing.assert_array_equal(got, np.full(4, 7.0, np.float32))

    def test_not_an_artifact_raises(self, tmp_path):
        from crossscore_tpu.io.aot import load_artifact

        p = tmp_path / "junk.aot"
        with open(p, "wb") as f:
            pickle.dump({"something": "else"}, f)
        with pytest.raises(ValueError, match="not a crossscore-aot"):
            load_artifact(p)

    def test_environment_mismatch_raises(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from crossscore_tpu.io.aot import (
            load_artifact, save_artifact, serialize_compiled,
        )

        f = jax.jit(lambda x: x + 1.0)
        c = f.lower(jax.ShapeDtypeStruct((2,), jnp.float32)).compile()
        save_artifact(tmp_path / "a.aot", {"k": serialize_compiled(c)})
        blob = pickle.load(open(tmp_path / "a.aot", "rb"))
        blob["meta"]["platform"] = "tpu"
        pickle.dump(blob, open(tmp_path / "a.aot", "wb"))
        with pytest.raises(ValueError, match="platform.*tpu"):
            load_artifact(tmp_path / "a.aot")

    def test_expect_meta_mismatch_names_the_field(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from crossscore_tpu.io.aot import (
            load_artifact, save_artifact, serialize_compiled,
        )

        f = jax.jit(lambda x: x + 1.0)
        c = f.lower(jax.ShapeDtypeStruct((2,), jnp.float32)).compile()
        save_artifact(
            tmp_path / "a.aot",
            {"k": serialize_compiled(c)},
            meta={"token_shape": (2, 36, 16)},
        )
        with pytest.raises(ValueError, match="token_shape"):
            load_artifact(tmp_path / "a.aot", expect_meta={"token_shape": (3, 36, 16)})

    def test_params_signature_stable_and_discriminating(self):
        import jax.numpy as jnp

        from crossscore_tpu.io.aot import params_signature

        a = {"w": jnp.zeros((2, 3)), "b": {"x": jnp.ones(4, jnp.bfloat16)}}
        b = {"b": {"x": jnp.full(4, 9.0, jnp.bfloat16)}, "w": jnp.ones((2, 3))}
        assert params_signature(a) == params_signature(b)  # values/order-free
        c = {"w": jnp.zeros((2, 4)), "b": {"x": jnp.ones(4, jnp.bfloat16)}}
        assert params_signature(a) != params_signature(c)


class TestServeAOT:
    def test_save_load_bit_identical(self, ws, tmp_path):
        """Exporter node saves the artifact; a fleet node loads it and serves
        bit-identical scores. On TPU the loaded executables dispatch directly
        (zero fresh compiles); the XLA:CPU AOT loader has a machine-feature
        relocation gap for non-trivial graphs, in which case the daemon must
        DEGRADE GRACEFULLY — drop the failing executable, recompile
        in-process, and still serve the same (deterministic) scores."""
        from crossscore_tpu.tasks.common import parse_cli
        from crossscore_tpu.tasks.serve import Scorer

        q_dir, ref_dir = _dirs(ws)
        art = tmp_path / "serve.aot"
        base = OVERRIDES + [f"data.dataset.reference_dir={ref_dir}"]
        exporter = Scorer(
            parse_cli("default_predict", base + [f"this_main.serve_aot_save={art}"])
        )
        assert art.exists()
        assert exporter._aot_keys == set()  # exporter compiled its own

        node = Scorer(
            parse_cli("default_predict", base + [f"this_main.serve_aot_load={art}"])
        )
        # warm-up validated every loaded graph: keys that survived are from
        # the artifact, keys that failed were recompiled and dropped from the
        # AOT set — either way bookkeeping stays consistent
        assert node._aot_keys <= set(exporter._compiled.keys())
        assert set(node._compiled.keys()) == set(exporter._compiled.keys())
        assert node.health()["aot_shapes"] == len(node._aot_keys)

        p = os.path.join(q_dir, sorted(os.listdir(q_dir))[0])
        got = node.score_path(p)
        want = exporter.score_path(p)
        np.testing.assert_array_equal(got["score_map"], want["score_map"])
        assert got["mean_score"] == want["mean_score"]
        # serving the warmed shape did not grow the compiled set
        assert set(node._compiled.keys()) == set(exporter._compiled.keys())
        if node._aot_keys:  # TPU path: the loaded executables really served
            assert node._aot_keys == set(exporter._compiled.keys())

    def test_config_mismatch_refuses_artifact(self, ws, tmp_path):
        """An artifact exported for a different serving configuration (here a
        different reference count -> token shape) is refused with a clear
        error, not a shape failure mid-request."""
        from crossscore_tpu.tasks.common import parse_cli
        from crossscore_tpu.tasks.serve import Scorer

        _, ref_dir = _dirs(ws)
        art = tmp_path / "serve.aot"
        base = OVERRIDES + [f"data.dataset.reference_dir={ref_dir}"]
        Scorer(parse_cli("default_predict", base + [f"this_main.serve_aot_save={art}"]))
        with pytest.raises(ValueError, match="token_shape"):
            Scorer(
                parse_cli(
                    "default_predict",
                    [o for o in base if "serve_max_refs" not in o]
                    + ["this_main.serve_max_refs=1", f"this_main.serve_aot_load={art}"],
                )
            )

    def test_warm_shapes_precompile_and_validate(self, ws, tmp_path):
        """serve_warm_shapes pre-compiles extra query shapes at startup (so a
        fleet never pays a mid-request compile) and rejects shapes that are
        not %14-trimmed."""
        from crossscore_tpu.tasks.common import parse_cli
        from crossscore_tpu.tasks.serve import Scorer

        _, ref_dir = _dirs(ws)
        base = OVERRIDES + [f"data.dataset.reference_dir={ref_dir}"]
        s = Scorer(
            parse_cli(
                "default_predict", base + ["this_main.serve_warm_shapes=[56x70]"]
            )
        )
        assert (84, 112, 1) in s.compiled_shapes  # reference shape
        assert (56, 70, 1) in s.compiled_shapes  # declared camera shape

        with pytest.raises(ValueError, match="%14-trimmed"):
            Scorer(
                parse_cli(
                    "default_predict", base + ["this_main.serve_warm_shapes=[50x70]"]
                )
            )

    def test_warmup_only_mode_exits_after_export(self, ws, tmp_path, capsys):
        """serve_warmup_only=true builds + warms + saves, then returns
        without serving HTTP — the fleet exporter entry point."""
        from crossscore_tpu.tasks.common import parse_cli
        from crossscore_tpu.tasks.serve import serve

        _, ref_dir = _dirs(ws)
        art = tmp_path / "serve.aot"
        cfg = parse_cli(
            "default_predict",
            OVERRIDES
            + [
                f"data.dataset.reference_dir={ref_dir}",
                f"this_main.serve_aot_save={art}",
                "this_main.serve_warmup_only=true",
            ],
        )
        serve(cfg)  # returns instead of serve_forever
        assert art.exists()
        assert "warmup-only done" in capsys.readouterr().out

    def test_load_then_save_reexports_the_union(self, ws, tmp_path):
        """aot_load + aot_save composes: a node that loads an artifact and
        warms one NEW shape exports the union — loaded graphs re-export their
        original raw entries (deserialized executables can't re-serialize),
        fresh compiles serialize normally."""
        from crossscore_tpu.io.aot import load_artifact
        from crossscore_tpu.tasks.common import parse_cli
        from crossscore_tpu.tasks.serve import Scorer

        _, ref_dir = _dirs(ws)
        a1, a2 = tmp_path / "v1.aot", tmp_path / "v2.aot"
        base = OVERRIDES + [f"data.dataset.reference_dir={ref_dir}"]
        Scorer(parse_cli("default_predict", base + [f"this_main.serve_aot_save={a1}"]))

        extender = Scorer(
            parse_cli(
                "default_predict",
                base
                + [
                    f"this_main.serve_aot_load={a1}",
                    "this_main.serve_warm_shapes=[56x70]",
                    f"this_main.serve_aot_save={a2}",
                ],
            )
        )
        assert (56, 70, 1) in extender._compiled
        meta1, fns1 = load_artifact(a1)
        meta2, fns2 = load_artifact(a2)
        assert set(fns1.keys()) < set(fns2.keys())  # strict superset
        assert "56x70xb1" in fns2
        assert meta2["token_shape"] == meta1["token_shape"]

        # a third node starts from the extended artifact alone and serves
        # both shapes without growing its compiled set
        node = Scorer(
            parse_cli(
                "default_predict",
                base
                + [
                    f"this_main.serve_aot_load={a2}",
                    "this_main.serve_warm_shapes=[56x70]",
                ],
            )
        )
        before = set(node._compiled.keys())
        assert before == {(84, 112, 1), (56, 70, 1)}
        node._run_device(np.zeros((1, 56, 70, 3), np.float32), want_map=False)
        assert set(node._compiled.keys()) == before

    def test_transposed_ref_grid_is_refused(self, ws, tmp_path):
        """token_shape alone cannot distinguish transposed reference aspects
        (37x49 and 49x37 both give 1813 patches); the artifact pins the grid
        and a mismatch is refused at startup, not served silently wrong."""
        import pickle

        from crossscore_tpu.tasks.common import parse_cli
        from crossscore_tpu.tasks.serve import Scorer

        _, ref_dir = _dirs(ws)
        art = tmp_path / "serve.aot"
        base = OVERRIDES + [f"data.dataset.reference_dir={ref_dir}"]
        Scorer(parse_cli("default_predict", base + [f"this_main.serve_aot_save={art}"]))
        blob = pickle.load(open(art, "rb"))
        gh, gw = blob["meta"]["ref_grid"]
        blob["meta"]["ref_grid"] = (gw, gh)  # transposed exporter aspect
        pickle.dump(blob, open(art, "wb"))
        with pytest.raises(ValueError, match="ref_grid"):
            Scorer(parse_cli("default_predict", base + [f"this_main.serve_aot_load={art}"]))

    def test_insufficient_devices_named_error(self, tmp_path):
        """An executable compiled for more devices than this process has is
        refused with a precise message (not an XLA crash mid-startup)."""
        import jax
        import jax.numpy as jnp

        from crossscore_tpu.io.aot import load_artifact, save_artifact, serialize_compiled

        f = jax.jit(lambda x: x + 1.0)
        c = f.lower(jax.ShapeDtypeStruct((2,), jnp.float32)).compile()
        entry = serialize_compiled(c)
        entry["n_devices"] = 99
        save_artifact(tmp_path / "a.aot", {"k": entry})
        with pytest.raises(ValueError, match="99 devices"):
            load_artifact(tmp_path / "a.aot")

    def test_describe_inventory_without_loading(self, ws, tmp_path, capsys):
        """The inspection CLI reads meta + entry sizes without deserializing
        executables (works cross-platform for fleet ops)."""
        import json

        from crossscore_tpu.io.aot import describe, main as aot_main
        from crossscore_tpu.tasks.common import parse_cli
        from crossscore_tpu.tasks.serve import Scorer

        _, ref_dir = _dirs(ws)
        art = tmp_path / "serve.aot"
        Scorer(parse_cli(
            "default_predict",
            OVERRIDES + [f"data.dataset.reference_dir={ref_dir}",
                         f"this_main.serve_aot_save={art}"],
        ))
        d = describe(art)
        assert tuple(d["meta"]["token_shape"]) == (2, 48, 64)
        assert tuple(d["meta"]["ref_grid"]) == (6, 8)
        assert "params_signature" not in d["meta"] and d["params"] > 50
        assert all(e["payload_bytes"] > 0 for e in d["entries"].values())
        capsys.readouterr()  # drain the Scorer's startup prints
        aot_main([str(art)])
        assert json.loads(capsys.readouterr().out)["entries"]
