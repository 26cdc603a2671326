"""tasks/serve.py — the persistent scoring daemon.

Pins (a) the exactness contract vs tasks.predict (resized + %14-trimmed
inputs produce the same score maps the batch predict path writes), and
(b) the HTTP surface end-to-end on an ephemeral port.
"""

import json
import os
import threading
import urllib.request

import numpy as np
import pytest

from crossscore_tpu.data.synthetic import generate

OVERRIDES = [
    "trainer.accelerator=cpu",
    "model.tpu.compute_dtype=float32",
    "model.backbone.preset=dinov2-test",
    # deterministic first-K sampling so predict uses the same (sorted) first
    # two references the daemon warms
    "data.neighbour_config.cross=2",
    "data.neighbour_config.deterministic=true",
    "this_main.resize_short_side=84",
    "this_main.serve_max_refs=2",
    "this_main.serve_port=0",
]


@pytest.fixture(scope="module")
def ws(tmp_path_factory):
    root = tmp_path_factory.mktemp("serve_ws")
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


@pytest.fixture(scope="module")
def server(ws):
    from crossscore_tpu.tasks.common import parse_cli
    from crossscore_tpu.tasks.serve import make_server

    _, ref_dir = _dirs(ws)
    cfg = parse_cli(
        "default_predict", OVERRIDES + [f"data.dataset.reference_dir={ref_dir}"]
    )
    srv, scorer = make_server(cfg)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv, scorer
    srv.shutdown()


def _url(srv, path):
    host, port = srv.server_address[:2]
    return f"http://{host}:{port}{path}"


class TestScorer:
    def test_matches_predict_task(self, ws, server):
        """The daemon's per-frame mean equals what tasks.predict's summariser
        CSV reports for the same query/reference dirs (the batch path and the
        serving path are the same model + preprocessing)."""
        import pandas as pd

        from crossscore_tpu.tasks.predict import main

        _, scorer = server
        q_dir, ref_dir = _dirs(ws)
        out_dir = main(
            OVERRIDES
            + [
                f"data.dataset.query_dir={q_dir}",
                f"data.dataset.reference_dir={ref_dir}",
                "data.loader.validation.batch_size=1",
                "data.loader.validation.num_workers=0",
                "logger.predict.write.config.vis_img_every_n_steps=-1",
                "logger.predict.write.flag.batch=false",
                "alias=serve_parity",
            ]
        )
        csv = list((out_dir / "score_summary").rglob("*.csv"))[0]
        df = pd.read_csv(csv)

        frames = sorted(os.listdir(q_dir))
        assert len(df) == len(frames)
        # the summariser strips the "frame_" prefix from image_name; both the
        # CSV (shuffle=False loader) and the listing are in sorted order
        df = df.sort_values("image_name")
        for fname, name, want in zip(frames, df["image_name"], df["pred_ssim_0_1"]):
            assert fname.endswith(name)
            res = scorer.score_path(os.path.join(q_dir, fname))
            # the CSV rounds to 4 decimals (float_format="%.4f", summariser)
            assert res["mean_score"] == pytest.approx(float(want), abs=5.1e-5)

    def test_score_map_shape_and_range(self, ws, server):
        _, scorer = server
        q_dir, _ = _dirs(ws)
        res = scorer.score_path(os.path.join(q_dir, sorted(os.listdir(q_dir))[0]))
        assert res["score_map"].shape == (res["height"], res["width"]) == (84, 112)
        assert res["score_map"].dtype == np.float32
        assert 0.0 <= res["mean_score"] <= 1.0

    def test_bf16_upload_modes(self, ws):
        """Default bf16 daemon uploads float32 queries — bit-identical to the
        f32-fed cached step (XLA elides in-graph input downcasts, so the
        f32-fed graph is the exactness reference). serve_upload_cast=true
        halves H2D and must stay within bf16-input-rounding of it."""
        from crossscore_tpu.io.images import image_read
        from crossscore_tpu.models import CrossScoreConfig, CrossScoreNet
        from crossscore_tpu.tasks.common import parse_cli
        from crossscore_tpu.tasks.serve import Scorer
        from crossscore_tpu.train.step import make_predict_step_cached

        q_dir, ref_dir = _dirs(ws)
        bf16_overrides = [o for o in OVERRIDES if "compute_dtype" not in o] + [
            f"data.dataset.reference_dir={ref_dir}"
        ]
        cfg = parse_cli("default_predict", bf16_overrides)
        assert cfg.model.tpu.compute_dtype == "bfloat16"  # the default
        scorer = Scorer(cfg)
        assert scorer._in_dtype == np.float32  # exact by default

        p = os.path.join(q_dir, sorted(os.listdir(q_dir))[0])
        got = scorer.score_path(p)["score_map"]

        import jax

        model = CrossScoreNet(CrossScoreConfig.from_config(cfg))
        q = scorer._preprocess(image_read(p))[None].astype(np.float32)
        # the JITTED cached step is exactly what tasks.predict dispatches
        want = np.asarray(
            jax.jit(make_predict_step_cached(model))(
                scorer.params, q, scorer.tokens
            )["score_map_ref_cross"][0],
            np.float32,
        )
        np.testing.assert_array_equal(got, want)

        cast_scorer = Scorer(
            parse_cli(
                "default_predict", bf16_overrides + ["this_main.serve_upload_cast=true"]
            )
        )
        got_cast = cast_scorer.score_path(p)["score_map"]
        assert got_cast.shape == want.shape
        np.testing.assert_allclose(got_cast, want, atol=5e-3)

    def test_mixed_aspect_query(self, ws, server):
        """A query whose post-resize shape differs from the references' must
        serve against the one cached token set: the reference PE interpolates
        to the REFERENCE grid (ref_grid), the query PE to its own — the
        daemon's 'new aspect ratio pays one compile' promise. Pinned against
        the jitted cached step with an explicit ref_grid."""
        import jax

        from crossscore_tpu.io.images import image_read
        from crossscore_tpu.train.step import make_predict_step_cached

        _, scorer = server
        q_dir, _ = _dirs(ws)
        img = image_read(os.path.join(q_dir, sorted(os.listdir(q_dir))[0]))
        tall = img[:, :60]  # 84x60 -> resize short 60->84: 117x84 -> trim 112x84
        res = scorer.score(tall)
        assert (res["height"], res["width"]) == (112, 84)  # != refs' (84, 112)
        assert res["score_map"].shape == (112, 84)

        q = scorer._preprocess(tall)[None].astype(np.float32)
        want = np.asarray(
            jax.jit(
                make_predict_step_cached(scorer.model), static_argnames=("ref_grid",)
            )(scorer.params, q, scorer.tokens, ref_grid=scorer._ref_grid)[
                "score_map_ref_cross"
            ][0],
            np.float32,
        )
        np.testing.assert_array_equal(res["score_map"], want)

    def test_ref_grid_guards(self, ws, server):
        """Model-level guard rails for the cached mixed-aspect path."""
        import jax
        import pytest as _pytest

        _, scorer = server
        q = np.zeros((1, 56, 70, 3), np.float32)
        with _pytest.raises(ValueError, match="pass ref_grid"):
            # 56x70 query grid (4x5=20 patches) != cached 6x8=48 patches
            scorer.model.apply(
                {"params": scorer.params}, q, None, ref_tokens=scorer.tokens
            )
        with _pytest.raises(ValueError, match="reference grid"):
            scorer.model.apply(
                {"params": scorer.params}, q, None, ref_tokens=scorer.tokens,
                ref_grid=(7, 7),  # wrong factorisation of 48
            )
        with _pytest.raises(ValueError, match="only meaningful"):
            imgs = np.zeros((1, 2, 56, 70, 3), np.float32)
            scorer.model.apply(
                {"params": scorer.params}, q, imgs, ref_grid=(4, 5)
            )
        with _pytest.raises(ValueError, match="grids to match"):
            scorer.model.apply(
                {"params": scorer.params}, q, None, ref_tokens=scorer.tokens,
                ref_grid=scorer._ref_grid, valid_hw=jax.numpy.array([56, 70]),
            )

    def test_one_compile_per_shape(self, ws, server):
        """Repeat queries at a seen shape must not grow the compiled set."""
        _, scorer = server
        q_dir, _ = _dirs(ws)
        p = os.path.join(q_dir, sorted(os.listdir(q_dir))[0])
        before = list(scorer.compiled_shapes)
        scorer.score_path(p)
        scorer.score_path(p)
        assert scorer.compiled_shapes == before
        assert (84, 112, 1) in scorer.compiled_shapes  # warm-up covered it


class TestHotReload:
    def test_reload_roundtrip(self, ws, tmp_path):
        """POST /reload semantics: weights + reference tokens swap atomically;
        reloading the original checkpoint restores bit-identical scores."""
        import jax

        from crossscore_tpu.io.checkpoint import save_params
        from crossscore_tpu.tasks.common import parse_cli
        from crossscore_tpu.tasks.serve import Scorer

        q_dir, ref_dir = _dirs(ws)
        cfg = parse_cli(
            "default_predict", OVERRIDES + [f"data.dataset.reference_dir={ref_dir}"]
        )
        scorer = Scorer(cfg)
        p = os.path.join(q_dir, sorted(os.listdir(q_dir))[0])
        r1 = scorer.score_path(p)["mean_score"]

        save_params(tmp_path / "A", scorer.params)
        scaled = jax.tree_util.tree_map(lambda x: np.asarray(x) * 1.5, scorer.params)
        save_params(tmp_path / "B", scaled)

        res = scorer.reload(str(tmp_path / "B"))
        assert res["status"] == "reloaded"
        assert scorer.health()["ckpt"] == str(tmp_path / "B")
        r2 = scorer.score_path(p)["mean_score"]
        assert abs(r2 - r1) > 1e-5  # new weights actually serve

        scorer.reload(str(tmp_path / "A"))
        r3 = scorer.score_path(p)["mean_score"]
        assert r3 == r1  # tokens re-encoded + params restored: bit-identical

    def test_reload_failure_keeps_old_weights(self, ws, tmp_path):
        from crossscore_tpu.tasks.common import parse_cli
        from crossscore_tpu.tasks.serve import Scorer

        q_dir, ref_dir = _dirs(ws)
        cfg = parse_cli(
            "default_predict", OVERRIDES + [f"data.dataset.reference_dir={ref_dir}"]
        )
        scorer = Scorer(cfg)
        p = os.path.join(q_dir, sorted(os.listdir(q_dir))[0])
        r1 = scorer.score_path(p)["mean_score"]
        with pytest.raises(Exception):
            scorer.reload(str(tmp_path / "missing"))
        assert scorer.cfg.trainer.ckpt_path_to_load is None  # rolled back
        assert scorer.score_path(p)["mean_score"] == r1


class TestBatching:
    def test_microbatch_matches_sequential(self, ws):
        """serve_max_batch>1: concurrent requests coalesce into padded
        dispatches whose per-item means match sequential B=1 dispatches
        (batch-shape reduction-order noise only)."""
        import threading as th

        from crossscore_tpu.io.images import image_read
        from crossscore_tpu.tasks.common import parse_cli
        from crossscore_tpu.tasks.serve import Scorer

        q_dir, ref_dir = _dirs(ws)
        cfg = parse_cli(
            "default_predict",
            OVERRIDES
            + [
                f"data.dataset.reference_dir={ref_dir}",
                "this_main.serve_max_batch=4",
                "this_main.serve_batch_window_ms=200",
            ],
        )
        scorer = Scorer(cfg)
        # every (shape, bucket) graph was warmed at startup
        assert {s[2] for s in scorer.compiled_shapes} == {1, 2, 4}

        frames = [os.path.join(q_dir, n) for n in sorted(os.listdir(q_dir))]
        qs = [scorer._preprocess(image_read(p)) for p in frames] * 2  # 6 reqs
        seq = [scorer._score_preprocessed(q, want_map=False)[1] for q in qs[:3]]

        base_dispatches = scorer.n_dispatches
        results = [None] * len(qs)
        barrier = th.Barrier(len(qs))

        def worker(i):
            barrier.wait()
            results[i] = scorer._score_preprocessed(qs[i], want_map=False)

        threads = [th.Thread(target=worker, args=(i,)) for i in range(len(qs))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        for i, (_, mean, shape) in enumerate(results):
            assert shape == (84, 112)
            assert mean == pytest.approx(seq[i % 3], abs=1e-5)
        assert scorer.max_batch_seen >= 2  # requests actually coalesced
        assert scorer.n_dispatches - base_dispatches < len(qs)


class TestHTTP:
    def test_healthz(self, server):
        srv, scorer = server
        with urllib.request.urlopen(_url(srv, "/healthz")) as r:
            h = json.loads(r.read())
        assert h["status"] == "ok"
        assert h["refs"] == 2
        assert tuple(h["token_shape"]) == scorer.token_shape

    def test_score_bytes_json(self, ws, server):
        srv, scorer = server
        q_dir, _ = _dirs(ws)
        p = os.path.join(q_dir, sorted(os.listdir(q_dir))[0])
        body = open(p, "rb").read()
        req = urllib.request.Request(_url(srv, "/score"), data=body, method="POST")
        with urllib.request.urlopen(req) as r:
            res = json.loads(r.read())
        want = scorer.score_path(p)
        assert res["mean_score"] == pytest.approx(want["mean_score"], abs=1e-6)
        assert (res["height"], res["width"]) == (84, 112)

    def test_score_map_npy(self, ws, server):
        import io

        srv, scorer = server
        q_dir, _ = _dirs(ws)
        p = os.path.join(q_dir, sorted(os.listdir(q_dir))[0])
        req = urllib.request.Request(
            _url(srv, "/score?map=npy"), data=open(p, "rb").read(), method="POST"
        )
        with urllib.request.urlopen(req) as r:
            got = np.load(io.BytesIO(r.read()))
        np.testing.assert_array_equal(got, scorer.score_path(p)["score_map"])

    def test_score_map_png_uint16(self, ws, server):
        import io

        from PIL import Image

        srv, _ = server
        q_dir, _ = _dirs(ws)
        p = os.path.join(q_dir, sorted(os.listdir(q_dir))[0])
        req = urllib.request.Request(
            _url(srv, "/score?map=png"), data=open(p, "rb").read(), method="POST"
        )
        with urllib.request.urlopen(req) as r:
            img = Image.open(io.BytesIO(r.read()))
        assert img.size == (112, 84)
        assert np.asarray(img).dtype == np.uint16

    def test_score_path_batch(self, ws, server):
        srv, scorer = server
        q_dir, _ = _dirs(ws)
        paths = [os.path.join(q_dir, n) for n in sorted(os.listdir(q_dir))[:2]]
        req = urllib.request.Request(
            _url(srv, "/score_path"),
            data=json.dumps({"paths": paths}).encode(),
            method="POST",
        )
        with urllib.request.urlopen(req) as r:
            res = json.loads(r.read())
        assert [x["path"] for x in res] == paths
        for x in res:
            assert x["mean_score"] == pytest.approx(
                scorer.score_path(x["path"])["mean_score"], abs=1e-6
            )

    def test_bad_request_is_json_error(self, server):
        srv, _ = server
        req = urllib.request.Request(
            _url(srv, "/score_path"), data=b"{}", method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req)
        assert e.value.code == 400
        assert "error" in json.loads(e.value.read())

    def test_oversized_payload_typed_413_before_read(self, server):
        """A request whose Content-Length exceeds serve_max_body_mb is
        rejected with a typed 413 BEFORE the body is read: the response
        arrives even though the client never sends a byte of the claimed
        65 MB payload (so a misdirected upload can't tie a handler thread
        up in transfer+decode)."""
        import http.client

        srv, _ = server
        host, port = srv.server_address[:2]
        conn = http.client.HTTPConnection(host, port, timeout=60)
        try:
            conn.putrequest("POST", "/score")
            conn.putheader("Content-Length", str(65 * 1024 * 1024))
            conn.endheaders()  # body intentionally NEVER sent
            resp = conn.getresponse()
            body = json.loads(resp.read())
            assert resp.status == 413
            assert "PayloadTooLarge" in body["error"]
            assert "serve_max_body_mb" in body["error"]
        finally:
            conn.close()

    def test_non_numeric_content_length_typed_400(self, server):
        """A malformed Content-Length header gets a typed 400, not an
        unhandled ValueError in the handler thread (regression: the body-cap
        parse was hoisted out of the try block)."""
        import http.client

        srv, _ = server
        host, port = srv.server_address[:2]
        conn = http.client.HTTPConnection(host, port, timeout=60)
        try:
            conn.putrequest("POST", "/score")
            conn.putheader("Content-Length", "abc")
            conn.endheaders()
            resp = conn.getresponse()
            body = json.loads(resp.read())
            assert resp.status == 400
            assert "Content-Length" in body["error"]
        finally:
            conn.close()

    def test_negative_content_length_typed_400(self, server):
        """'Content-Length: -1' must get a typed 400 — rfile.read(-1) reads
        until EOF, so an unchecked negative length lets a client that never
        closes tie up a handler thread forever (the exact thread-exhaustion
        hole the body cap exists to prevent)."""
        import http.client

        srv, _ = server
        host, port = srv.server_address[:2]
        conn = http.client.HTTPConnection(host, port, timeout=60)
        try:
            conn.putrequest("POST", "/score")
            conn.putheader("Content-Length", "-1")
            conn.endheaders()  # body never sent; server must answer anyway
            resp = conn.getresponse()
            body = json.loads(resp.read())
            assert resp.status == 400
            assert "negative" in body["error"]
        finally:
            conn.close()

    def test_reload_during_request_storm(self, ws, tmp_path):
        """Hot reload issued mid-storm: every in-flight and subsequent request
        gets a valid response computed entirely with ONE checkpoint's weights+
        tokens — nothing dropped, no old-params/new-tokens hybrids — because
        the swap and each dispatch's weight capture share the dispatch lock."""
        import threading as th

        import jax

        from crossscore_tpu.io.checkpoint import save_params
        from crossscore_tpu.tasks.common import parse_cli
        from crossscore_tpu.tasks.serve import make_server

        q_dir, ref_dir = _dirs(ws)
        cfg = parse_cli(
            "default_predict",
            OVERRIDES
            + [
                f"data.dataset.reference_dir={ref_dir}",
                "this_main.serve_max_batch=4",
                "this_main.serve_batch_window_ms=5",
            ],
        )
        srv, scorer = make_server(cfg)
        th.Thread(target=srv.serve_forever, daemon=True).start()
        try:
            p = os.path.join(q_dir, sorted(os.listdir(q_dir))[0])
            body = open(p, "rb").read()
            mean_a = scorer.score_path(p, want_map=False)["mean_score"]
            save_params(tmp_path / "B", jax.tree_util.tree_map(
                lambda x: np.asarray(x) * 1.5, scorer.params))

            n_workers, per_worker = 6, 4
            results, errors = [], []

            def worker():
                for _ in range(per_worker):
                    try:
                        req = urllib.request.Request(
                            _url(srv, "/score"), data=body, method="POST"
                        )
                        with urllib.request.urlopen(req, timeout=300) as r:
                            results.append(json.loads(r.read())["mean_score"])
                    except Exception as e:  # pragma: no cover - failure detail
                        errors.append(repr(e))

            threads = [th.Thread(target=worker) for _ in range(n_workers)]
            for t in threads:
                t.start()
            # fire the reload while the storm is in flight
            req = urllib.request.Request(
                _url(srv, "/reload"),
                data=json.dumps({"ckpt": str(tmp_path / "B")}).encode(),
                method="POST",
            )
            with urllib.request.urlopen(req, timeout=300) as r:
                assert json.loads(r.read())["status"] == "reloaded"
            for t in threads:
                t.join()

            mean_b = scorer.score_path(p, want_map=False)["mean_score"]
            gap = abs(mean_b - mean_a)
            assert gap > 3e-4, "reload must change scores for this test to bite"
            assert errors == []  # nothing dropped or errored
            assert len(results) == n_workers * per_worker
            tol = min(1e-5, gap / 10)
            for m in results:  # each response is pure-A or pure-B
                assert min(abs(m - mean_a), abs(m - mean_b)) < tol
        finally:
            srv.shutdown()


class TestClient:
    """crossscore_tpu/client.py — the programmatic counterpart of the HTTP
    surface (stdlib transport, array/bytes/path inputs, npy/png map fetch,
    typed server errors)."""

    def _client(self, srv):
        from crossscore_tpu.client import ScoreClient

        host, port = srv.server_address[:2]
        return ScoreClient(f"http://{host}:{port}")

    def test_health_and_score_inputs_agree(self, ws, server):
        from crossscore_tpu.io.images import image_read

        srv, scorer = server
        c = self._client(srv)
        assert c.health()["status"] == "ok"

        q_dir, _ = _dirs(ws)
        p = os.path.join(q_dir, sorted(os.listdir(q_dir))[0])
        want = scorer.score_path(p)["mean_score"]
        by_path = c.score(p)["mean_score"]
        by_bytes = c.score(open(p, "rb").read())["mean_score"]
        by_array = c.score(image_read(p))["mean_score"]  # re-encoded PNG
        assert by_path == pytest.approx(want, abs=1e-6)
        assert by_bytes == by_path
        # float->uint8->PNG roundtrip of the synthetic (8-bit-born) image is
        # lossless, so the array input scores identically too
        assert by_array == pytest.approx(by_path, abs=1e-6)

    def test_score_map_and_png(self, ws, server):
        import io as _io

        from PIL import Image

        srv, scorer = server
        c = self._client(srv)
        q_dir, _ = _dirs(ws)
        p = os.path.join(q_dir, sorted(os.listdir(q_dir))[0])
        got = c.score_map(p)
        np.testing.assert_array_equal(got, scorer.score_path(p)["score_map"])
        png = c.score_map_png(p)
        img = Image.open(_io.BytesIO(png))
        assert img.size == (112, 84) and np.asarray(img).dtype == np.uint16

    def test_score_paths_order(self, ws, server):
        srv, _ = server
        c = self._client(srv)
        q_dir, _ = _dirs(ws)
        paths = [os.path.join(q_dir, n) for n in sorted(os.listdir(q_dir))[:2]]
        res = c.score_paths(paths)
        assert [x["path"] for x in res] == paths

    def test_server_error_is_typed(self, server):
        from crossscore_tpu.client import ScoreClientError

        srv, _ = server
        c = self._client(srv)
        with pytest.raises(ScoreClientError, match="score_path needs"):
            c.score_paths([])


class TestLocalDP:
    """Local data parallelism: padded micro-batches shard over the host's
    chips (the 8-device CPU mesh here); per-item results match the
    single-device daemon, and reload invalidates the replicated placements."""

    def _scorer(self, ws, extra):
        from crossscore_tpu.tasks.common import parse_cli
        from crossscore_tpu.tasks.serve import Scorer

        _, ref_dir = _dirs(ws)
        return Scorer(
            parse_cli(
                "default_predict",
                OVERRIDES
                + [f"data.dataset.reference_dir={ref_dir}", "this_main.serve_max_batch=4"]
                + extra,
            )
        )

    def test_dp_matches_single_device(self, ws):
        from crossscore_tpu.io.images import image_read

        dp = self._scorer(ws, [])
        sd = self._scorer(ws, ["this_main.serve_local_dp=false"])
        assert dp._n_local == 8
        assert sorted(dp._placed) == [2, 4]  # buckets 2 and 4 replicated
        assert sd._placed == {}

        q_dir, _ = _dirs(ws)
        frames = [os.path.join(q_dir, n) for n in sorted(os.listdir(q_dir))[:3]]
        qs = np.stack([dp._preprocess(image_read(p)) for p in frames])
        maps_dp, means_dp = dp._run_device(qs, want_map=True)     # bucket 4, 2 rows/chip... clamped
        maps_sd, means_sd = sd._run_device(qs, want_map=True)
        np.testing.assert_allclose(means_dp, means_sd, atol=1e-6)
        np.testing.assert_allclose(maps_dp, maps_sd, atol=1e-5)
        assert dp.health()["local_dp_meshes"] == [2, 4]

    def test_reload_invalidates_placements(self, ws, tmp_path):
        from crossscore_tpu.io.checkpoint import save_params

        dp = self._scorer(ws, [])
        assert dp._placed
        save_params(tmp_path / "A", dp.params)
        dp.reload(str(tmp_path / "A"))
        assert dp._placed == {}
        # next sharded dispatch re-replicates the reloaded weights
        dp._run_device(np.zeros((2, 84, 112, 3), np.float32), want_map=False)
        assert 2 in dp._placed

    def test_stale_placement_rebuilt_by_identity(self, ws):
        """The placement cache records the params object it was built from —
        a weight swap that bypasses reload's clear (the race window) is still
        caught at dispatch time and re-replicated."""
        import jax

        dp = self._scorer(ws, [])
        old_entry = dp._placed[2]
        dp.params = jax.tree_util.tree_map(lambda x: x, dp.params)  # new tree object
        dp._run_device(np.zeros((2, 84, 112, 3), np.float32), want_map=False)
        assert dp._placed[2][0] is dp.params
        assert dp._placed[2] is not old_entry


class TestBackpressure:
    def test_full_queue_rejects_with_typed_error(self, ws):
        """serve_max_queue bounds the pending queue; overflow raises
        ServerOverloaded (HTTP 503) and counts in /healthz."""
        import queue as _queue

        from crossscore_tpu.tasks.common import parse_cli
        from crossscore_tpu.tasks.serve import Scorer, ServerOverloaded

        _, ref_dir = _dirs(ws)
        s = Scorer(
            parse_cli(
                "default_predict",
                OVERRIDES
                + [
                    f"data.dataset.reference_dir={ref_dir}",
                    "this_main.serve_max_batch=2",
                    "this_main.serve_max_queue=1",
                ],
            )
        )
        full = _queue.Queue(maxsize=1)
        full.put_nowait(object())
        s._queue = full  # deterministic overflow (dispatcher watches the old queue)
        with pytest.raises(ServerOverloaded, match="serve_max_queue=1"):
            s._score_preprocessed(np.zeros((84, 112, 3), np.float32), want_map=False)
        assert s.health()["rejected_503"] == 1

    def test_client_surfaces_503(self, ws):
        """The stdlib client maps an overloaded daemon's 503 to a typed
        ScoreClientError carrying the daemon's message."""
        import json as _json
        import threading as _threading
        from http.server import BaseHTTPRequestHandler, HTTPServer

        from crossscore_tpu.client import ScoreClient, ScoreClientError

        class H(BaseHTTPRequestHandler):
            def do_POST(self):
                body = _json.dumps(
                    {"error": "pending queue at serve_max_queue=4; retry"}
                ).encode()
                self.send_response(503)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):
                pass

        srv = HTTPServer(("127.0.0.1", 0), H)
        _threading.Thread(target=srv.serve_forever, daemon=True).start()
        try:
            c = ScoreClient(f"http://127.0.0.1:{srv.server_address[1]}")
            with pytest.raises(ScoreClientError, match="503.*serve_max_queue=4"):
                c.score(b"\x89PNG fake")
        finally:
            srv.shutdown()


class TestSigtermDrain:
    def test_sigterm_mid_storm_completes_accepted_requests(self, ws):
        """SIGTERM fired mid-storm (the orchestrated-termination path, e.g.
        k8s): every request that entered before the drain completes with a
        valid 200; requests after it get the typed ServerDraining 503;
        /healthz flips to 'draining'; the drain loop reaches zero in-flight
        and serve_forever exits."""
        import signal
        import threading as th
        import time as _time
        import urllib.error

        from crossscore_tpu.tasks.common import parse_cli
        from crossscore_tpu.tasks.serve import (
            drain_server,
            install_sigterm_drain,
            make_server,
        )

        q_dir, ref_dir = _dirs(ws)
        cfg = parse_cli(
            "default_predict",
            OVERRIDES
            + [
                f"data.dataset.reference_dir={ref_dir}",
                "this_main.serve_max_batch=4",
                "this_main.serve_batch_window_ms=5",
            ],
        )
        srv, scorer = make_server(cfg)
        old_handler = signal.getsignal(signal.SIGTERM)
        install_sigterm_drain(srv)
        serve_thread = th.Thread(target=srv.serve_forever, daemon=True)
        serve_thread.start()
        try:
            p = os.path.join(q_dir, sorted(os.listdir(q_dir))[0])
            body = open(p, "rb").read()
            expect = scorer.score_path(p, want_map=False)["mean_score"]

            oks, drains, errors = [], [], []

            def worker():
                for _ in range(4):
                    try:
                        req = urllib.request.Request(
                            _url(srv, "/score"), data=body, method="POST"
                        )
                        with urllib.request.urlopen(req, timeout=300) as r:
                            oks.append(json.loads(r.read())["mean_score"])
                    except urllib.error.HTTPError as e:
                        msg = json.loads(e.read())["error"]
                        assert e.code == 503 and "ServerDraining" in msg, msg
                        drains.append(msg)
                        return  # replica is going away; a client would retry elsewhere
                    except (urllib.error.URLError, ConnectionError):
                        return  # accept loop already closed
                    except Exception as e:  # pragma: no cover - failure detail
                        errors.append(repr(e))

            threads = [th.Thread(target=worker) for _ in range(6)]
            for t in threads:
                t.start()
            # let the storm get requests in flight, then terminate
            while not oks and all(t.is_alive() for t in threads):
                _time.sleep(0.01)
            signal.raise_signal(signal.SIGTERM)
            clean = drain_server(srv, deadline_s=120.0)
            for t in threads:
                t.join(timeout=300)
            assert errors == []
            assert clean and srv.inflight.value == 0
            assert oks and all(abs(v - expect) < 1e-5 for v in oks)
            serve_thread.join(timeout=30)
            assert not serve_thread.is_alive()  # accept loop exited
            # the handler path refused at least the storm tails or, at
            # minimum, refuses a fresh post-drain request
            if not drains:
                req = urllib.request.Request(
                    _url(srv, "/score"), data=body, method="POST"
                )
                with pytest.raises((urllib.error.URLError, ConnectionError)):
                    urllib.request.urlopen(req, timeout=10)
            # every ServerDraining 503 is counted for the drain summary
            assert srv.drain_rejected.value == len(drains)
        finally:
            signal.signal(signal.SIGTERM, old_handler)
            srv.shutdown()
            srv.server_close()

    def test_healthz_reports_draining_as_503(self, ws):
        """A draining replica must answer /healthz with a NON-2xx status:
        httpGet readiness probes key on the status code alone, so a 200
        with a 'draining' body would keep the replica in rotation for the
        whole grace period."""
        import urllib.error

        from crossscore_tpu.tasks.common import parse_cli
        from crossscore_tpu.tasks.serve import make_server

        _, ref_dir = _dirs(ws)
        cfg = parse_cli(
            "default_predict", OVERRIDES + [f"data.dataset.reference_dir={ref_dir}"]
        )
        srv, _ = make_server(cfg)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        try:
            with urllib.request.urlopen(_url(srv, "/healthz"), timeout=60) as r:
                assert r.status == 200
                assert json.loads(r.read())["status"] == "ok"
            srv.draining.set()
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(_url(srv, "/healthz"), timeout=60)
            assert ei.value.code == 503
            body = json.loads(ei.value.read())
            assert body["status"] == "draining"
            assert "refs" in body  # full stats still carried for humans
        finally:
            srv.shutdown()
            srv.server_close()
