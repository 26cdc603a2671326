"""Persistent scoring service: compile-once, reference-warm serving daemon.

The reference has no serving story beyond batch ``task/predict.py`` — every
invocation pays process start, checkpoint load, a cold compile, and 1+K
backbone forwards per query (reference ``task/core.py:119-161``). This daemon
is the TPU-native production path: the model compiles ONCE, the reference
views are encoded through the frozen backbone ONCE at startup (the
cached-reference serving path, ``data/token_cache.py`` — restart-warm when
``this_main.ref_token_cache_dir`` is set), and a warm request then costs one
query ViT forward + the decoder (~409 maps/s/chip at 518 px, PERFORMANCE.md).

HTTP API (stdlib ``http.server``; zero extra dependencies):

  GET  /healthz     -> JSON: status, reference count, token shape, compiled
                       query shapes, request count
  POST /score       -> body = PNG/JPEG image bytes. Default response is JSON
                       ``{"mean_score", "height", "width"}`` (the per-frame
                       mean the summariser CSVs report). ``?map=npy`` returns
                       the full float32 score map as ``.npy`` bytes;
                       ``?map=png`` as a uint16 gray PNG (``metric_map_write``
                       encoding, reference ``utils/io/images.py:32-63``).
  POST /score_path  -> JSON ``{"path": "..."}`` or ``{"paths": [...]}`` for
                       server-local files; returns JSON results in order.
  POST /reload      -> JSON ``{"ckpt": "..."}``: zero-downtime weight
                       hot-swap — params load and reference tokens re-encode
                       off the serving path, then swap atomically (compiled
                       graphs stay valid; failures keep the old weights).

Exactness contract: queries and references are trimmed to patch multiples
(%14) after the short-side resize. The patch-embed conv strides ignore the
sub-patch remainder, so trimmed inputs produce the SAME tokens and score maps
as ``tasks.predict``'s untrimmed ones (pinned by tests/test_serve.py).

Shapes: one compiled graph per distinct (resized, trimmed) query shape —
fixed-resolution cameras compile once; a new aspect ratio pays one compile
(logged). References must share one shape after preprocessing (one token
batch); the daemon refuses mixed-shape reference dirs with a clear error.

Transfer budget (HBM-bandwidth rule applied to the serving link): the
per-frame mean reduces ON DEVICE inside the same compiled graph, so a JSON
request fetches one scalar — the full float32 map crosses the link only for
``?map=npy|png`` responses. ``this_main.serve_upload_cast=true`` additionally
uploads queries in the compute dtype (halves H2D under bf16) at the cost of
bf16-input-rounding score drift (~1e-3, bounded in tests) — XLA elides the
in-graph downcast, so the f32-fed graph is the exactness reference.

Throughput under load: ``this_main.serve_max_batch`` > 1 micro-batches
concurrent requests into one padded device dispatch (power-of-two buckets,
every (shape, bucket) graph warmed at startup; the batching window is
``serve_batch_window_ms``). B=8 is the measured per-chip optimum on the
cached path (PERFORMANCE.md) — batched serving approaches it instead of
paying a B=1 dispatch per request.
"""

from __future__ import annotations

import json
import threading
import time
from pathlib import Path

import numpy as np

from crossscore_tpu.tasks.common import parse_cli


class ServerOverloaded(RuntimeError):
    """Raised when the pending-request queue is at ``serve_max_queue`` — the
    HTTP layer maps it to 503 so load balancers shed to other nodes instead
    of piling latency onto this one."""


class Scorer:
    """Params + reference tokens + the jitted cached predict step.

    Thread-safe: device dispatch is serialised behind a lock (one chip, one
    stream); preprocessing runs outside it.
    """

    def __init__(self, cfg):
        import jax

        from crossscore_tpu.tasks.common import apply_accelerator, load_model_params
        from crossscore_tpu.utils.compilation_cache import enable as enable_compile_cache

        apply_accelerator(cfg)
        enable_compile_cache()

        from crossscore_tpu.data.token_cache import RefTokenCache
        from crossscore_tpu.io.images import image_read, image_read_bytes
        from crossscore_tpu.models import CrossScoreConfig, CrossScoreNet
        from crossscore_tpu.models.crossscore import make_backbone_encoder
        from crossscore_tpu.train.step import make_predict_step_cached

        self._image_read = image_read
        self._image_read_bytes = image_read_bytes
        self.cfg = cfg
        self.resize_short = int(cfg.this_main.resize_short_side)
        self.metric_vrange = [cfg.model.predict.metric.min, cfg.model.predict.metric.max]

        ref_dir = cfg.data.dataset.reference_dir
        if not ref_dir:
            raise ValueError("serve requires data.dataset.reference_dir")
        ref_dir = Path(ref_dir).expanduser()
        ref_paths = sorted(str(p) for p in ref_dir.iterdir() if p.is_file())
        max_refs = int(cfg.this_main.get("serve_max_refs", 0))
        if max_refs > 0:
            ref_paths = ref_paths[:max_refs]
        if not ref_paths:
            raise ValueError(f"no reference images in {ref_dir}")

        refs = [self._preprocess(image_read(p)) for p in ref_paths]
        shapes = {r.shape for r in refs}
        if len(shapes) != 1:
            raise ValueError(
                f"reference images must share one post-resize shape for a "
                f"single token batch; got {sorted(shapes)} — split the dir "
                f"per camera or set this_main.resize_short_side"
            )
        ref_imgs = np.stack(refs)[None]  # (1, K, H, W, 3)
        self.n_refs = len(ref_paths)

        mcfg = CrossScoreConfig.from_config(cfg)
        self.model = CrossScoreNet(mcfg)
        example = {
            "query/img": ref_imgs[0, :1],
            "reference/cross/imgs": ref_imgs,
        }
        self.params = load_model_params(cfg, self.model, example)

        self._encode_jit = jax.jit(make_backbone_encoder(mcfg))
        self._encode_batch = int(cfg.this_main.get("ref_token_cache_encode_batch", 16))
        self._ref_paths = ref_paths
        self._ref_imgs = ref_imgs  # kept for checkpoint hot-reload re-encode
        self.ckpt_path = cfg.trainer.ckpt_path_to_load
        cache = RefTokenCache(
            lambda imgs, valid_hw=None: self._encode_jit(self.params, imgs),
            encode_batch=self._encode_batch,
            max_items=max(self.n_refs, int(cfg.this_main.get("ref_token_cache_max_items", 2048))),
            persist_dir=cfg.this_main.get("ref_token_cache_dir"),
        )
        tokens = cache.gather([[p] for p in ref_paths], ref_imgs)
        self.tokens = jax.device_put(tokens)  # (1, K, N_patch, D)
        self.token_shape = tuple(int(s) for s in tokens.shape[1:])
        self.disk_hits = cache.disk_hits

        # host<->device traffic is the serving tax (PCIe on a real host; the
        # relay tunnel here): the per-frame mean reduces ON DEVICE, so a JSON
        # request fetches one scalar instead of the full (H, W) float32 map.
        # this_main.serve_upload_cast=true additionally uploads queries in the
        # compute dtype (halves H2D under bf16) — opt-in because XLA ELIDES
        # the in-graph f32->bf16 input downcast (the f32-fed conv runs at f32
        # precision), so the pre-cast shifts scores by up to bf16 input
        # rounding (~1e-3; bounded in tests/test_serve.py). Default: exact.
        self._in_dtype = (
            mcfg.compute_dtype
            if bool(cfg.this_main.get("serve_upload_cast", False))
            else np.float32
        )
        base_step = make_predict_step_cached(self.model)
        patch = int(CrossScoreConfig.from_config(cfg).patch_size)
        ref_h, ref_w = refs[0].shape[:2]
        self._ref_grid = (ref_h // patch, ref_w // patch)

        def _fwd(params, q, tokens):
            import jax.numpy as jnp

            # the reference tokens are shared by every query in the batch;
            # ref_grid pins the PE to the REFERENCE shape's grid, so queries
            # of any aspect ratio score against the one cached token set
            tok = jnp.broadcast_to(tokens, (q.shape[0],) + tokens.shape[1:])
            m = base_step(params, q, tok, ref_grid=self._ref_grid)[
                "score_map_ref_cross"
            ]
            return m, m.mean(axis=(1, 2))

        self._step = jax.jit(_fwd)
        self._lock = threading.Lock()
        # local data parallelism: on a multi-chip host, padded micro-batches
        # shard over the local chips (host-local mesh — the DDP-predict
        # semantics of parallel.local_batch_sharding); params + tokens are
        # replicated once per mesh size and cached. Per-item math is
        # independent along the batch dim, so results match device-0 serving.
        self._serve_dp = bool(cfg.this_main.get("serve_local_dp", True))
        self._n_local = len(jax.local_devices())
        self._placed: dict[int, tuple] = {}  # n_shards -> (params, tokens)
        # explicit per-(h, w, bucket) executables (lower+compile instead of
        # relying on jit's internal cache) so they can be serialized into /
        # loaded from an AOT artifact (io/aot.py)
        self._compiled: dict[tuple[int, int, int], object] = {}
        self._aot_keys: set[tuple[int, int, int]] = set()
        # raw artifact entries kept so aot_load + aot_save composes: a node
        # can extend an artifact (e.g. warm one new shape) and re-export the
        # union — deserialized executables can't re-serialize themselves
        self._aot_raw: dict[tuple[int, int, int], dict] = {}
        self.compiled_shapes: list[tuple[int, int, int]] = []  # (h, w, bucket)
        self.n_requests = 0
        self.n_dispatches = 0
        self.max_batch_seen = 0

        aot_load = cfg.this_main.get("serve_aot_load")
        if aot_load:
            from crossscore_tpu.io.aot import load_artifact, params_signature

            _, fns, raw = load_artifact(
                aot_load,
                expect_meta={
                    "token_shape": tuple(self.token_shape),
                    # token_shape alone cannot distinguish transposed aspects
                    # (37x49 vs 49x37 both give 1813 patches); the grid is
                    # baked into the compiled PE interpolation
                    "ref_grid": tuple(self._ref_grid),
                    "params_signature": params_signature(self.params),
                    "in_dtype": str(np.dtype(self._in_dtype)),
                },
                with_entries=True,
            )
            for key_s, fn in fns.items():
                h, w, b = (int(x) for x in key_s.replace("xb", "x").split("x"))
                self._compiled[(h, w, b)] = fn
                self._aot_keys.add((h, w, b))
                self._aot_raw[(h, w, b)] = raw[key_s]
                self.compiled_shapes.append((h, w, b))
            print(f"serve: loaded {len(fns)} AOT-compiled graphs from {aot_load}",
                  flush=True)

        # request micro-batching (this_main.serve_max_batch > 1): concurrent
        # requests drain into ONE padded device dispatch — per-chip throughput
        # under load approaches the batched predict path (B=8 is the measured
        # optimum, PERFORMANCE.md) instead of paying B=1 per request. Bucket
        # sizes are powers of two up to the cap; each (shape, bucket) is one
        # compiled graph, all warmed at startup. Per-item outputs carry batch-
        # shape reduction-order noise (~1e-7 f32) vs a B=1 dispatch — the same
        # caveat the token cache documents (data/token_cache.py).
        self.max_batch = max(1, int(cfg.this_main.get("serve_max_batch", 1)))
        self.batch_window_s = float(cfg.this_main.get("serve_batch_window_ms", 2.0)) / 1e3
        # backpressure: reject with 503 instead of queueing unboundedly (a
        # load balancer sheds to other nodes; 0 = unbounded)
        self.max_queue = int(cfg.this_main.get("serve_max_queue", 0))
        self.n_rejected = 0
        self._buckets = sorted(
            {b for b in (1, 2, 4, 8, 16, 32) if b <= self.max_batch} | {self.max_batch}
        )
        if self.max_batch > 1:
            import queue

            self._queue: "queue.Queue" = queue.Queue(maxsize=self.max_queue)
            threading.Thread(target=self._dispatch_loop, daemon=True).start()

        # warm-up at the reference shape (the common camera-matches-renders
        # case compiles at startup, not on the first request) — every bucket;
        # this_main.serve_warm_shapes adds known camera shapes ("HxW",
        # post-resize/trim) so a fleet pre-compiles everything it will see
        warm = [refs[0].shape[:2]]
        for s in cfg.this_main.get("serve_warm_shapes") or []:
            h, w = (int(x) for x in str(s).lower().split("x"))
            if h % 14 or w % 14:
                raise ValueError(
                    f"serve_warm_shapes entry {s!r} must be %14-trimmed "
                    f"(post-resize shapes, e.g. '518x686')"
                )
            warm.append((h, w))
        for h, w in warm:
            for b in self._buckets:
                self._run_device(
                    np.zeros((b, h, w, 3), np.float32),
                    want_map=(b == self._buckets[0]),
                )

        aot_save = cfg.this_main.get("serve_aot_save")
        if aot_save:
            from crossscore_tpu.io.aot import (
                params_signature, save_artifact, serialize_compiled,
            )

            try:
                # fresh compiles serialize; graphs that CAME from an artifact
                # re-export their original raw entry (deserialized executables
                # can't re-serialize) — so load + save composes: a node can
                # warm new shapes and write the union back
                entries = {
                    f"{h}x{w}xb{b}": (
                        self._aot_raw[(h, w, b)]
                        if (h, w, b) in self._aot_keys
                        else serialize_compiled(c)
                    )
                    for (h, w, b), c in self._compiled.items()
                }
                save_artifact(
                    aot_save,
                    entries,
                    meta={
                        "token_shape": tuple(self.token_shape),
                        "ref_grid": tuple(self._ref_grid),
                        "params_signature": params_signature(self.params),
                        "in_dtype": str(np.dtype(self._in_dtype)),
                    },
                )
                print(f"serve: saved {len(entries)} AOT-compiled graphs to "
                      f"{aot_save}", flush=True)
            except Exception as e:  # keep serving even if the backend can't
                print(f"serve: AOT save failed ({e}); continuing without "
                      f"artifact", flush=True)

    # ------------------------------------------------------------ scoring

    def _preprocess(self, img: np.ndarray) -> np.ndarray:
        """float32 [0,1] (H, W, 3) -> resized, %14-trimmed, ImageNet-normalised.

        Same rounding as the predict pipeline (``data/nvs_index.py::_resize``);
        the trim is output-exact (see module docstring)."""
        from crossscore_tpu.io.images import normalize_imagenet
        from crossscore_tpu.ops.interpolate import resize_bilinear_antialias

        s = self.resize_short
        h, w = img.shape[:2]
        if s > 0 and min(h, w) != s:
            if h <= w:
                h, w = s, max(1, round(w * s / h))
            else:
                h, w = max(1, round(h * s / w)), s
            img = resize_bilinear_antialias(img, h, w)
        if min(h, w) < 14:
            raise ValueError(
                f"image too small after resize: {(h, w)} — needs at least one "
                f"14px patch per side (this_main.resize_short_side={s})"
            )
        img = img[: h - h % 14, : w - w % 14]
        return normalize_imagenet(img).astype(np.float32)

    def _placement(self, bucket: int):
        """(q_sharding, params, tokens) for a bucket: batch-sharded over the
        local chips when local DP applies, else None (single-device path).
        Replicated params/tokens are placed once per mesh size and cached.
        MUST be called under ``self._lock``: each cache entry records the
        params object it was placed from, so a hot reload concurrent with a
        dispatch can never resurrect stale weights (the entry is rebuilt when
        its source ``self.params`` no longer matches)."""
        if not self._serve_dp or self._n_local == 1 or bucket == 1:
            return None
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from crossscore_tpu.parallel.mesh import local_batch_sharding

        shard = local_batch_sharding(bucket)
        n_dev = int(shard.mesh.devices.size)
        if n_dev == 1:
            return None
        entry = self._placed.get(n_dev)
        if entry is None or entry[0] is not self.params:
            repl = NamedSharding(shard.mesh, P())
            entry = (
                self.params,
                jax.device_put(self.params, repl),
                jax.device_put(self.tokens, repl),
            )
            self._placed[n_dev] = entry
        return shard, entry[1], entry[2]

    def _run_device(self, qs: np.ndarray, want_map: bool):
        """One padded device dispatch for (n, H, W, 3) preprocessed queries.
        Returns (maps-or-None, means) for the n rows."""
        import jax

        n = len(qs)
        bucket = min(b for b in self._buckets if b >= n)
        if n < bucket:
            qs = np.concatenate([qs, np.broadcast_to(qs[-1:], (bucket - n, *qs.shape[1:]))])
        qs = np.asarray(qs, self._in_dtype)
        key = (int(qs.shape[1]), int(qs.shape[2]), bucket)

        def _compile():
            print(f"serve: compiling query shape {key[:2]} bucket={bucket} "
                  f"({len(self.compiled_shapes)} cached)", flush=True)

            def aval(x, s=None):
                # in the DP path the placed arrays carry their NamedSharding;
                # the lowered graph must pin it or the executable would expect
                # different input placements than we feed it
                if s is None and placed is not None:
                    s = getattr(x, "sharding", None)
                return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s)

            q_aval = aval(qs, None if placed is None else placed[0])
            p_avals = jax.tree_util.tree_map(aval, params)
            return self._step.lower(p_avals, q_aval, aval(tokens)).compile()

        def _execute(fn):
            q_dev = qs if placed is None else jax.device_put(qs, placed[0])
            map_dev, mean_dev = fn(params, q_dev, tokens)
            means = np.asarray(mean_dev[:n], np.float32)  # small fetch = sync barrier
            maps = np.asarray(map_dev[:n], np.float32) if want_map else None
            return maps, means

        with self._lock:
            # placement + weight capture live under the lock so a concurrent
            # hot reload can neither interleave params/tokens from different
            # checkpoints nor leave a stale replicated copy in the cache
            placed = self._placement(bucket)
            params, tokens = (self.params, self.tokens) if placed is None else placed[1:]
            fn = self._compiled.get(key)
            if fn is None:
                fn = self._compiled[key] = _compile()
                self.compiled_shapes.append(key)
            try:
                maps, means = _execute(fn)
            except Exception as e:
                if key not in self._aot_keys:
                    raise
                # an artifact-loaded executable failed AT DISPATCH (e.g. the
                # XLA:CPU AOT loader's machine-feature relocation gap) —
                # degrade gracefully: recompile this graph in-process and keep
                # serving rather than failing the request
                print(f"serve: AOT executable for {key} failed at dispatch "
                      f"({type(e).__name__}: {e}); recompiling in-process",
                      flush=True)
                self._aot_keys.discard(key)
                fn = self._compiled[key] = _compile()
                maps, means = _execute(fn)
            self.n_requests += n
            self.n_dispatches += 1
            self.max_batch_seen = max(self.max_batch_seen, n)
        return maps, means

    class _Pending:
        __slots__ = ("q", "want_map", "event", "result", "error")

        def __init__(self, q, want_map):
            self.q, self.want_map = q, want_map
            self.event = threading.Event()
            self.result = self.error = None

    def _run_batch(self, batch: list) -> None:
        try:
            want_map = any(it.want_map for it in batch)
            maps, means = self._run_device(
                np.stack([it.q for it in batch]), want_map
            )
            for i, it in enumerate(batch):
                it.result = (maps[i] if it.want_map else None, float(means[i]))
        except Exception as e:  # deliver to every waiter; the loop survives
            for it in batch:
                it.error = e
        finally:
            for it in batch:
                it.event.set()

    def _dispatch_loop(self) -> None:
        """Drain concurrent requests into one padded dispatch: wait for the
        first item, then collect same-shape items for the batching window (or
        until the cap); a shape change flushes the current batch."""
        import queue

        while True:
            batch = [self._queue.get()]
            deadline = time.perf_counter() + self.batch_window_s
            while len(batch) < self.max_batch:
                timeout = deadline - time.perf_counter()
                if timeout <= 0:
                    break
                try:
                    nxt = self._queue.get(timeout=timeout)
                except queue.Empty:
                    break
                if nxt.q.shape != batch[0].q.shape:
                    self._run_batch(batch)
                    batch = [nxt]
                    deadline = time.perf_counter() + self.batch_window_s
                else:
                    batch.append(nxt)
            self._run_batch(batch)

    def _score_preprocessed(self, q: np.ndarray, want_map: bool = True):
        shape = q.shape[:2]
        if self.max_batch == 1:
            maps, means = self._run_device(q[None], want_map)
            return (maps[0] if want_map else None), float(means[0]), shape
        item = self._Pending(q, want_map)
        try:
            self._queue.put_nowait(item)
        except Exception:  # queue.Full — bounded by serve_max_queue
            with self._lock:
                self.n_rejected += 1
            raise ServerOverloaded(
                f"pending queue at serve_max_queue={self.max_queue}; retry"
            ) from None
        item.event.wait()
        if item.error is not None:
            raise item.error
        score_map, mean = item.result
        return score_map, mean, shape

    def score(self, img: np.ndarray, want_map: bool = True) -> dict:
        """float32 [0,1] (H, W, 3) image -> per-frame mean (+ score map)."""
        t0 = time.perf_counter()
        score_map, mean, shape = self._score_preprocessed(
            self._preprocess(img), want_map
        )
        res = {
            "mean_score": mean,
            "height": int(shape[0]),
            "width": int(shape[1]),
            "time_ms": round(1e3 * (time.perf_counter() - t0), 2),
        }
        if want_map:
            res["score_map"] = score_map
        return res

    def score_bytes(self, data: bytes, want_map: bool = True) -> dict:
        return self.score(self._image_read_bytes(data), want_map)

    def score_path(self, path: str, want_map: bool = True) -> dict:
        return self.score(self._image_read(path), want_map)

    def reload(self, ckpt_path: str) -> dict:
        """Zero-downtime weight hot-swap: load params from ``ckpt_path``
        (torch .ckpt or orbax dir, same resolution as the CLI flag),
        re-encode the reference tokens with them, then swap both atomically
        under the dispatch lock. The compiled graphs stay valid — params and
        tokens are jit ARGUMENTS, not constants — and requests keep serving
        the old weights until the swap. On failure the old state is kept."""
        import jax

        from crossscore_tpu.data.token_cache import RefTokenCache
        from crossscore_tpu.tasks.common import load_model_params

        if not ckpt_path:
            raise ValueError("reload needs a checkpoint path")
        t0 = time.perf_counter()
        old = self.cfg.trainer.ckpt_path_to_load
        self.cfg.trainer.ckpt_path_to_load = ckpt_path
        try:
            example = {
                "query/img": self._ref_imgs[0, :1],
                "reference/cross/imgs": self._ref_imgs,
            }
            params = load_model_params(self.cfg, self.model, example)
            cache = RefTokenCache(
                lambda imgs, valid_hw=None: self._encode_jit(params, imgs),
                encode_batch=self._encode_batch,
                max_items=max(self.n_refs, 1),
            )
            tokens = cache.gather([[p] for p in self._ref_paths], self._ref_imgs)
        except Exception:
            self.cfg.trainer.ckpt_path_to_load = old
            raise
        with self._lock:
            self.params = params
            self.tokens = jax.device_put(tokens)
            self.ckpt_path = ckpt_path
            self._placed.clear()  # re-replicate on next sharded dispatch
        return {
            "status": "reloaded",
            "ckpt": str(ckpt_path),
            "seconds": round(time.perf_counter() - t0, 2),
        }

    def health(self) -> dict:
        import jax

        with self._lock:  # consistent snapshot vs dispatch/reload mutations
            return {
                "status": "ok",
                "ckpt": None if self.ckpt_path is None else str(self.ckpt_path),
                "refs": self.n_refs,
                "token_shape": list(self.token_shape),
                "compiled_shapes": [list(s) for s in self.compiled_shapes],
                "requests": self.n_requests,
                "dispatches": self.n_dispatches,
                "max_batch": self.max_batch,
                "max_batch_seen": self.max_batch_seen,
                "rejected_503": self.n_rejected,
                "restart_warm_disk_hits": self.disk_hits,
                "aot_shapes": len(self._aot_keys),
                "local_devices": self._n_local,
                "local_dp_meshes": sorted(self._placed),
                "backend": jax.default_backend(),
            }


def _json_result(res: dict) -> dict:
    return {k: v for k, v in res.items() if k != "score_map"}


class _Inflight:
    """Context-manager request counter for the SIGTERM drain."""

    def __init__(self):
        self.value = 0
        self._lock = threading.Lock()

    def __enter__(self):
        with self._lock:
            self.value += 1
        return self

    def __exit__(self, *exc):
        with self._lock:
            self.value -= 1
        return False

    def bump(self):
        """One-way increment (plain counter use, no paired decrement)."""
        with self._lock:
            self.value += 1


def make_server(cfg):
    """Build (ThreadingHTTPServer, Scorer); the caller runs serve_forever."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import parse_qs, urlparse

    scorer = Scorer(cfg)
    max_body = int(float(cfg.this_main.get("serve_max_body_mb", 64)) * 1024 * 1024)
    # SIGTERM drain state (install_sigterm_drain): once `draining` is set new
    # work is refused with a typed 503 while requests already inside the
    # `inflight` counter run to completion — the orchestrated-termination
    # path (k8s sends SIGTERM, then SIGKILL after the grace period).
    draining = threading.Event()
    inflight = _Inflight()
    drain_rejected = _Inflight()  # .value counts 503'd post-drain requests

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # stdout, one line, no reverse DNS
            print(f"serve: {self.address_string()} {fmt % args}", flush=True)

        def _send(self, code: int, body: bytes, ctype: str) -> None:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _send_json(self, code: int, obj) -> None:
            self._send(code, json.dumps(obj).encode(), "application/json")

        def do_GET(self):
            if urlparse(self.path).path == "/healthz":
                h = scorer.health()
                if draining.is_set():
                    # non-2xx, not just a body field: httpGet readiness
                    # probes key on the STATUS CODE, so a draining replica
                    # must answer 503 to be pulled from rotation (the body
                    # still carries the full stats for humans)
                    h["status"] = "draining"
                    self._send_json(503, h)
                else:
                    self._send_json(200, h)
            else:
                self._send_json(404, {"error": f"unknown path {self.path}"})

        def _respond_scored(self, res: dict, map_mode: str) -> None:
            if map_mode == "npy":
                import io as _io

                buf = _io.BytesIO()
                np.save(buf, res["score_map"])
                self._send(200, buf.getvalue(), "application/octet-stream")
            elif map_mode == "png":
                import io as _io

                from crossscore_tpu.io.images import metric_map_write

                import tempfile

                with tempfile.NamedTemporaryFile(suffix=".png") as f:
                    metric_map_write(f.name, res["score_map"], scorer.metric_vrange)
                    self._send(200, Path(f.name).read_bytes(), "image/png")
            else:
                self._send_json(200, _json_result(res))

        def do_POST(self):
            # enter the counter FIRST, then check: a request counted before
            # the drain began is guaranteed to complete (drain_server waits
            # on the counter); one entering after gets the typed 503
            with inflight:
                if draining.is_set():
                    drain_rejected.bump()  # counted for the drain summary
                    self.close_connection = True
                    self._send_json(503, {
                        "error": "ServerDraining: SIGTERM received; this "
                                 "replica is shutting down"
                    })
                    return
                self._do_post_inner()

        def _do_post_inner(self):
            url = urlparse(self.path)
            q = parse_qs(url.query)
            map_mode = q.get("map", ["none"])[0]
            try:
                n_body = int(self.headers.get("Content-Length", 0))
            except ValueError:
                self.close_connection = True
                self._send_json(400, {"error": "BadRequest: non-numeric "
                                               "Content-Length header"})
                return
            if n_body < 0:
                # rfile.read(-1) would block until the client closes — the
                # thread-exhaustion hole the body cap exists to prevent.
                self.close_connection = True
                self._send_json(400, {"error": "BadRequest: negative "
                                               "Content-Length header"})
                return
            if max_body and n_body > max_body:
                # typed 4xx BEFORE the body is read or decoded: a misdirected
                # multi-GB upload must not tie up a handler thread in decode.
                # The unread body makes the connection unusable — close it.
                self.close_connection = True
                self._send_json(
                    413,
                    {"error": f"PayloadTooLarge: body is {n_body} bytes; the "
                              f"daemon caps requests at serve_max_body_mb="
                              f"{max_body // (1024 * 1024)}"},
                )
                return
            try:
                body = self.rfile.read(n_body)
                want_map = map_mode in ("npy", "png")
                if url.path == "/score":
                    self._respond_scored(scorer.score_bytes(body, want_map), map_mode)
                elif url.path == "/reload":
                    self._send_json(200, scorer.reload(json.loads(body).get("ckpt")))
                elif url.path == "/score_path":
                    req = json.loads(body)
                    paths = req.get("paths", [req["path"]] if "path" in req else [])
                    if not paths:
                        raise ValueError("score_path needs 'path' or 'paths'")
                    self._send_json(
                        200,
                        [dict(_json_result(scorer.score_path(p, want_map=False)), path=p)
                         for p in paths],
                    )
                else:
                    self._send_json(404, {"error": f"unknown path {url.path}"})
            except ServerOverloaded as e:
                self._send_json(503, {"error": str(e)})
            except Exception as e:  # surface the cause to the client
                self._send_json(400, {"error": f"{type(e).__name__}: {e}"})

    host = str(cfg.this_main.get("serve_host", "127.0.0.1"))
    port = int(cfg.this_main.get("serve_port", 8642))
    server = ThreadingHTTPServer((host, port), Handler)
    server.draining = draining
    server.inflight = inflight
    server.drain_rejected = drain_rejected
    return server, scorer


def install_sigterm_drain(server) -> None:
    """SIGTERM → graceful drain; SIGINT keeps KeyboardInterrupt behaviour.

    The handler only flips the drain flag and stops the accept loop from a
    side thread (``shutdown()`` blocks until ``serve_forever`` acknowledges,
    so calling it inline in a main-thread signal handler would deadlock while
    ``serve_forever`` runs on that same thread). The caller then runs
    :func:`drain_server` after ``serve_forever`` returns. Must be called from
    the main thread (``signal`` module restriction)."""
    import signal

    def _shutdown_and_close():
        server.shutdown()
        # also CLOSE the listener: connections already queued in the kernel
        # accept backlog would otherwise never be accepted nor reset — the
        # client hangs until its timeout. Closing resets them so un-accepted
        # clients fail fast and retry another replica; accepted connections
        # (own sockets, own handler threads) drain undisturbed.
        server.server_close()

    def _on_sigterm(signum, frame):
        server.draining.set()
        threading.Thread(target=_shutdown_and_close, daemon=True).start()

    signal.signal(signal.SIGTERM, _on_sigterm)


def drain_server(server, deadline_s: float = 30.0) -> bool:
    """Wait for in-flight requests to complete; True iff drained clean."""
    t0 = time.monotonic()
    while server.inflight.value > 0 and time.monotonic() - t0 < deadline_s:
        time.sleep(0.02)
    return server.inflight.value == 0


def serve(cfg) -> None:
    if bool(cfg.this_main.get("serve_warmup_only", False)):
        # exporter mode: build + warm the Scorer (which saves the AOT
        # artifact when serve_aot_save is set), then exit without serving
        scorer = Scorer(cfg)
        print(
            f"serve: warmup-only done — {len(scorer.compiled_shapes)} graphs "
            f"compiled, {scorer.n_refs} references encoded",
            flush=True,
        )
        return
    server, scorer = make_server(cfg)
    install_sigterm_drain(server)
    host, port = server.server_address[:2]
    print(
        f"serve: ready on http://{host}:{port} — {scorer.n_refs} references "
        f"warm, token shape {scorer.token_shape}, backend "
        f"{scorer.health()['backend']}",
        flush=True,
    )
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()
    if server.draining.is_set():
        deadline = float(cfg.this_main.get("serve_drain_deadline_s", 30))
        clean = drain_server(server, deadline)
        h = scorer.health()
        state = ("complete" if clean else
                 f"deadline {deadline}s hit, {server.inflight.value} still in flight")
        print(
            f"serve: SIGTERM drain {state} — {h['requests']} requests, "
            f"{h['dispatches']} dispatches, "
            f"{server.drain_rejected.value} drain-refused 503 "
            f"(overload 503s over the run: {h['rejected_503']})",
            flush=True,
        )
    server.server_close()


def main(argv=None):
    cfg = parse_cli("default_predict", argv)
    serve(cfg)


if __name__ == "__main__":
    main()
