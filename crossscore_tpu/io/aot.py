"""AOT serving artifacts: serialized COMPILED executables.

The persistent XLA compilation cache makes restarts warm on ONE machine; an
AOT artifact makes a serving FLEET warm — compile the serving graphs once
(per platform), ship one file, and every node loads ready-to-run executables
instead of paying the cold XLA compile (10-25 min for the full model through
this environment's tunnel). The reference has no analogue: every
``task/predict.py`` invocation re-traces and re-compiles the torch graph
(reference ``task/predict.py:137-146`` under Lightning).

An executable is specific to (platform, device kind, XLA/jax version) and to
the exact input avals (shapes, dtypes, params tree). The artifact records
all of these; ``load_artifact`` verifies them and raises with a precise
message on mismatch — callers fall back to ordinary jit compilation.

Format: one pickled dict (version-tagged). Entries hold the bytes from
``jax.experimental.serialize_executable`` keyed by an opaque string the
caller chooses (the serving daemon uses ``"{h}x{w}xb{bucket}"``).

Trust model: artifacts are pickle (as is jax's own executable serialization)
and deserialization executes code — load only operator-controlled files from
the deployment's own exporter, never user uploads.
"""

from __future__ import annotations

import pickle
from pathlib import Path
from typing import Any, Callable

_FORMAT = "crossscore-aot-v1"


def _env_meta() -> dict:
    import jax

    dev = jax.devices()[0]
    return {
        "platform": jax.default_backend(),
        "device_kind": getattr(dev, "device_kind", "unknown"),
        "jax_version": jax.__version__,
    }


def params_signature(params: Any) -> list[tuple[str, tuple, str]]:
    """Stable (path, shape, dtype) listing — pins the params tree an
    executable was compiled against (a swapped checkpoint with the same
    tree still matches; a different architecture does not)."""
    import jax

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return sorted(
        (jax.tree_util.keystr(path), tuple(x.shape), str(x.dtype))
        for path, x in flat
    )


def serialize_compiled(compiled) -> dict:
    """One artifact entry from a ``jax.jit(...).lower(...).compile()`` result.

    Records the executable's device COUNT: ``deserialize_and_load`` defaults
    its ``execution_devices`` to every local device, which rejects inputs for
    an executable compiled on a subset (e.g. a 1-device serving graph loaded
    in an 8-device process: "Expected args ... to have 8 shards, got: [1]").
    """
    from jax.experimental import serialize_executable as se

    payload, in_tree, out_tree = se.serialize(compiled)
    n_devices = len(compiled._executable.xla_executable.local_devices())
    return {
        "payload": payload,
        "in_tree": in_tree,
        "out_tree": out_tree,
        "n_devices": n_devices,
    }


def load_entry(entry: dict) -> Callable:
    """Entry -> callable with the original (pytree) calling convention."""
    import jax
    from jax.experimental import serialize_executable as se

    n = int(entry.get("n_devices", 1))
    if len(jax.devices()) < n:
        raise ValueError(
            f"executable was compiled for {n} devices, this process has "
            f"{len(jax.devices())} — re-export on a matching topology"
        )
    return se.deserialize_and_load(
        entry["payload"],
        entry["in_tree"],
        entry["out_tree"],
        execution_devices=jax.devices()[:n],
    )


def save_artifact(path: str | Path, entries: dict[str, dict], meta: dict | None = None) -> None:
    """Write entries + environment metadata atomically."""
    import os
    import threading

    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    blob = {
        "format": _FORMAT,
        "meta": {**_env_meta(), **(meta or {})},
        "entries": entries,
    }
    # unique tmp per writer: concurrent exporters/extenders writing one shared
    # artifact path must not race on a single tmp name (the token store fixed
    # the same bug — data/token_cache.py::_disk_store); last replace wins,
    # every published blob is whole
    tmp = p.with_suffix(f"{p.suffix}.tmp.{os.getpid()}.{threading.get_ident()}")
    with open(tmp, "wb") as f:
        pickle.dump(blob, f)
    tmp.replace(p)


def load_artifact(path: str | Path, expect_meta: dict | None = None,
                  with_entries: bool = False):
    """Load + verify; returns (meta, {key: callable}) — or, with
    ``with_entries=True``, (meta, fns, {key: raw entry}).

    ``expect_meta``: caller-side invariants (e.g. params signature, token
    shape) checked against the recorded meta — a mismatch raises ValueError
    naming the offending field, so an operator pointing a daemon at the
    wrong artifact gets a diagnosis, not a shape error mid-request.

    ``with_entries``: also return the raw serialized entries. Deserialized
    executables cannot re-serialize, so a caller that wants to re-export
    (extend an artifact with newly warmed graphs and save the union) must
    carry the original entries through.
    """
    with open(path, "rb") as f:
        blob = pickle.load(f)
    if not isinstance(blob, dict) or blob.get("format") != _FORMAT:
        raise ValueError(f"{path}: not a {_FORMAT} artifact")
    meta = blob["meta"]
    env = _env_meta()
    for k in ("platform", "device_kind", "jax_version"):
        if meta.get(k) != env[k]:
            raise ValueError(
                f"{path}: artifact was compiled for {k}={meta.get(k)!r}, this "
                f"process runs {k}={env[k]!r} — re-export on matching hardware"
            )
    for k, want in (expect_meta or {}).items():
        if meta.get(k) != want:
            raise ValueError(
                f"{path}: artifact {k}={meta.get(k)!r} does not match this "
                f"serving configuration ({want!r})"
            )
    fns = {key: load_entry(e) for key, e in blob["entries"].items()}
    if with_entries:
        return meta, fns, blob["entries"]
    return meta, fns


def describe(path: str | Path) -> dict:
    """Artifact metadata + entry inventory WITHOUT loading executables (no
    device/backend match needed — usable from any machine)."""
    with open(path, "rb") as f:
        blob = pickle.load(f)
    if not isinstance(blob, dict) or blob.get("format") != _FORMAT:
        raise ValueError(f"{path}: not a {_FORMAT} artifact")
    return {
        "meta": {k: v for k, v in blob["meta"].items() if k != "params_signature"},
        "params": len(blob["meta"].get("params_signature") or []),
        "entries": {
            key: {"n_devices": int(e.get("n_devices", 1)),
                  "payload_bytes": len(e["payload"])}
            for key, e in blob["entries"].items()
        },
    }


def main(argv=None) -> None:
    """``python -m crossscore_tpu.io.aot <artifact>`` — fleet-ops inspection."""
    import json
    import sys

    args = sys.argv[1:] if argv is None else argv
    if len(args) != 1:
        raise SystemExit("usage: python -m crossscore_tpu.io.aot <artifact.aot>")
    print(json.dumps(describe(args[0]), indent=2, default=str))


if __name__ == "__main__":
    main()
