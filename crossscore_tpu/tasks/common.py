"""Shared task-entry plumbing: CLI parsing, param loading, run dirs, logging."""

from __future__ import annotations

import json
import sys
import time
from datetime import datetime
from pathlib import Path
from typing import Optional

import numpy as np

from crossscore_tpu.confsys import Config, load_config, set_key


def tristate(value) -> str:
    """Normalise an on|off|auto config knob. CLI overrides parse with YAML
    scalar semantics, so ``key=on`` arrives as True and ``key=off`` as False
    (YAML 1.1 booleans) — compare through this, never against raw strings."""
    if value is True:
        return "on"
    if value is False:
        return "off"
    return str(value).lower()


def parse_cli(config_name: str, argv: Optional[list[str]] = None) -> Config:
    """Hydra-style CLI: every argument is a ``key.sub=value`` override
    (or ``group=choice`` to swap a config group; ``--help`` prints the
    composed config)."""
    argv = sys.argv[1:] if argv is None else argv
    if any(a in ("--help", "-h", "help") for a in argv):
        import yaml

        cfg = load_config(config_name, overrides=[a for a in argv if "=" in a])
        print(
            f"usage: override any key below as key.sub=value "
            f"(root config: {config_name}.yaml)\n"
        )
        print(yaml.safe_dump(cfg.to_dict(), sort_keys=False))
        sys.exit(0)
    return load_config(config_name, overrides=argv)


def timestamp() -> str:
    return datetime.now().strftime("%Y%m%d_%H%M%S.%f")


def resolve_limit(limit, batches_per_epoch: int) -> Optional[int]:
    """Lightning limit_*_batches semantics: int = number of batches,
    float = fraction of the epoch (1.0 = everything)."""
    if isinstance(limit, bool):
        raise ValueError(f"invalid limit {limit!r}")
    if isinstance(limit, int):
        return int(limit)
    if isinstance(limit, float):
        return None if limit >= 1.0 else int(limit * batches_per_epoch)
    return None


def confirm_batch_size(cfg: Config, loader_key: str = "validation") -> None:
    """Full-resolution images at a large batch can OOM; the reference asks on
    stdin (``task/predict.py:27-45``). We prompt only when interactive,
    otherwise warn and proceed (set ``this_main.force_batch_size=true`` to
    silence)."""
    bs = cfg.data.loader[loader_key].batch_size
    if cfg.this_main.force_batch_size or bs <= 8 or cfg.this_main.crop_mode is not None:
        return
    msg = (f"Running full image resolution with batch_size={bs}. "
           "Press Enter to continue, or enter a new batch size: ")
    if sys.stdin is not None and sys.stdin.isatty():
        tmp = input(msg)
        if tmp.strip():
            if not tmp.strip().isdigit():
                raise ValueError("Invalid input")
            cfg.data.loader[loader_key].batch_size = int(tmp)
            print(f"Set batch size to {tmp}")
    else:
        print(f"WARNING: {msg} (non-interactive; proceeding)")


def apply_accelerator(cfg: Config) -> None:
    """Honour ``trainer.accelerator`` (cpu | tpu | auto). Must run before the
    first jax computation. Note: in this environment the JAX_PLATFORMS env var
    is pinned externally — the config API is the only reliable override."""
    accel = cfg.trainer.get("accelerator", "auto")
    if accel == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")


def resolve_out_dir(cfg: Config, phase: str) -> Path:
    """Reference semantics (``task/predict.py:47-65``): out dir derives from
    the checkpoint location, or a fresh log/<ts> tree when no ckpt is given."""
    if cfg.trainer.ckpt_path_to_load is None:
        log_dir = Path("log") / timestamp() / f"{phase}_empty_ckpt"
    else:
        log_dir = Path(cfg.trainer.ckpt_path_to_load).parents[1] / phase
    log_dir.mkdir(parents=True, exist_ok=True)

    configured = cfg.logger[phase].out_dir
    if configured is None:
        out_dir = log_dir / timestamp()
        if cfg.alias:
            out_dir = Path(str(out_dir) + f"_{cfg.alias}")
        set_key(cfg, f"logger.{phase}.out_dir", str(out_dir))
    out_dir = Path(cfg.logger[phase].out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    save_config_snapshot(cfg, out_dir)
    return out_dir


def save_config_snapshot(cfg: Config, out_dir: Path) -> Path:
    """Persist the COMPOSED config into the run/out dir, making every archived
    run self-describing (hydra writes ``.hydra/config.yaml`` into each run dir,
    reference ``config/default.yaml:6-8``; this repo had no equivalent)."""
    import yaml

    path = Path(out_dir) / "config.yaml"
    path.write_text(yaml.safe_dump(cfg.to_dict(), sort_keys=False))
    return path


def config_diff(old, new, prefix: str = "") -> list[str]:
    """Recursive leaf-level diff of two nested config dicts, as
    ``key.path: old -> new`` lines (used by the resume mismatch warning)."""
    lines: list[str] = []
    keys = sorted(set(old) | set(new)) if isinstance(old, dict) and isinstance(new, dict) else None
    if keys is None:
        if old != new:
            lines.append(f"{prefix}: {old!r} -> {new!r}")
        return lines
    for k in keys:
        p = f"{prefix}.{k}" if prefix else str(k)
        if k not in old:
            lines.append(f"{p}: <absent> -> {new[k]!r}")
        elif k not in new:
            lines.append(f"{p}: {old[k]!r} -> <absent>")
        else:
            lines.extend(config_diff(old[k], new[k], p))
    return lines


def load_model_params(cfg: Config, model, example_batch) -> dict:
    """Load params from cfg.trainer.ckpt_path_to_load:

    - ``*.ckpt``  -> torch Lightning checkpoint, converted on the fly
    - directory   -> orbax checkpoint (params tree, or a train-state dir
                     written by tasks/train.py whose ``params`` subtree is used)
    - null        -> randomly initialised (warns loudly)
    """
    import jax

    ckpt = cfg.trainer.ckpt_path_to_load
    refs = example_batch.get("reference/cross/imgs")
    init_params = model.init(
        jax.random.PRNGKey(cfg.seed),
        example_batch["query/img"][:1],
        refs[:1] if refs is not None else None,
    )["params"]

    if ckpt is None:
        print("WARNING: no checkpoint given (trainer.ckpt_path_to_load=null); "
              "using RANDOM weights.")
        return init_params

    ckpt = Path(ckpt)
    if ckpt.suffix == ".ckpt":
        from crossscore_tpu.io.torch_convert import load_torch_checkpoint, convert_lightning_ckpt

        sd = load_torch_checkpoint(str(ckpt))
        vit = model.cfg.backbone
        params = convert_lightning_ckpt(
            sd,
            num_backbone_layers=vit.num_layers,
            num_decoder_layers=model.cfg.decoder_layers,
            d_model=vit.hidden_size,
            do_self_attn=model.cfg.do_self_attn,
        )
        return jax.tree_util.tree_map(lambda i, p: np.asarray(p, dtype=i.dtype), init_params, params)

    from crossscore_tpu.io.checkpoint import load_params, load_params_host

    if ckpt.is_dir():
        steps = sorted(
            int(p.name) for p in ckpt.iterdir() if p.is_dir() and p.name.isdigit()
        )
        if steps:
            # a CheckpointManager directory (tasks/train.py cadence saves,
            # layout ckpt/<step>/default/<train state>): evaluate the LATEST
            # step — the reference points test/predict at a single .ckpt the
            # same way (task/test.py:134)
            ckpt = ckpt / str(steps[-1])
        if (ckpt / "default").is_dir():
            ckpt = ckpt / "default"  # the manager's single-item name
    try:
        restored = load_params(ckpt, like=init_params)
    except Exception:
        # a train-STATE checkpoint (step/params/opt_state — structure
        # mismatch vs the bare params `like`), or a save from another
        # platform: restore on host, then take the params subtree below
        restored = load_params_host(ckpt)
    if isinstance(restored, dict) and "params" in restored and "backbone" not in restored:
        restored = restored["params"]
    return jax.tree_util.tree_map(
        lambda i, p: np.asarray(p, dtype=i.dtype), init_params, restored
    )


def crop_bucketed(batch: dict, outputs: dict) -> tuple[dict, dict]:
    """Crop bucket-padded batch arrays and model outputs back to the item's
    true shape for writers/visualisers/summarisers. No-op without
    ``_valid_hw`` (see data/bucketing.py). Images crop to (h, w); score maps
    to the jigsaw extent (h//14*14, w//14*14); attention-weight maps to the
    valid patch grid."""
    import numpy as np

    vhw = batch.get("_valid_hw")
    if vhw is None:
        return batch, outputs
    h, w = int(vhw[0]), int(vhw[1])
    ch, cw = h // 14 * 14, w // 14 * 14
    gh, gw = h // 14, w // 14
    b2 = dict(batch)
    for k in ("query/img", "reference/cross/imgs"):
        if k in b2 and b2[k] is not None:
            b2[k] = np.asarray(b2[k])[..., :h, :w, :]
    if "query/score_map" in b2:
        b2["query/score_map"] = np.asarray(b2["query/score_map"])[..., :ch, :cw]
    o2 = dict(outputs)
    if "score_map_ref_cross" in o2:
        o2["score_map_ref_cross"] = np.asarray(o2["score_map_ref_cross"])[:, :ch, :cw]
    if "attn_weights_map_ref_cross" in o2:
        o2["attn_weights_map_ref_cross"] = np.asarray(
            o2["attn_weights_map_ref_cross"]
        )[:, :gh, :gw, :, :gh, :gw]
    return b2, o2


def iter_bucketed_items(batch: dict, outputs: dict):
    """Split a bucket-PACKED batch (per-item ``_valid_hw`` of shape (B, 2),
    data/bucketing.py) into individually-cropped B=1 slices for host-side
    consumers (summariser/writer/visualiser — none of which can represent a
    batch of mixed image sizes as one array). Yields (i, item_batch,
    item_outputs) for the valid (non-padding-duplicate) items."""
    import numpy as np

    n_valid = int(batch.get("_valid", len(batch["item_paths"]["query/img"])))
    vhw = np.asarray(batch["_valid_hw"])

    def slice_item(tree, i):
        if isinstance(tree, dict):
            return {k: slice_item(v, i) for k, v in tree.items()}
        if isinstance(tree, list):
            return [tree[i]]
        arr = np.asarray(tree)
        if arr.ndim == 0:
            return tree
        return arr[i:i + 1]

    for i in range(n_valid):
        b1 = {k: slice_item(v, i) for k, v in batch.items()
              if k not in ("_valid", "_valid_hw")}
        b1["_valid"] = np.asarray(1, np.int32)
        b1["_valid_hw"] = vhw[i]
        o1 = {k: np.asarray(v)[i:i + 1] for k, v in outputs.items()}
        yield i, *crop_bucketed(b1, o1)


def device_view(batch: dict) -> dict:
    """Strip host-only keys from a loader batch before a jitted call.

    When the loader assembles GLOBAL multi-host batches, ``_valid`` stays
    behind as a plain python int (its device form is the per-row
    ``_valid_mask``); feeding the per-process-divergent int into the single
    jitted program would break SPMD. Single-process batches (no
    ``_valid_mask``) pass through untouched."""
    if "_valid_mask" not in batch:
        return batch
    return {k: v for k, v in batch.items() if k not in ("_valid", "item_paths")}


def host_rows(x):
    """This process's batch rows of a (possibly global) array, as numpy.

    Fully-addressable or fully-replicated arrays fetch directly. A
    data-sharded GLOBAL array (multi-host) cannot be fetched whole from one
    process — its addressable shards are exactly this process's rows (the
    rows this process contributed via ``make_array_from_process_local_data``),
    so they are concatenated in global-index order. Only valid for arrays
    sharded (or replicated) along axis 0."""
    import numpy as np

    if isinstance(x, np.ndarray):
        return x
    # only a genuinely non-fetchable sharding takes the shard-concat path —
    # a bare try/except here would mask unrelated np.asarray failures (host
    # OOM, tunnel RPC errors) as "non-addressable" and corrupt downstream
    if getattr(x, "is_fully_addressable", True) or getattr(
        x, "is_fully_replicated", False
    ):
        return np.asarray(x)
    return _concat_addressable_rows(x)


def _concat_addressable_rows(x):
    """Concatenate a jax Array's addressable shards in global-row order,
    deduping replicas (e.g. shards repeated over a model axis)."""
    import numpy as np

    rows = {}
    for s in x.addressable_shards:
        # the start-index dedupe below assumes axis-0-only sharding; a shard
        # split along a non-leading axis would silently contribute a subset
        # of columns — fail loudly instead
        if any(sl != slice(None) for sl in s.index[1:]):
            raise ValueError(
                "host_rows: array is sharded along a non-leading axis; only "
                f"axis-0 (batch) sharding is supported, got index {s.index}"
            )
        start = s.index[0].start or 0
        if start not in rows:
            rows[start] = s
    return np.concatenate(
        [np.asarray(rows[k].data) for k in sorted(rows)], axis=0
    )


def host_batch(batch: dict) -> dict:
    """Host (numpy) view of this process's rows of a loader batch — for
    visualisers/writers that pair batch arrays with the process-local
    ``item_paths``. Single-process: returns the batch unchanged (the
    consumers np.asarray on demand)."""
    import jax

    if jax.process_count() == 1:
        return batch
    return {
        k: (host_rows(v) if hasattr(v, "addressable_shards") else v)
        for k, v in batch.items()
    }


def all_process_weighted_mean(series: list, weights: list) -> list:
    """Weighted means of one or more metric series, all-reduced across hosts.

    Equivalent of the reference's ``self.log(..., sync_dist=True)`` epoch
    reduction (reference ``task/core.py:449``): each process contributes
    (sum(w*x), sum(w)) and the global mean is computed from the summed
    numerators/denominators, so the result covers every host's data. On a
    single process this degenerates to the local weighted mean.
    """
    import numpy as np

    w = np.asarray(weights, np.float64)
    sums = np.asarray([float(np.sum(w * np.asarray(s, np.float64))) for s in series]
                      + [float(w.sum())])
    import jax

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        sums = np.asarray(multihost_utils.process_allgather(sums)).sum(axis=0)
    denom = max(sums[-1], 1e-12)
    return [float(s / denom) for s in sums[:-1]]


class JsonlLogger:
    """Scalar metric logging to <run_dir>/metrics.jsonl (+ optional wandb)."""

    def __init__(self, run_dir: Path, cfg: Config, use_wandb: bool = False):
        self.path = Path(run_dir) / "metrics.jsonl"
        self.f = open(self.path, "a")
        self.wandb = None
        if use_wandb:
            try:
                import wandb

                self.wandb = wandb.init(project=cfg.project.name, dir=str(run_dir))
            except Exception as e:  # offline env: fall back to jsonl only
                print(f"wandb unavailable ({e}); logging to {self.path} only")

    def log(self, metrics: dict, step: int):
        row = {"step": step, "time": time.time()}
        row.update({k: float(v) for k, v in metrics.items()})
        self.f.write(json.dumps(row) + "\n")
        self.f.flush()
        if self.wandb is not None:
            self.wandb.log(metrics, step=step)

    def log_histogram(self, name: str, values, step: int):
        """Real ``wandb.Histogram`` channel (reference ``task/core.py:351-362``
        logs histograms of scores and L1 diffs); jsonl gets the 10-bin counts."""
        import numpy as np

        counts, edges = np.histogram(np.asarray(values).reshape(-1), bins=10)
        self.log({f"{name}_{i}": float(c) for i, c in enumerate(counts)}, step)
        if self.wandb is not None:
            import wandb

            self.wandb.log(
                {name: wandb.Histogram(np_histogram=(counts, edges))}, step=step
            )

    def log_figure(self, name: str, fig, step: int):
        """wandb figure-image channel (reference ``task/core.py:325-329`` logs
        matplotlib figures as wandb.Image); no-op without wandb — figures are
        always also written to disk by the caller."""
        if self.wandb is not None:
            import wandb

            self.wandb.log({name: wandb.Image(fig)}, step=step)

    def close(self):
        self.f.close()
        if self.wandb is not None:
            self.wandb.finish()
