"""Orbax checkpointing: params + full train state, async-capable.

The reference uses Lightning ModelCheckpoint with wall-clock interval saves
(reference ``task/train.py:117-129``, ``config/default.yaml:35-40``). Here:

- :func:`save_params` / :func:`load_params` — plain param-tree checkpoints
  (used by predict/test and the torch converter).
- :class:`CheckpointManager` — training checkpoints (params + opt state +
  step/epoch counters) with keep-all semantics, ``latest`` tracking and
  preemption-safe async saves via orbax.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Any, Optional

import orbax.checkpoint as ocp


def _to_abs(path: str | Path) -> Path:
    return Path(path).expanduser().resolve()


def save_params(path: str | Path, params: Any) -> None:
    path = _to_abs(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, params, force=True)


def load_params(path: str | Path, like: Optional[Any] = None) -> Any:
    """Restore a param tree. If ``like`` is given, restores with its
    structure/shardings (required on multi-device meshes)."""
    path = _to_abs(path)
    with ocp.StandardCheckpointer() as ckptr:
        if like is not None:
            return ckptr.restore(path, like)
        return ckptr.restore(path)


def load_params_host(path: str | Path) -> Any:
    """Restore a checkpoint tree to HOST numpy arrays, ignoring the device
    shardings it was saved under. A checkpoint written on TPU must be
    readable on a CPU-only host (and vice versa) for pure host-side
    consumers — the orbax default instead pins restore to the saving
    platform's device names and fails with "Device ... was not found".
    Used by the reverse torch converter (``io/torch_convert.py --reverse``).
    """
    import jax
    import numpy as np

    path = _to_abs(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        meta = ckptr.metadata(path).item_metadata
        restore_args = jax.tree_util.tree_map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta
        )
        return ckptr.restore(path, restore_args=restore_args)


def load_hparams(ckpt_dir: str | Path) -> Optional[dict]:
    """Read the ``hparams.yaml`` stored next to a checkpoint directory's
    steps, or None for checkpoints written before hparams persistence."""
    path = _to_abs(ckpt_dir) / "hparams.yaml"
    if not path.exists():
        return None
    import yaml

    return yaml.safe_load(path.read_text())


class CheckpointManager:
    """Training checkpoint manager with wall-clock-interval saves.

    Mirrors the reference cadence semantics: ``train_time_interval`` hours
    between saves, ``save_last`` on exit, keep-all (``save_top_k=-1``).
    """

    def __init__(
        self,
        directory: str | Path,
        train_time_interval_hours: Optional[float] = 2.0,
        every_n_train_steps: Optional[int] = None,
        every_n_epochs: Optional[int] = None,
        hparams: Optional[dict] = None,
    ):
        """``hparams``: the composed config dict that produced this run. It is
        written once as ``<dir>/hparams.yaml`` so a checkpoint can be
        interpreted and safely resumed without out-of-band knowledge
        (Lightning embeds it via ``save_hyperparameters``, reference
        ``task/core.py:170``)."""
        self.directory = _to_abs(directory)
        self.directory.mkdir(parents=True, exist_ok=True)
        if hparams is not None:
            import yaml

            (self.directory / "hparams.yaml").write_text(
                yaml.safe_dump(hparams, sort_keys=False)
            )
        self.interval_s = (
            train_time_interval_hours * 3600 if train_time_interval_hours else None
        )
        self.every_n_train_steps = every_n_train_steps
        self.every_n_epochs = every_n_epochs
        self._last_save_t = time.monotonic()
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=None, enable_async_checkpointing=True),
        )

    def should_save(
        self, step: int, epoch_end: bool = False, epoch: int = 0,
        wall_clock: bool = True,
    ) -> bool:
        """``wall_clock=False`` restricts the decision to the step/epoch
        cadences, which are deterministic functions of (config, step) and
        therefore uniform across processes; the wall-clock interval is a
        per-host clock and multi-host callers must agree on it separately
        (:meth:`wall_clock_due` + a broadcast — orbax saves of global arrays
        are collective, so every process must reach save() together)."""
        if self.every_n_train_steps and step > 0 and step % self.every_n_train_steps == 0:
            return True
        if epoch_end and self.every_n_epochs and (epoch + 1) % self.every_n_epochs == 0:
            return True
        return wall_clock and self.wall_clock_due()

    def wall_clock_due(self) -> bool:
        return (
            self.interval_s is not None
            and time.monotonic() - self._last_save_t >= self.interval_s
        )

    def save(self, step: int, state: Any, force: bool = False) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state), force=force)
        self._last_save_t = time.monotonic()

    def restore(self, step: Optional[int], like: Any) -> Any:
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"No checkpoint found in {self.directory}")
        return self._mgr.restore(step, args=ocp.args.StandardRestore(like))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()
