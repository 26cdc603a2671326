"""Record-file packing for at-scale ingestion of the 2 TB training corpus.

The reference trains from ~2 TB of individual PNGs (reference
``README.md:53-57``), which at production batch sizes means hundreds of
open()+read() syscalls and random seeks per step. This module packs the
corpus into a handful of large shard files with a compact binary index so the
host pipeline does large sequential reads (the Grain/array_record idea,
without the dependency):

- ``pack``: walks a dataset root, appends each file's raw bytes into
  ``shard-NNNNN.bin`` files (default 512 MB), and writes ``index.npz``
  (keys + per-record shard/offset/length arrays). Payloads stay PNG-encoded —
  decode cost is unchanged, the win is IO locality and file-handle pressure.
- ``RecordStore``: memory-maps nothing and keeps one fd per shard; ``read``
  uses ``os.pread`` (thread-safe, no seek contention across loader workers).

CLI::

    python -m crossscore_tpu.data.pack <dataset_root> <out_dir> [shard_mb]

Datasets opt in with ``data.dataset.record_dir=<out_dir>``; keys are POSIX
paths relative to the dataset root, so the same NvsDataset index logic works
unchanged (split.json etc. stay on the filesystem).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Iterable, Optional

import numpy as np

_INDEX = "index.npz"


class RecordWriter:
    def __init__(self, out_dir: str | Path, shard_mb: int = 512):
        self.out_dir = Path(out_dir)
        self.out_dir.mkdir(parents=True, exist_ok=True)
        self.shard_bytes = shard_mb * 1024 * 1024
        self._keys: list[str] = []
        self._shard: list[int] = []
        self._offset: list[int] = []
        self._length: list[int] = []
        self._cur_idx = -1
        self._cur_f = None
        self._cur_size = 0
        self._roll()

    def _roll(self):
        if self._cur_f is not None:
            self._cur_f.close()
        self._cur_idx += 1
        self._cur_f = open(self.out_dir / f"shard-{self._cur_idx:05d}.bin", "wb")
        self._cur_size = 0

    def write(self, key: str, payload: bytes) -> None:
        if self._cur_size > 0 and self._cur_size + len(payload) > self.shard_bytes:
            self._roll()
        self._keys.append(key)
        self._shard.append(self._cur_idx)
        self._offset.append(self._cur_size)
        self._length.append(len(payload))
        self._cur_f.write(payload)
        self._cur_size += len(payload)

    def close(self) -> None:
        self._cur_f.close()
        np.savez(
            self.out_dir / _INDEX,
            keys=np.asarray("\n".join(self._keys).encode()),
            shard=np.asarray(self._shard, np.uint32),
            offset=np.asarray(self._offset, np.uint64),
            length=np.asarray(self._length, np.uint64),
        )

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class RecordStore:
    """Read side: one fd per shard, thread-safe pread access by key."""

    def __init__(self, directory: str | Path):
        self.directory = Path(directory)
        with np.load(self.directory / _INDEX) as idx:
            keys = bytes(idx["keys"]).decode().split("\n")
            self._index = {
                k: (int(s), int(o), int(n))
                for k, s, o, n in zip(keys, idx["shard"], idx["offset"], idx["length"])
            }
        n_shards = 1 + max((s for s, _, _ in self._index.values()), default=-1)
        self._fds = [
            os.open(self.directory / f"shard-{i:05d}.bin", os.O_RDONLY)
            for i in range(n_shards)
        ]

    def __contains__(self, key: str) -> bool:
        return key in self._index

    def __len__(self) -> int:
        return len(self._index)

    def keys(self):
        return self._index.keys()

    def read(self, key: str) -> bytes:
        shard, offset, length = self._index[key]
        return os.pread(self._fds[shard], length, offset)

    def close(self) -> None:
        for fd in self._fds:
            os.close(fd)
        self._fds = []


def pack(
    root: str | Path,
    out_dir: str | Path,
    shard_mb: int = 512,
    patterns: Iterable[str] = ("*.png", "*.jpg", "*.jpeg"),
    verbose: bool = True,
) -> int:
    """Pack every image under ``root`` into shards at ``out_dir``.

    Returns the number of records. Keys are POSIX relative paths; files are
    walked in sorted order so records of one scene/iteration are contiguous
    (sequential reads during in-order evaluation)."""
    root = Path(root)
    files: list[Path] = []
    for pat in patterns:
        files.extend(root.rglob(pat))
    files = sorted(set(files))
    with RecordWriter(out_dir, shard_mb=shard_mb) as w:
        for f in files:
            w.write(f.relative_to(root).as_posix(), f.read_bytes())
    if verbose:
        total = sum(f.stat().st_size for f in files)
        print(
            f"packed {len(files)} files ({total / 2**20:.1f} MB) from {root} "
            f"into {out_dir} ({w._cur_idx + 1} shard(s))"
        )
    return len(files)
