"""Host input pipeline: multi-threaded decode + prefetch feeding the device.

Replaces the reference's torch ``DataLoader`` stack (reference
``task/train.py:86-103``: 6 workers, pin_memory, prefetch_factor 2). Design:

- Items are pure functions of (epoch, index): the RNG for sampling/crops is
  folded from ``(seed, epoch, index)``, so any batch is reproducible in
  isolation and multi-host sharding cannot skew distributions.
- A thread pool decodes PNGs concurrently (PIL releases the GIL during
  decode); whole batches are assembled ahead of time into a bounded prefetch
  queue so the accelerator never waits on the host.
- Fixed output shapes per (crop_size, K) so the jitted graph never recompiles.
  The final partial batch is padded by repeating the last item; the true count
  travels in ``batch["_valid"]``.
- Optional ``sharding``: completed batches are pushed to device asynchronously
  (`jax.device_put` with a NamedSharding), overlapping H2D with compute.
- Multi-host: pass ``shard_index/num_shards`` to partition the index space
  (replaces Lightning's DistributedSampler).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator

import numpy as np


_PERM_SENTINEL = 2**31  # index slot used for the epoch permutation RNG


class _ProducerError:
    def __init__(self, exc: BaseException):
        self.exc = exc


def _fold_rng(seed: int, epoch: int, index: int) -> np.random.Generator:
    return np.random.default_rng(np.random.SeedSequence([seed, epoch, index]))


def prepare_global_shard(batch: dict, bs: int) -> dict:
    """Host-side prep for a batch that is one process's SHARD of a global one.

    On a mesh spanning multiple processes every jitted-call operand must be a
    global array assembled from each process's local rows; a host scalar that
    differs by process — the ``_valid`` prefix count — must never ride into
    the jitted call (the single program would receive divergent values per
    process). The prefix count therefore becomes a per-row ``_valid_mask``
    that assembles like any other batch array, while ``_valid`` stays behind
    as a plain python int for host-side consumers (writers, metric weights).
    A shared ``(2,)`` ``_valid_hw`` is promoted to the per-item ``(B, 2)``
    form for the same reason.
    """
    out = dict(batch)
    # derived lengths follow the ACTUAL row count: with pad_last=False a
    # short final batch has fewer than bs rows, and bs-long derived arrays
    # would mismatch the rows shipped via make_array_from_process_local_data
    rows = next(
        (v.shape[0] for v in out.values()
         if isinstance(v, np.ndarray) and v.ndim > 0),
        bs,
    )
    n_valid = out.get("_valid")
    if n_valid is not None:
        n = int(n_valid)
        out["_valid"] = n  # host-only from here on
        out["_valid_mask"] = (np.arange(rows) < n).astype(np.float32)
    vhw = out.get("_valid_hw")
    if vhw is not None and getattr(vhw, "ndim", 0) == 1:
        out["_valid_hw"] = np.tile(np.asarray(vhw)[None], (rows, 1))
    return out


def _ship(batch: dict, sharding, bs: int) -> dict:
    """Push a collated batch to device under ``sharding``.

    Fully-addressable shardings (single process, or host-local meshes) take
    the plain ``device_put`` path. A sharding over a mesh that spans
    processes means each process's batch is its shard of the global batch:
    ``device_put`` would instead treat it as the whole global value and slice
    out only the local rows — each process feeding a DIFFERENT "global"
    array, silently training on 1/P of the decoded data — so those batches
    are assembled with ``jax.make_array_from_process_local_data``.
    """
    import jax

    if getattr(sharding, "is_fully_addressable", True):
        return {
            k: (jax.device_put(v, sharding) if isinstance(v, np.ndarray) and v.ndim > 0 else v)
            for k, v in batch.items()
        }
    batch = prepare_global_shard(batch, bs)
    return {
        k: (jax.make_array_from_process_local_data(sharding, v)
            if isinstance(v, np.ndarray) and v.ndim > 0 else v)
        for k, v in batch.items()
    }


def collate(items: list[dict]) -> dict:
    """Stack item dicts into batch arrays; item_paths collates to lists."""
    out: dict = {}
    for key in items[0]:
        if key == "item_paths":
            paths = [it["item_paths"] for it in items]
            out["item_paths"] = {
                "query/img": [p["query/img"] for p in paths],
                "query/score_map": [p["query/score_map"] for p in paths],
                # (K, B) transposed layout, matching the reference batch format
                "reference/cross/imgs": [
                    [p["reference/cross/imgs"][k] for p in paths]
                    for k in range(len(paths[0]["reference/cross/imgs"]))
                ],
            }
        else:
            out[key] = np.stack([it[key] for it in items])
    return out


class Loader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        num_workers: int = 6,
        prefetch_batches: int = 2,
        seed: int = 0,
        drop_last: bool = False,
        pad_last: bool = True,
        shard_index: int = 0,
        num_shards: int = 1,
        sharding=None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.prefetch_batches = max(1, prefetch_batches)
        self.seed = seed
        self.drop_last = drop_last
        self.pad_last = pad_last
        self.shard_index = shard_index
        self.num_shards = num_shards
        self.sharding = sharding

    def _epoch_indices(self, epoch: int) -> tuple[np.ndarray, int]:
        """This shard's index list and its count of non-duplicate entries.

        Multi-host: the index space is padded by wrap-around so every shard
        sees the same number of samples (reference DistributedSampler
        semantics, ``task/train.py:111``) — trimming would silently never
        evaluate up to num_shards-1 samples. The wrapped duplicates land at
        the END of the shard's list (strided split of a tail-padded array),
        so the ``_valid`` prefix count of the final batch excludes them and
        eval metrics/writers still see every sample exactly once.
        """
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            idx = _fold_rng(self.seed, epoch, _PERM_SENTINEL).permutation(n)
        if self.num_shards > 1:
            total = -(-n // self.num_shards) * self.num_shards
            # np.resize wraps cyclically, so this also covers datasets
            # SMALLER than the shard count (total - n > n), where a single
            # concat of idx[:total-n] would come up short and leave shards
            # with unequal lengths (desynchronising the per-process step
            # counts that feed collective reductions)
            padded = np.resize(idx, total)
            local = padded[self.shard_index :: self.num_shards]
            global_pos = self.shard_index + np.arange(len(local)) * self.num_shards
            return local, int(np.sum(global_pos < n))
        return idx, n

    def batches_per_epoch(self) -> int:
        return len(self._plan(0))

    def _plan(self, epoch: int) -> list:
        """Batch plan: list of (index_chunk, n_valid, extra) — ``extra`` is an
        opaque dict handed to :meth:`_finalize` (used by ShapeBucketedLoader)."""
        indices, n_real = self._epoch_indices(epoch)
        n = len(indices)
        bs = self.batch_size
        plan = []
        for start in range(0, n, bs):
            chunk = indices[start : start + bs]
            if len(chunk) < bs and self.drop_last:
                continue
            # non-duplicate prefix length of this chunk (see _epoch_indices)
            plan.append((chunk, max(0, min(len(chunk), n_real - start)), None))
        return plan

    def _finalize(self, batch: dict, extra) -> dict:
        """Post-collate hook (subclasses pad to shape buckets here)."""
        return batch

    def _pre_collate(self, items: list, extra) -> list:
        """Per-item hook before collation (subclasses pad mixed-shape items
        to a common bucket here so they stack)."""
        return items

    def epoch(self, epoch: int = 0, start_batch: int = 0) -> Iterator[dict]:
        """Yield collated (optionally device-sharded) batches for one epoch.

        ``start_batch`` skips the first N batches without decoding them —
        used for exact mid-epoch resume (items are pure functions of
        (seed, epoch, index), so the skipped prefix is identical to what the
        interrupted run consumed)."""
        bs = self.batch_size
        batch_slices = self._plan(epoch)[start_batch:]

        out_q: queue.Queue = queue.Queue(maxsize=self.prefetch_batches)
        stop = threading.Event()

        def put_checked(item) -> bool:
            """put that aborts when the consumer has gone away (early break)."""
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            try:
                _produce_inner()
            except BaseException as e:  # surface worker errors to the consumer
                put_checked(_ProducerError(e))

        def _produce_inner():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for chunk, n_valid, extra in batch_slices:
                    if stop.is_set():
                        break
                    items = list(
                        pool.map(
                            lambda i: self.dataset.get_item(
                                int(i), _fold_rng(self.seed, epoch, int(i))
                            ),
                            chunk,
                        )
                    )
                    if len(items) < bs and self.pad_last:
                        items = items + [items[-1]] * (bs - len(items))
                    batch = self._finalize(
                        collate(self._pre_collate(items, extra)), extra
                    )
                    batch["_valid"] = np.asarray(n_valid, np.int32)
                    if self.sharding is not None:
                        batch = _ship(batch, self.sharding, bs)
                    if not put_checked(batch):
                        return
            try:
                out_q.put_nowait(None)
            except queue.Full:
                pass  # consumer is draining; it checks producer liveness

        producer = threading.Thread(target=produce, daemon=True)
        producer.start()
        try:
            producer_done = False
            while True:
                try:
                    batch = out_q.get(timeout=0.5)
                except queue.Empty:
                    if producer_done:
                        break
                    # the producer can enqueue its final batch(es) and exit
                    # in the window between our timeout firing and this
                    # liveness check — don't break yet; make one more full
                    # get() pass first (the queue cannot grow after producer
                    # death, so a second Empty then means true EOF)
                    producer_done = not producer.is_alive()
                    continue
                if batch is None:
                    break
                if isinstance(batch, _ProducerError):
                    raise batch.exc
                yield batch
        finally:
            stop.set()
            # unblock and reap the producer so no pool threads linger
            while producer.is_alive():
                try:
                    out_q.get_nowait()
                except queue.Empty:
                    pass
                producer.join(timeout=0.2)
