"""Reference-token cache: encode each reference image through the frozen
backbone ONCE per predict run.

The reference pipeline re-encodes every reference view for every query
(reference ``task/core.py:119-161`` — 1+K ViT forwards per score map; K=8 in
the demo config), although the backbone is frozen and reference sets overlap
heavily across queries (``task/predict.py`` + ``simple_reference.py`` reuse
one reference directory for ALL queries). A frozen backbone makes reference
embeddings a pure function of the image file, so this cache turns predict
into 1 ViT forward per map + a decoder pass once the cache is warm — a
(1+K)x backbone-compute reduction. Exactness: cached tokens are reused
verbatim, so score-map outputs are byte-identical; full-precision metrics
match to float reduction-order noise (~3e-8 relative — the backbone runs on
encode_batch chunks instead of one B*(1+K) call, and XLA reductions are not
bitwise batch-shape-invariant). Pinned by tests/test_token_cache.py.

Design notes (TPU):
- misses are encoded in fixed-size batches (padded on the last chunk) so the
  encoder compiles ONE graph regardless of miss count.
- tokens are kept host-side as (N_patch, D) bf16-as-uint16 numpy arrays
  (~1 MB each at 518 px); the assembled (B, K, N, D) batch is device_put by
  the caller's jitted step. LRU eviction bounds host RAM.
- cache keys are (path, mtime, pixel-shape): a frozen backbone plus
  deterministic predict-path cropping (CLAUDE.md host-RNG rules) make that
  sufficient; mtime guards against files rewritten mid-run.
"""

from __future__ import annotations

import os
import threading
from collections import OrderedDict
from pathlib import Path
from typing import Callable

import numpy as np


class RefTokenCache:
    def __init__(
        self,
        encode_fn: Callable[[np.ndarray], np.ndarray],
        encode_batch: int = 16,
        max_items: int = 2048,
        persist_dir=None,
    ):
        """:param encode_fn: jitted ``(B, H, W, 3) -> (B, N_patch, D)`` frozen
            backbone (``models.crossscore.make_backbone_encoder``).
        :param encode_batch: fixed miss-encoding batch (one compiled graph).
        :param max_items: RAM LRU bound (~1 MB/item at 518 px, D=384).
        :param persist_dir: optional directory for a DISK-backed store —
            tokens survive process restarts (restart-warm serving). Keys
            include the file mtime, so re-rendered references re-encode; the
            CALLER must key the directory by checkpoint identity (different
            weights produce different tokens)."""
        self._encode = encode_fn
        self._batch = int(encode_batch)
        self._max = int(max_items)
        self._cache: OrderedDict[tuple, np.ndarray] = OrderedDict()
        # loader WORKER threads touch the LRU (has -> _disk_load -> _put,
        # which evicts) concurrently with the producer thread's gather();
        # individual dict ops are GIL-atomic but check-then-act sequences
        # (membership test -> move_to_end, eviction between gather's skip
        # validation and the final _get) are not. The critical sections are
        # microseconds against ms-scale decode/encode work, so one lock.
        self._lock = threading.Lock()
        self._dir = Path(persist_dir) if persist_dir else None
        if self._dir is not None:
            self._dir.mkdir(parents=True, exist_ok=True)
            # best-effort sweep of tmp files orphaned by crashed writers
            # (stale = older than an hour; live writers replace within ms)
            import time as _time

            cutoff = _time.time() - 3600
            for t in self._dir.glob("*.tmp.*.npz"):
                try:
                    if t.stat().st_mtime < cutoff:
                        t.unlink()
                except OSError:
                    pass  # another sweeper got it first
        self.hits = 0
        self.misses = 0
        self.skipped_decodes = 0  # slots whose host decode was skipped
        self.disk_hits = 0

    @staticmethod
    def _key(path: str, hw: tuple, valid: "tuple | None" = None) -> tuple:
        """``hw``: the pixel shape the encoder sees (the BUCKET shape under
        shape-bucketed serving); ``valid``: the item's true (h, w) when the
        pixels are bucket-padded — tokens are a function of (pixels, mask), so
        both belong in the key."""
        try:
            mtime = Path(path).stat().st_mtime_ns
        except OSError:
            mtime = 0
        key = (path, mtime, (int(hw[0]), int(hw[1])))
        if valid is not None and tuple(int(v) for v in valid) != key[2]:
            key = key + ((int(valid[0]), int(valid[1])),)
        return key

    # ------------------------------------------------------- disk persistence

    def _disk_path(self, key: tuple) -> "Path":
        import hashlib

        return self._dir / (hashlib.sha1(repr(key).encode()).hexdigest() + ".npz")

    def _disk_load(self, key: tuple):
        """RAM-miss fallback: pull from the persistent store if present."""
        if self._dir is None:
            return None
        p = self._disk_path(key)
        if not p.exists():
            return None
        try:
            with np.load(p) as z:
                arr = np.frombuffer(
                    z["data"].tobytes(), dtype=np.dtype(str(z["dtype"]))
                ).reshape(z["shape"])
        except Exception:
            return None  # partial/corrupt write: treat as miss, re-encode
        self.disk_hits += 1
        self._put(key, arr, write_disk=False)
        return arr

    def _disk_store(self, key: tuple, tokens: np.ndarray) -> None:
        p = self._disk_path(key)
        # unique tmp per writer: concurrent processes/threads encoding the
        # same reference must not race on one tmp name (the loser's replace
        # would raise FileNotFoundError); last replace wins, all are whole
        tmp = p.with_suffix(f".tmp.{os.getpid()}.{threading.get_ident()}.npz")
        np.savez(
            tmp,
            data=np.ascontiguousarray(tokens).view(np.uint8),
            shape=np.asarray(tokens.shape),
            dtype=str(tokens.dtype),
        )
        tmp.replace(p)  # atomic within the filesystem

    def has(self, path: str, hw: tuple) -> bool:
        """True if tokens for (path, planned output (h, w)) are cached.
        Used by the loader-side decode skip (``dataset.ref_pixel_skip``):
        the key needs only the PNG header geometry, not the pixels. Touches
        the LRU so in-flight entries are not evicted between the loader's
        check and the consuming ``gather``."""
        key = self._key(path, hw)
        with self._lock:
            try:
                self._cache.move_to_end(key)
                return True
            except KeyError:
                pass  # not cached — fall through to the disk store
        return self._disk_load(key) is not None

    def gather(self, ref_paths: list[list[str]], ref_imgs: np.ndarray,
               skipped=None, valid_hw=None, stack: bool = True):
        """:param ref_paths: per-view path lists ``[k][b]`` (the collated
            ``batch["item_paths"]["reference/cross/imgs"]`` layout).
        :param ref_imgs: (B, K, H, W, 3) normalised pixels (host numpy).
        :param skipped: optional (B, K) bool — slots whose PIXELS are
            placeholder zeros because the loader skipped decoding on a cache
            hit; they resolve from RAM, disk, or a same-batch non-skipped
            slot of the same image (whose miss-encode repopulates the key);
            raises only when none of those sources exist — raise
            ``max_items`` if that ever fires.
        :param valid_hw: optional per-item (B, 2) true pixel extents for
            BUCKET-PADDED batches (shape-bucketed serving): an item's K refs
            share its shape; misses encode with the mask and cache under a
            (bucket, valid)-qualified key.
        :param stack: False returns ``[b][k]`` nested lists of the cache's
            OWN token arrays instead of a stacked copy — zero-copy for
            callers that only read windows of the grids (token-space
            training slices 37x37 windows out of full grids; stacking them
            first is ~270 MB/batch of pure memcpy). Callers must treat the
            returned arrays as read-only.
        :return: (B, K, N_patch, D) tokens (``stack=True``) or ``[b][k]``
            lists of (N_patch, D) arrays; dtype = encode_fn's output."""
        b, k = ref_imgs.shape[:2]
        if valid_hw is None:
            valids = [None] * b
        else:
            vhw = np.asarray(valid_hw)
            # (B, 2) per-item, or a shared (2,) batch extent
            valids = ([tuple(vhw)] * b if vhw.ndim == 1
                      else [tuple(v) for v in vhw])
        keys = [[self._key(ref_paths[kk][bb], ref_imgs.shape[2:4], valids[bb])
                 for kk in range(k)] for bb in range(b)]

        # unique misses, first-occurrence order; skipped slots validate AFTER
        # the miss pass, so an entry evicted between a worker's has() and
        # this gather() is rescued when ANOTHER slot of the same batch
        # carries real pixels for the same image (its encode repopulates the
        # key) — only a skipped slot with no RAM, disk, or same-batch pixel
        # source is a hard error
        miss: "OrderedDict[tuple, tuple]" = OrderedDict()
        n_skipped = 0
        skipped_keys: list[tuple] = []
        for bb in range(b):
            for kk in range(k):
                key = keys[bb][kk]
                if skipped is not None and skipped[bb][kk]:
                    n_skipped += 1
                    skipped_keys.append(key)
                    continue
                with self._lock:
                    in_ram = key in self._cache
                if not in_ram and key not in miss and self._disk_load(key) is None:
                    miss[key] = (ref_imgs[bb, kk], valids[bb])
        for key in skipped_keys:
            with self._lock:
                in_ram = key in self._cache
            if in_ram or key in miss:
                continue
            if self._disk_load(key) is None:
                raise RuntimeError(
                    f"decode-skipped reference evicted from the token "
                    f"cache before use: {key[0]} — raise "
                    f"this_main.ref_token_cache_max_items"
                )
        # count miss occurrences over non-skipped slots only (a rescued
        # skipped slot is already accounted under skipped_decodes)
        n_miss_occurrences = sum(
            1 for bb in range(b) for kk in range(k)
            if keys[bb][kk] in miss
            and not (skipped is not None and skipped[bb][kk])
        )
        # skipped slots are resolved-from-cache by construction; counting
        # them again as hits would inflate the effectiveness ratio
        self.skipped_decodes += n_skipped
        self.hits += b * k - n_skipped - n_miss_occurrences
        self.misses += len(miss)

        if miss:
            miss_keys = list(miss.keys())
            imgs = np.stack([v[0] for v in miss.values()])
            miss_valid = [v[1] for v in miss.values()]
            for i0 in range(0, len(miss_keys), self._batch):
                chunk = imgs[i0:i0 + self._batch]
                n_valid = len(chunk)
                if n_valid < self._batch:  # pad to the fixed graph shape
                    pad = np.broadcast_to(
                        chunk[-1:], (self._batch - n_valid, *chunk.shape[1:])
                    )
                    chunk = np.concatenate([chunk, pad])
                if valid_hw is None:
                    tokens = np.asarray(self._encode(chunk))
                else:
                    vchunk = miss_valid[i0:i0 + self._batch]
                    vchunk = vchunk + [vchunk[-1]] * (self._batch - len(vchunk))
                    tokens = np.asarray(
                        self._encode(chunk, np.asarray(vchunk, np.int32))
                    )
                for j in range(n_valid):
                    self._put(miss_keys[i0 + j], tokens[j])

        if not stack:
            return [[self._get(keys[bb][kk]) for kk in range(k)] for bb in range(b)]
        out = np.stack(
            [np.stack([self._get(keys[bb][kk]) for kk in range(k)]) for bb in range(b)]
        )
        return out

    def _put(self, key: tuple, tokens: np.ndarray, write_disk: bool = True) -> None:
        with self._lock:
            self._cache[key] = tokens
            self._cache.move_to_end(key)
            while len(self._cache) > self._max:
                self._cache.popitem(last=False)
        if write_disk and self._dir is not None:
            self._disk_store(key, tokens)

    def _get(self, key: tuple) -> np.ndarray:
        with self._lock:
            try:
                self._cache.move_to_end(key)
                return self._cache[key]
            except KeyError:
                pass
        # evicted between gather's membership validation and this read
        # (a worker-thread _put landed in between); the disk store, when
        # configured, still has it — otherwise fail with the actionable
        # message instead of a bare KeyError
        arr = self._disk_load(key)
        if arr is None:
            raise RuntimeError(
                f"reference tokens evicted from the token cache between "
                f"validation and use: {key[0]} — raise "
                f"this_main.ref_token_cache_max_items"
            )
        return arr

    def __len__(self) -> int:
        with self._lock:
            return len(self._cache)
