"""Token-space training: encode full images ONCE, crop in token space.

The frozen backbone is ~57% of the production train step and its kernels are
at their measured floors (PERFORMANCE.md) — the remaining lever changes the
math. Since the backbone is frozen, a full image's token grid is a constant
of the dataset: encode each unique image once (LRU + optional disk store,
``data/token_cache.py``), then sample training crops as PATCH-ALIGNED windows
of the token grid instead of re-encoding pixel crops every step. After the
first epoch the train step is the decoder-only graph
(``models/crossscore.py`` ``query_tokens``) — the (1+K) x B backbone forwards
per step disappear.

SEMANTIC DELTA vs the reference (opt-in, ``this_main.token_space_train``):

- a token's attention context is the FULL image, not the crop (the reference
  encodes the crop, reference ``task/core.py:119-161``);
- crop offsets are 14px-aligned, so offset diversity is 196x coarser than
  the reference's per-pixel ``crop.py:19-23`` sampling.

Supervision is unchanged (score-map crops follow the query window exactly).
The gradient path and optimisation problem are otherwise identical —
pinned by tests/test_token_train.py; convergence by the overfit tests/tool.
"""

from __future__ import annotations

import numpy as np

from crossscore_tpu.data.loader import Loader, _fold_rng

# independent RNG stream for window sampling: the dataset's own per-item
# stream (seed, epoch, idx) already drives neighbour sampling inside
# get_item; reusing it here would correlate windows with reference choices
_WINDOW_SEED_OFFSET = 7919


def _retain_malloc_arena() -> None:
    """Keep the glibc arena hot for the per-batch token buffers.

    A token batch is ~150 MB of freshly allocated numpy (B=24, K=5, 37x37
    grids). glibc serves allocations that large from mmap and munmaps them on
    free, so EVERY batch pays the page faults again — measured 227 ms/batch
    on this host, of which ~130 ms was faulting, vs a ~37 ms copy cost.
    Raising M_MMAP_THRESHOLD and disabling trim keeps the freed arena
    resident for reuse: measured 227 -> 84 ms/batch (1 core, warm arena).
    Process-global and RSS-retaining by design (a training host wants the
    steady-state working set resident); no-op off glibc."""
    import ctypes

    try:
        libc = ctypes.CDLL("libc.so.6")
        libc.mallopt(ctypes.c_int(-1), ctypes.c_int(2**31 - 1))  # M_TRIM_THRESHOLD
        libc.mallopt(ctypes.c_int(-3), ctypes.c_int(1 << 30))    # M_MMAP_THRESHOLD
    except Exception:
        pass


def aligned_window(
    full_grid: tuple[int, int],
    crop_grid: tuple[int, int],
    rng: np.random.Generator,
    deterministic: bool = False,
) -> tuple[int, int]:
    """Top-left (i, j) of a crop window in PATCH units. Deterministic mode is
    the top-left corner (the reference's rule, ``crop.py:19-23``)."""
    gh, gw = full_grid
    ch, cw = crop_grid
    if gh < ch or gw < cw:
        raise ValueError(f"crop grid {crop_grid} larger than image grid {full_grid}")
    if deterministic:
        return 0, 0
    return int(rng.integers(0, gh - ch + 1)), int(rng.integers(0, gw - cw + 1))


def crop_token_grid(
    tokens: np.ndarray, grid: tuple[int, int], ij: tuple[int, int], crop_grid: tuple[int, int]
) -> np.ndarray:
    """Slice a (..., gh*gw, D) token array to the (ch*cw, D) window at ij.

    Keep the ``ascontiguousarray`` + memcpy-assign form: numpy's bf16
    (ml_dtypes) STRIDED->strided assignment takes an elementwise path
    (~1.9 ms per 37x37x384 view, 14x slower than this copy-then-memcpy,
    measured on this host) — "saving" the intermediate copy loses badly."""
    gh, gw = grid
    ch, cw = crop_grid
    i, j = ij
    t = tokens.reshape(*tokens.shape[:-2], gh, gw, tokens.shape[-1])
    t = t[..., i : i + ch, j : j + cw, :]
    return np.ascontiguousarray(t.reshape(*tokens.shape[:-2], ch * cw, tokens.shape[-1]))


def token_working_set(prefetch_batches: int, batch_size: int, k: int) -> int:
    """In-flight token-cache working set: 2x (prefetch+1) batches of B*(K+1)
    image grids each — the eviction-exposure window of the decode-skip path
    (see :meth:`TokenSpaceLoader._check_cache_capacity`). The single source
    of the formula; the ``train_recipe=token_fast`` cache sizing
    (tasks/train.py) calls this too."""
    return 2 * (prefetch_batches + 1) * batch_size * (k + 1)


class TokenSpaceLoader(Loader):
    """Loader whose batches carry token crops instead of pixel crops.

    Wraps a dataset configured WITHOUT pixel cropping (``crop_mode=
    "integer_patches"`` + ``return_item_paths=True`` so items are full
    %14-trimmed images with their paths). Workers decode full images; this
    hook encodes cache misses through the frozen backbone (overlapped with
    training — it runs on the producer thread) and slices aligned windows:

    - query window == score-map window (reference ``RandomCropperBatchSame``)
    - one independent window per reference view (``...BatchSeparate``)

    Output batch keys: ``query/tokens`` (B, ch*cw, D), ``reference/cross/
    tokens`` (B, K, ch*cw, D), ``query/score_map`` (B, ch*14, cw*14).
    """

    def __init__(self, dataset, cache, crop_size: int, patch: int = 14,
                 deterministic_crop: bool = False, **kw):
        if getattr(dataset, "query_crop", None) is not None:
            raise ValueError(
                "TokenSpaceLoader needs an uncropped dataset "
                "(crop_mode='integer_patches'); it crops in token space"
            )
        if not getattr(dataset, "return_item_paths", False):
            raise ValueError("TokenSpaceLoader needs return_item_paths=true")
        if crop_size % patch:
            raise ValueError(f"crop_size {crop_size} must be a multiple of {patch}")
        super().__init__(dataset, **kw)
        self.cache = cache
        self.patch = patch
        self.crop_grid = (crop_size // patch, crop_size // patch)
        self.deterministic_crop = deterministic_crop
        self._slice_pool = None  # lazy; lives for the loader's lifetime
        self._check_cache_capacity(dataset, cache)
        _retain_malloc_arena()

    def _check_cache_capacity(self, dataset, cache) -> None:
        """Fail undersized caches at startup, not mid-epoch.

        The decode-skip path (``dataset.ref_pixel_skip``) leaves PLACEHOLDER
        pixels for cached images, so an entry evicted between a worker's
        ``has()`` and the producer's consuming ``gather()`` is unrecoverable
        from RAM; the exposure window spans the whole prefetch pipeline —
        ``prefetch_batches`` batches of B*(K+1) grids each, plus the batch in
        flight — so ``max_items`` must cover ~2x that working set. A disk
        store (``persist_dir``) downgrades eviction to a reload, so it only
        warns there."""
        from crossscore_tpu.data.nvs_index import leaf_datasets

        k = max(
            (int(leaf.neighbour_config.get("cross", 0))
             for leaf in leaf_datasets(dataset)),
            default=0,
        )
        need = token_working_set(self.prefetch_batches, self.batch_size, k)
        # a cache that holds the ENTIRE distinct-image corpus can never
        # evict, so the in-flight working set is irrelevant — don't refuse
        # small-corpus configs (the index walk is host metadata only).
        # Cache keys are (path, shape, valid_hw), not bare paths: under
        # integer_patches the (shape, valid) per path is deterministic PER
        # LEAF geometry, so a path shared across leaves with different
        # resize settings can hold up to n_geoms keys — scale the corpus
        # bound accordingly or the relaxation re-enables the eviction race.
        from crossscore_tpu.tasks.encode_tokens import unique_image_paths

        n_geoms = len({
            getattr(leaf, "resize_short_side", None) or -1
            for leaf in leaf_datasets(dataset)
        }) or 1
        need = min(need, len(unique_image_paths(dataset)) * n_geoms)
        if cache._max >= need:
            return
        msg = (
            f"token cache max_items={cache._max} is below the in-flight "
            f"working set ~{need} (2 x {self.prefetch_batches + 1} batches x "
            f"batch_size {self.batch_size} x (K+1)={k + 1}); eviction races "
            f"with the decode-skip path — raise "
            f"this_main.ref_token_cache_max_items to >= {need}"
        )
        from crossscore_tpu.data import fastimage

        if cache._dir is None and fastimage.available():
            # the decode-skip hooks (tasks/train.py) are only installed when
            # the native decoder is present; without them every slot carries
            # real pixels and eviction just re-encodes — correct, only slower
            raise ValueError(msg)
        import warnings

        warnings.warn(msg + (" (disk store present: evictions degrade to "
                             "reloads, not crashes)" if cache._dir is not None
                             else " (no native decoder: decode-skip is off, "
                                  "evictions degrade to re-encodes)"),
                      RuntimeWarning, stacklevel=3)

    def _plan(self, epoch: int) -> list:
        return [
            (chunk, n_valid, {"epoch": epoch, "indices": chunk})
            for chunk, n_valid, _ in super()._plan(epoch)
        ]

    def _finalize(self, batch: dict, extra) -> dict:
        q = batch["query/img"]          # (B, H, W, 3) normalised full images
        sm = batch["query/score_map"]   # (B, H, W)
        refs = batch["reference/cross/imgs"]  # (B, K, H, W, 3)
        paths = batch["item_paths"]
        b, k = refs.shape[:2]
        p = self.patch
        full_grid = (q.shape[1] // p, q.shape[2] // p)
        ch, cw = self.crop_grid

        # full-image tokens, encoded once per unique (path, shape) — the
        # cache layout is [k][b] (the collated item_paths layout).
        # stack=False: windows are sliced STRAIGHT out of the cache's own
        # grids; stacking (B,K,G,D) first is ~270 MB/batch of pure memcpy
        # (measured: the stacked form costs ~2x the whole assembly)
        # decode-skip: once the cache is warm the dataset emits placeholder
        # pixels for cached images (query AND references); gather resolves
        # those slots cache-only. Steady-state epochs decode only score maps.
        q_skip = batch.get("query/skipped")
        q_grids = self.cache.gather(
            [list(paths["query/img"])], q[:, None], stack=False,
            skipped=None if q_skip is None else q_skip[:, None],
        )
        r_grids = self.cache.gather(
            paths["reference/cross/imgs"], refs, stack=False,
            skipped=batch.get("reference/skipped"),
        )
        tok_dtype = q_grids[0][0].dtype
        tok_d = q_grids[0][0].shape[-1]

        # per-item windows: indices may repeat under pad_last (duplicated
        # final items) — identical rng -> identical windows -> the _valid
        # masking sees true duplicates, as in the pixel path
        idxs = list(extra["indices"]) + [extra["indices"][-1]] * (b - len(extra["indices"]))
        q_toks = np.empty((b, ch * cw, tok_d), tok_dtype)
        r_toks = np.empty((b, k, ch * cw, tok_d), tok_dtype)
        sm_crops = np.empty((b, ch * p, cw * p), sm.dtype)

        def slice_item(bb: int) -> None:
            # rng stream is per-item, so parallel order cannot change results
            rng = _fold_rng(self.seed + _WINDOW_SEED_OFFSET, extra["epoch"], int(idxs[bb]))
            i, j = aligned_window(full_grid, self.crop_grid, rng, self.deterministic_crop)
            q_toks[bb] = crop_token_grid(q_grids[bb][0], full_grid, (i, j), self.crop_grid)
            sm_crops[bb] = sm[bb, i * p : (i + ch) * p, j * p : (j + cw) * p]
            for kk in range(k):
                ij = aligned_window(full_grid, self.crop_grid, rng, self.deterministic_crop)
                r_toks[bb, kk] = crop_token_grid(
                    r_grids[bb][kk], full_grid, ij, self.crop_grid
                )

        # numpy copies release the GIL: on multi-core production hosts the
        # ~37 ms/batch of slicing parallelises across items (unmeasurable on
        # this 1-core host, like the rest of the loader's thread scaling)
        if self.num_workers > 1 and b > 1:
            from concurrent.futures import ThreadPoolExecutor

            if self._slice_pool is None:
                self._slice_pool = ThreadPoolExecutor(self.num_workers)
            list(self._slice_pool.map(slice_item, range(b)))
        else:
            for bb in range(b):
                slice_item(bb)
        return {
            "query/tokens": q_toks,
            "reference/cross/tokens": r_toks,
            "query/score_map": sm_crops,
        }
