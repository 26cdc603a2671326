"""Host-side token-batch assembly microbench (CPU-only, no jax).

Times ``TokenSpaceLoader._finalize`` — the per-batch host work of the
token-space train step (cache lookup + window slicing) — on an all-hit
cache at production shapes (B=24, K=5, 38x52 grids -> 37x37 windows, D=384
bf16). This is the number that must overlap the ~80 ms device step
(PERFORMANCE.md "token-space training").

Usage: python tools/token_assembly_bench.py [--iters 30] [--b 24] [--k 5]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import ml_dtypes  # noqa: E402

from crossscore_tpu.data.token_cache import RefTokenCache  # noqa: E402
from crossscore_tpu.data.token_train import TokenSpaceLoader  # noqa: E402


class _StubDataset:
    query_crop = None
    return_item_paths = True

    def __len__(self):
        return 10_000


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--b", type=int, default=24)
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--gh", type=int, default=38)
    ap.add_argument("--gw", type=int, default=52)
    ap.add_argument("--d", type=int, default=384)
    ap.add_argument("--crop", type=int, default=518)
    args = ap.parse_args()

    b, k, gh, gw, d, p = args.b, args.k, args.gh, args.gw, args.d, 14
    h, w = gh * p, gw * p

    def _no_encode(*a, **kw):
        raise AssertionError("bench cache must be all-hits")

    cache = RefTokenCache(_no_encode, max_items=4 * b * (k + 1))
    q_paths = [f"/bench/q{i}.png" for i in range(b)]
    r_paths = [[f"/bench/r{kk}_{i}.png" for i in range(b)] for kk in range(k)]
    rng = np.random.default_rng(0)
    for path in q_paths + [pp for row in r_paths for pp in row]:
        grid = rng.standard_normal((gh * gw, d), dtype=np.float32)
        cache._put(RefTokenCache._key(path, (h, w)), grid.astype(ml_dtypes.bfloat16))

    # pixels are shape-only inputs on the all-hit path: broadcast views keep
    # the bench's RSS at the grids, like a loader whose decode was skipped
    zero_img = np.zeros((h, w, 3), np.float32)
    batch = {
        "query/img": np.broadcast_to(zero_img, (b, h, w, 3)),
        "query/score_map": np.broadcast_to(np.zeros((h, w), np.float32), (b, h, w)),
        "reference/cross/imgs": np.broadcast_to(zero_img, (b, k, h, w, 3)),
        "item_paths": {"query/img": q_paths, "reference/cross/imgs": r_paths},
    }

    loader = TokenSpaceLoader(
        _StubDataset(), cache, crop_size=args.crop, batch_size=b, num_workers=1
    )

    from crossscore_tpu.data.token_train import (
        _WINDOW_SEED_OFFSET, aligned_window, crop_token_grid,
    )
    from crossscore_tpu.data.loader import _fold_rng

    ch = args.crop // p

    def finalize_legacy(extra):
        """The pre-r3-late form: stack full grids, then slice windows."""
        q_full = cache.gather([q_paths], batch["query/img"][:, None])[:, 0]
        r_full = cache.gather(r_paths, batch["reference/cross/imgs"])
        q_toks = np.empty((b, ch * ch, d), q_full.dtype)
        r_toks = np.empty((b, k, ch * ch, d), r_full.dtype)
        sm_crops = np.empty((b, ch * p, ch * p), np.float32)
        sm = batch["query/score_map"]
        for bb in range(b):
            rng = _fold_rng(loader.seed + _WINDOW_SEED_OFFSET, extra["epoch"], bb)
            i, j = aligned_window((gh, gw), (ch, ch), rng)
            q_toks[bb] = crop_token_grid(q_full[bb], (gh, gw), (i, j), (ch, ch))
            sm_crops[bb] = sm[bb, i * p:(i + ch) * p, j * p:(j + ch) * p]
            for kk in range(k):
                ij = aligned_window((gh, gw), (ch, ch), rng)
                r_toks[bb, kk] = crop_token_grid(r_full[bb, kk], (gh, gw), ij, (ch, ch))
        return {"query/tokens": q_toks, "reference/cross/tokens": r_toks,
                "query/score_map": sm_crops}

    # interleaved A/B: contention (this is a 1-core host) hits both equally
    t_new, t_old = [], []
    for it in range(args.iters):
        t0 = time.perf_counter()
        out = loader._finalize(batch, {"epoch": it, "indices": list(range(b))})
        t_new.append((time.perf_counter() - t0) * 1e3)
        t0 = time.perf_counter()
        out_old = finalize_legacy({"epoch": it})
        t_old.append((time.perf_counter() - t0) * 1e3)
    assert out["query/tokens"].shape == (b, ch * ch, d)
    assert out["reference/cross/tokens"].shape == (b, k, ch * ch, d)
    # same epoch/index rng stream -> identical windows -> identical tokens
    np.testing.assert_array_equal(out["query/tokens"], out_old["query/tokens"])
    np.testing.assert_array_equal(
        out["reference/cross/tokens"], out_old["reference/cross/tokens"]
    )
    views = b * (k + 1)
    for name, ts in (("no-stack", t_new[3:]), ("legacy-stack", t_old[3:])):
        print(f"{name}: {np.mean(ts):.1f} ms/batch (min {np.min(ts):.1f}, "
              f"p50 {np.median(ts):.1f}); {views / np.mean(ts) * 1e3:.0f} views/s")


if __name__ == "__main__":
    main()
