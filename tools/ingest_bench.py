"""Host ingestion throughput: per-PNG filesystem vs packed record shards.

Generates a synthetic dataset, packs it, and times full Loader epochs both
ways (PIL decode path on both sides so the comparison isolates transport).
NOTE: this host has ONE CPU core (CLAUDE.md) — absolute numbers are per-core;
the record-store win on real TPU-VM hosts is larger (no per-file open/seek
under concurrency).

Usage: python tools/ingest_bench.py [items_per_epoch]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

import tempfile

import numpy as np


def main():
    import crossscore_tpu.data.fastimage as fastimage

    native_ok = fastimage.available()
    from crossscore_tpu.data.loader import Loader
    from crossscore_tpu.data.nvs_index import NvsDataset
    from crossscore_tpu.data.records import pack
    from crossscore_tpu.data.synthetic import generate

    n_epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    with tempfile.TemporaryDirectory() as td:
        root = Path(td)
        generate(root / "data", hw=(270, 360),
                 scenes_per_split={"train": 2, "test": 1})
        pack(root / "data", root / "packed", shard_mb=256, verbose=False)
        pack(root / "data", root / "decoded", shard_mb=256, verbose=False,
             decoded=True)

        kw = dict(
            dataset_path=str(root / "data"), resolution=None, data_split="train",
            neighbour_config={"cross": 5, "strategy": "random"},
            metric_type="ssim", metric_min=0, metric_max=1, crop_size=224,
        )
        variants = [
            ("fs /pil    ", {}, False),
            ("rec/pil    ", {"record_dir": str(root / "packed")}, False),
        ]
        if native_ok:
            variants += [
                ("fs /native ", {}, True),
                ("rec/native ", {"record_dir": str(root / "packed")}, True),
                ("raw/native ", {"record_dir": str(root / "decoded")}, True),
            ]
        real_available = fastimage.available
        for tag, extra, use_native in variants:
            fastimage.available = real_available if use_native else (lambda: False)
            ds = NvsDataset(**kw, **extra)
            loader = Loader(ds, batch_size=4, num_workers=4, seed=0)
            for b in loader.epoch(999):  # untimed warmup (page cache, lib init)
                pass
            items = 0
            t0 = time.perf_counter()
            for ep in range(n_epochs):
                for b in loader.epoch(ep):
                    items += int(b["_valid"])
            dt = time.perf_counter() - t0
            # each item decodes 1 query + 1 metric map + 5 refs = 7 images
            print(f"{tag}: {items / dt:6.1f} items/s  ({items * 7 / dt:6.1f} imgs/s, "
                  f"{items} items in {dt:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
