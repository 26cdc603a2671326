"""CLI: pack a dataset tree into record shards for sequential-IO ingestion.

Usage:
    python -m crossscore_tpu.data.pack <dataset_root> <out_dir> [shard_mb] [workers]

Then train/test/predict with ``data.dataset.record_dir=<out_dir>``.
``workers > 1`` packs in parallel processes (2 TB-corpus scale; the result is
content-identical to a single-process pack). See crossscore_tpu/data/records.py.
"""

from __future__ import annotations

import sys

from crossscore_tpu.data.records import pack


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) < 2:
        print(__doc__)
        raise SystemExit(2)
    shard_mb = int(argv[2]) if len(argv) > 2 else 512
    workers = int(argv[3]) if len(argv) > 3 else 1
    pack(argv[0], argv[1], shard_mb=shard_mb, workers=workers)


if __name__ == "__main__":
    main()
