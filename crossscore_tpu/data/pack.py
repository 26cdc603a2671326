"""CLI: pack a dataset tree into record shards for sequential-IO ingestion.

Usage:
    python -m crossscore_tpu.data.pack <dataset_root> <out_dir> [shard_mb]

Then train/test/predict with ``data.dataset.record_dir=<out_dir>``.
See crossscore_tpu/data/records.py for the format.
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
    pack(argv[0], argv[1], shard_mb=shard_mb)


if __name__ == "__main__":
    main()
