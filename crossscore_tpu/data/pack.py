"""CLI: pack a dataset tree into record shards for sequential-IO ingestion.

Usage:
    python -m crossscore_tpu.data.pack <dataset_root> <out_dir> [shard_mb] [workers] [--decoded]

Then train/test/predict with ``data.dataset.record_dir=<out_dir>``.
``workers > 1`` packs in parallel processes (2 TB-corpus scale; the result is
content-identical to a single-process pack). ``--decoded`` stores pre-decoded
raw tensors instead of PNG bytes (no decode at train time; ~1.5-2.3x bytes on
disk). See crossscore_tpu/data/records.py.
"""

from __future__ import annotations

import sys

from crossscore_tpu.data.records import pack


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    decoded = "--decoded" in argv
    argv = [a for a in argv if a != "--decoded"]
    if len(argv) < 2:
        print(__doc__)
        raise SystemExit(2)
    shard_mb = int(argv[2]) if len(argv) > 2 else 512
    workers = int(argv[3]) if len(argv) > 3 else 1
    pack(argv[0], argv[1], shard_mb=shard_mb, workers=workers, decoded=decoded)


if __name__ == "__main__":
    main()
