"""Record-shard packing / ingestion (data/records.py, VERDICT r1 #6)."""

import numpy as np
import pytest

from crossscore_tpu.data.records import RecordWriter, RecordStore, pack
from crossscore_tpu.data.synthetic import generate


def test_writer_reader_roundtrip(tmp_path):
    payloads = {f"dir/file_{i}.bin": bytes([i]) * (100 + i) for i in range(20)}
    with RecordWriter(tmp_path / "rec", shard_mb=1) as w:
        for k, v in payloads.items():
            w.write(k, v)
    store = RecordStore(tmp_path / "rec")
    assert len(store) == 20
    for k, v in payloads.items():
        assert store.read(k) == v
    store.close()


def test_shard_rollover(tmp_path):
    blob = b"x" * (600 * 1024)
    with RecordWriter(tmp_path / "rec", shard_mb=1) as w:
        for i in range(4):
            w.write(f"k{i}", blob)
    shards = sorted((tmp_path / "rec").glob("shard-*.bin"))
    assert len(shards) > 1  # rolled over
    store = RecordStore(tmp_path / "rec")
    assert all(store.read(f"k{i}") == blob for i in range(4))


@pytest.fixture(scope="module")
def packed_ws(tmp_path_factory):
    root = tmp_path_factory.mktemp("records_ws")
    generate(root / "datadir", hw=(84, 112), scenes_per_split={"train": 1, "test": 1})
    n = pack(root / "datadir", root / "packed", shard_mb=64, verbose=False)
    assert n > 0
    return root


def test_dataset_identical_via_store(packed_ws, monkeypatch):
    """NvsDataset items from the record store are bit-identical to the
    per-PNG filesystem path (the packed corpus is a pure transport change).
    Both sides pinned to the PIL path — the native fused path consumes its
    rng stream in a different order (separately parity-tested in
    test_fastimage.py)."""
    from crossscore_tpu.data import fastimage
    from crossscore_tpu.data.nvs_index import NvsDataset

    monkeypatch.setattr(fastimage, "available", lambda: False)

    kw = dict(
        dataset_path=str(packed_ws / "datadir"),
        resolution=None,
        data_split="train",
        neighbour_config={"cross": 2, "strategy": "random"},
        metric_type="ssim",
        metric_min=0,
        metric_max=1,
        crop_size=56,
    )
    ds_fs = NvsDataset(**kw)
    ds_rec = NvsDataset(**kw, record_dir=str(packed_ws / "packed"))
    assert len(ds_fs) == len(ds_rec)
    for idx in range(min(4, len(ds_fs))):
        a = ds_fs.get_item(idx, np.random.default_rng(idx))
        b = ds_rec.get_item(idx, np.random.default_rng(idx))
        for key in ("query/img", "query/score_map", "reference/cross/imgs"):
            np.testing.assert_array_equal(a[key], b[key], err_msg=key)


def test_missing_key_falls_back_to_fs(packed_ws, tmp_path):
    """Images not present in the store (e.g. files added after packing) are
    read from the filesystem transparently."""
    from crossscore_tpu.data.records import RecordWriter
    from crossscore_tpu.data.nvs_index import NvsDataset

    with RecordWriter(tmp_path / "empty_rec") as w:
        w.write("unrelated", b"123")
    ds = NvsDataset(
        dataset_path=str(packed_ws / "datadir"),
        resolution=None,
        data_split="train",
        neighbour_config={"cross": 2, "strategy": "random"},
        metric_type="ssim",
        metric_min=0,
        metric_max=1,
        crop_size=56,
        record_dir=str(tmp_path / "empty_rec"),
    )
    item = ds.get_item(0, np.random.default_rng(0))
    assert item["query/img"].shape == (56, 56, 3)


def test_fused_store_path_identical_to_fused_fs(packed_ws):
    """The native fused path decoding record-shard payloads (fi_*_mem) is
    bit-identical to the native fused path reading the same files from the
    filesystem. Skipped where the native library is unavailable."""
    from crossscore_tpu.data import fastimage
    from crossscore_tpu.data.nvs_index import NvsDataset

    if not fastimage.available():
        pytest.skip("native fastimage unavailable")

    kw = dict(
        dataset_path=str(packed_ws / "datadir"),
        resolution=None,
        data_split="train",
        neighbour_config={"cross": 2, "strategy": "random"},
        metric_type="ssim",
        metric_min=0,
        metric_max=1,
        crop_size=56,
    )
    ds_fs = NvsDataset(**kw)
    ds_rec = NvsDataset(**kw, record_dir=str(packed_ws / "packed"))
    for idx in range(min(4, len(ds_fs))):
        a = ds_fs.get_item(idx, np.random.default_rng(idx))
        b = ds_rec.get_item(idx, np.random.default_rng(idx))
        for key in ("query/img", "query/score_map", "reference/cross/imgs"):
            np.testing.assert_array_equal(a[key], b[key], err_msg=key)


def test_load_rgb_bytes_matches_load_rgb(packed_ws):
    from pathlib import Path

    from crossscore_tpu.data import fastimage

    if not fastimage.available():
        pytest.skip("native fastimage unavailable")
    png = next((packed_ws / "datadir").rglob("*.png"))
    data = Path(png).read_bytes()
    assert fastimage.image_info_bytes(data) == fastimage.image_info(str(png))
    info = fastimage.image_info(str(png))
    kw = dict(resize_hw=(40, 52), crop=(2, 3, 30, 40), normalize=True)
    if info[2] == 3:  # rgb
        a = fastimage.load_rgb(str(png), **kw)
        b = fastimage.load_rgb_bytes(data, **kw)
    else:  # 16-bit metric map
        a = fastimage.load_metric(str(png), vrange=[0, 1], **{k: v for k, v in kw.items() if k != "normalize"})
        b = fastimage.load_metric_bytes(data, vrange=[0, 1], **{k: v for k, v in kw.items() if k != "normalize"})
    np.testing.assert_array_equal(a, b)


def test_parallel_pack_identical_store(packed_ws, tmp_path):
    """workers=3 pack: same keys, every payload byte-identical to the
    single-process pack (shard boundaries may differ)."""
    from crossscore_tpu.data.records import RecordStore, pack

    n = pack(packed_ws / "datadir", tmp_path / "packed_mp", shard_mb=1,
             workers=3, verbose=False)
    a = RecordStore(packed_ws / "packed")
    b = RecordStore(tmp_path / "packed_mp")
    assert n == len(b) == len(a)
    assert set(a.keys()) == set(b.keys())
    for k in a.keys():
        assert a.read(k) == b.read(k), k
    a.close(); b.close()
