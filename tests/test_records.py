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


def test_resolution_autopick_skips_non_res_dirs(packed_ws):
    """``resolution=None`` discovers res_* dirs exactly like the reference
    (nvs_dataset.py:122-131); a sibling dir that merely STARTS with "res"
    (e.g. "res2x_records", which sorts before "res_540") must not be picked
    (regression: the filter matched ``res`` instead of ``res_``)."""
    from crossscore_tpu.data.nvs_index import NvsDataset

    decoy = packed_ws / "datadir" / "res2x_records"
    decoy.mkdir(exist_ok=True)  # no split.json inside — picking it would raise
    try:
        ds = NvsDataset(
            dataset_path=str(packed_ws / "datadir"),
            resolution=None,
            data_split="train",
            neighbour_config={"cross": 2, "strategy": "random"},
            metric_type="ssim",
            metric_min=0,
            metric_max=1,
            crop_size=56,
        )
        assert ds.dataset_path.name.startswith("res_")
    finally:
        decoy.rmdir()


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


@pytest.fixture(scope="module")
def decoded_ws(tmp_path_factory, packed_ws):
    root = tmp_path_factory.mktemp("records_decoded")
    n = pack(packed_ws / "datadir", root / "decoded", shard_mb=64,
             verbose=False, decoded=True)
    assert n > 0
    return root


class TestDecodedShards:
    """Pre-decoded tensor shards (VERDICT r2 #2): a training sample costs a
    pread + fused crop/normalise, no PNG inflate — and is bit-identical to
    the PNG path on every code path."""

    KW = dict(
        resolution=None, data_split="train",
        neighbour_config={"cross": 2, "strategy": "random"},
        metric_type="ssim", metric_min=0, metric_max=1, crop_size=56,
    )

    def test_payload_roundtrip(self, packed_ws):
        from crossscore_tpu.data.records import encode_raw_payload, decode_raw_payload
        from PIL import Image

        for png in list((packed_ws / "datadir").rglob("*.png"))[:6]:
            raw = decode_raw_payload(encode_raw_payload(png))
            img = np.asarray(Image.open(png))
            if img.ndim == 3:
                np.testing.assert_array_equal(raw, img[..., :3])
            else:
                np.testing.assert_array_equal(raw, img.astype(np.uint16))

    def test_dataset_identical_pil_path(self, packed_ws, decoded_ws, monkeypatch):
        from crossscore_tpu.data import fastimage
        from crossscore_tpu.data.nvs_index import NvsDataset

        monkeypatch.setattr(fastimage, "available", lambda: False)
        ds_fs = NvsDataset(dataset_path=str(packed_ws / "datadir"), **self.KW)
        ds_raw = NvsDataset(dataset_path=str(packed_ws / "datadir"),
                            record_dir=str(decoded_ws / "decoded"), **self.KW)
        for idx in range(min(4, len(ds_fs))):
            a = ds_fs.get_item(idx, np.random.default_rng(idx))
            b = ds_raw.get_item(idx, np.random.default_rng(idx))
            for key in ("query/img", "query/score_map", "reference/cross/imgs"):
                np.testing.assert_array_equal(a[key], b[key], err_msg=key)

    def test_dataset_identical_native_path(self, packed_ws, decoded_ws):
        from crossscore_tpu.data import fastimage
        from crossscore_tpu.data.nvs_index import NvsDataset

        if not fastimage.available():
            pytest.skip("native fastimage unavailable")
        ds_fs = NvsDataset(dataset_path=str(packed_ws / "datadir"), **self.KW)
        ds_raw = NvsDataset(dataset_path=str(packed_ws / "datadir"),
                            record_dir=str(decoded_ws / "decoded"), **self.KW)
        for idx in range(min(4, len(ds_fs))):
            a = ds_fs.get_item(idx, np.random.default_rng(idx))
            b = ds_raw.get_item(idx, np.random.default_rng(idx))
            for key in ("query/img", "query/score_map", "reference/cross/imgs"):
                np.testing.assert_array_equal(a[key], b[key], err_msg=key)

    def test_native_raw_with_resize_matches_png(self, packed_ws, decoded_ws):
        """resize + crop + normalise through fi_*_raw equals the PNG-decode
        fused path (the resize consumes the identical f32 source tensor)."""
        from pathlib import Path

        from crossscore_tpu.data import fastimage
        from crossscore_tpu.data.records import encode_raw_payload

        if not fastimage.available():
            pytest.skip("native fastimage unavailable")
        pngs = (packed_ws / "datadir").rglob("*.png")
        rgb = next(p for p in pngs if fastimage.image_info(str(p))[2] == 3)
        raw = encode_raw_payload(rgb)
        png_bytes = Path(rgb).read_bytes()
        assert fastimage.image_info_bytes(raw) == fastimage.image_info_bytes(png_bytes)
        kw = dict(resize_hw=(42, 56), crop=(2, 3, 30, 40), normalize=True)
        np.testing.assert_array_equal(
            fastimage.load_rgb_bytes(raw, **kw),
            fastimage.load_rgb_bytes(png_bytes, **kw),
        )
        mm = next(p for p in (packed_ws / "datadir").rglob("*.png")
                  if fastimage.image_info(str(p))[2] == 1)
        raw_m = encode_raw_payload(mm)
        kw_m = dict(vrange=[-1, 1], resize_hw=(42, 56), crop=(2, 3, 30, 40))
        np.testing.assert_array_equal(
            fastimage.load_metric_bytes(raw_m, **kw_m),
            fastimage.load_metric_bytes(Path(mm).read_bytes(), **kw_m),
        )


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
