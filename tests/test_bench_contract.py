"""bench.py driver contract: ONE JSON line with metric/value/unit/vs_baseline.

The driver runs ``python bench.py`` at round end and records stdout; the
headline must survive whatever the extras do. These tests monkeypatch the
measurement functions (no device work) and pin the output shape.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402


def _fake(metric):
    return {"metric": metric, "value": 1.0, "unit": "u", "vs_baseline": 1.0}


def _run_main(capsys):
    bench.main()
    captured = capsys.readouterr()
    out = [l for l in captured.out.splitlines() if l.strip()]
    assert len(out) == 1, f"driver contract: exactly one stdout line, got {out}"
    return json.loads(out[0]), captured.err


def test_default_run_embeds_extras(monkeypatch, capsys):
    monkeypatch.setattr(
        bench, "measure_inference", lambda cached: _fake("cached" if cached else "headline")
    )
    monkeypatch.setattr(bench, "measure_train", lambda tokens=False: _fake("train"))
    res, _ = _run_main(capsys)
    assert res["metric"] == "headline"
    assert set(res) >= {"metric", "value", "unit", "vs_baseline", "extras"}
    assert res["extras"]["serving_cached"]["metric"] == "cached"
    assert res["extras"]["train_step"]["metric"] == "train"


def test_failing_extra_never_loses_the_headline(monkeypatch, capsys):
    def boom(tokens=False):
        raise RuntimeError("train exploded")

    monkeypatch.setattr(
        bench, "measure_inference", lambda cached: _fake("cached" if cached else "headline")
    )
    monkeypatch.setattr(bench, "measure_train", boom)
    res, err = _run_main(capsys)
    assert res["metric"] == "headline"
    assert res["value"] == 1.0
    assert "train exploded" in res["extras"]["train_step"]["error"]
    # the warning went to stderr, not the JSON line
    assert "train exploded" in err


def test_single_mode_runs_have_no_extras(monkeypatch, capsys):
    monkeypatch.setattr(bench, "measure_inference", lambda cached: _fake("i"))
    monkeypatch.setattr(bench, "measure_train", lambda tokens=False: _fake("t"))
    monkeypatch.setattr(bench, "TRAIN", True)
    assert "extras" not in _run_main(capsys)[0]
    monkeypatch.setattr(bench, "TRAIN", False)
    monkeypatch.setattr(bench, "CACHED", True)
    assert "extras" not in _run_main(capsys)[0]


def test_extras_opt_out(monkeypatch, capsys):
    monkeypatch.setattr(bench, "measure_inference", lambda cached: _fake("i"))
    monkeypatch.setattr(bench, "EXTRAS", False)
    assert "extras" not in _run_main(capsys)[0]
