"""Pixel-crop vs token-space training quality A/B at matched budgets.

Token-space training (``this_main.token_space_train``, data/token_train.py)
deviates from the reference's semantics in two documented ways: a token's
attention context is the FULL image (the reference encodes the crop,
reference ``task/core.py:119-161``) and crop offsets are 14px-aligned
(196x coarser than ``dataloading/transformation/crop.py:19-23``). This tool
answers the question those deltas raise: does a token-mode run reach the
same HELD-OUT quality as a pixel-mode run under the same step/LR budget?

Protocol:
- one learnable synthetic corpus (``data/synthetic.py --learnable``): the
  ssim target is a deterministic monotone map of a smooth degradation field,
  recoverable from (query, references) — held-out loss measures learning,
  not noise-fitting;
- two ``tasks.train`` runs, identical seed / steps / LR schedule / model;
  the ONLY difference is the crop mechanism (both validate on the pixel
  eval path, so the comparison metric is apples-to-apples);
- report: final + best validation loss / correlation per arm, plus the
  sustained ms/step if ``--sustained`` warmup steps are given.

Usage (CPU tiny, ~15 min):
    python tools/ab_token_vs_pixel.py --out /tmp/ab_cpu

On-chip medium (real TPU; background it):
    python tools/ab_token_vs_pixel.py --preset tpu-medium --out /tmp/ab_tpu
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))  # crossscore_tpu imports on every branch

# arm-invariant override sets; the corpus geometry must keep crop <= trimmed
# image in BOTH modes (token mode %14-trims full images first)
PRESETS = {
    # dinov2-test tiny model, CPU, ~15 min total on the 1-core host
    "cpu-tiny": dict(
        accel="cpu",
        hw=(112, 140),
        scenes=(4, 2, 1),
        n_train=6,
        n_test=4,
        base=[
            "model.tpu.compute_dtype=float32",
            "model.backbone.preset=dinov2-test",
            "data.neighbour_config.cross=2",
            "data.loader.train.batch_size=4",
            "data.loader.validation.batch_size=4",
            "data.transforms.crop_size=84",
            "this_main.resize_short_side=-1",
            "trainer.max_epochs=80",
            "trainer.optimizer.lr=1e-3",
            "trainer.num_sanity_val_steps=0",
            "logger.vis_imgs_every_n_train_steps=100000",
            "logger.vis_histogram_every_n_train_steps=100000",
        ],
    ),
    # dinov2-small production shapes on the real chip; corpus matches the
    # reference res_540 geometry (540x720, crop 518)
    "tpu-medium": dict(
        accel="tpu",
        hw=(540, 720),
        scenes=(6, 2, 1),
        n_train=10,
        n_test=6,
        base=[
            "model.backbone.preset=dinov2-small",
            "data.neighbour_config.cross=5",
            "data.loader.train.batch_size=24",
            "data.loader.validation.batch_size=24",
            "data.transforms.crop_size=518",
            "this_main.resize_short_side=-1",
            "trainer.max_epochs=80",
            "trainer.max_steps=300",
            "trainer.optimizer.lr=3e-4",
            "trainer.num_sanity_val_steps=0",
            "trainer.limit_val_batches=6",
            # epochs are ~4 steps on the A/B corpus; validating every epoch
            # would dominate wall time on the 1-core host
            "trainer.check_val_every_n_epoch=4",
            "logger.vis_imgs_every_n_train_steps=100000",
            "logger.vis_histogram_every_n_train_steps=100000",
        ],
    ),
}


def ensure_corpus(root: Path, preset: dict, pack_records: bool) -> list[str]:
    """Generate the learnable corpus (+ optional decoded record shards);
    return the dataset overrides."""
    res_dir = root / "res_540"
    if not (res_dir / "split.json").exists():
        import jax

        jax.config.update("jax_platforms", "cpu")
        from crossscore_tpu.data.synthetic import generate

        t0 = time.time()
        generate(
            root,
            hw=preset["hw"],
            scenes_per_split={
                "train": preset["scenes"][0],
                "val": preset["scenes"][1],
                "test": preset["scenes"][2],
            },
            n_train_imgs=preset["n_train"],
            n_test_imgs=preset["n_test"],
            learnable=True,
        )
        print(f"corpus generated in {time.time() - t0:.0f}s -> {root}")
    overrides = [f"data.dataset.path=[{root}]"]
    if pack_records:
        # sibling of the dataset root, NOT inside it: NvsDataset discovers
        # res_* resolution dirs under the root
        rec = root.with_name(root.name + "_records")
        if not (rec / "index.npz").exists():
            from crossscore_tpu.data.records import pack

            t0 = time.time()
            pack(root, rec, shard_mb=512, decoded=True)
            print(f"decoded record shards packed in {time.time() - t0:.0f}s -> {rec}")
        overrides.append(f"data.dataset.record_dir={rec}")
    return overrides


def run_arm(name: str, out_dir: Path, overrides: list[str], accel: str,
            timeout_s: float = 5400) -> dict:
    """Run one tasks.train arm in a subprocess; parse run_dir + metrics.

    ``timeout_s`` bounds the arm: a hung tunnel RPC otherwise stalls the
    whole multi-seed session silently (observed r5: a token arm froze at
    step 80 with every thread futex-waiting on a dispatch that never
    returned)."""
    env = dict(os.environ)
    # APPEND to PYTHONPATH: overwriting drops the axon TPU plugin (CLAUDE.md)
    env["PYTHONPATH"] = f"{REPO}:" + env.get("PYTHONPATH", "/root/.axon_site")
    cmd = [sys.executable, "-m", "crossscore_tpu.tasks.train",
           f"trainer.accelerator={accel}", f"run.dir={out_dir}",
           f"alias={name}"] + overrides
    print(f"[{name}] {' '.join(cmd[2:])}", flush=True)
    t0 = time.time()
    proc = subprocess.run(cmd, env=env, cwd=out_dir, capture_output=True,
                          text=True, timeout=timeout_s)
    wall = time.time() - t0
    sys.stdout.write(proc.stdout[-2000:])
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        raise RuntimeError(f"arm {name} failed (rc={proc.returncode})")
    m = re.search(r"train done: (\d+) steps -> (.+)", proc.stdout)
    steps, run_dir = int(m.group(1)), Path(m.group(2))
    if not run_dir.is_absolute():
        run_dir = out_dir / run_dir
    res = {"arm": name, "steps": steps, "wall_s": round(wall, 1),
           # provenance (VERDICT r4): an A/B artifact that doesn't embed its
           # exact inputs can't be audited or reproduced — record both the
           # verbatim CLI override list and the COMPOSED config snapshot the
           # run itself persisted (tasks/common.py save_config_snapshot)
           "cli_overrides": cmd[2:],
           "run_dir": str(run_dir)}
    snap = run_dir / "config.yaml"
    if snap.exists():
        import yaml

        res["resolved_config"] = yaml.safe_load(snap.read_text())
    sus = re.search(r"sustained: ([\d.]+) ms/step over (\d+) steps", proc.stdout)
    if sus:
        res["sustained_ms_per_step"] = float(sus.group(1))
        res["sustained_steps"] = int(sus.group(2))
    vals = []
    with open(run_dir / "metrics.jsonl") as f:
        for line in f:
            row = json.loads(line)
            if "validation/loss" in row:
                vals.append(row)
    if vals:
        res["final_val_loss"] = vals[-1]["validation/loss"]
        res["final_val_corr"] = vals[-1]["validation/correlation_cross"]
        res["best_val_loss"] = min(v["validation/loss"] for v in vals)
        res["best_val_corr"] = max(v["validation/correlation_cross"] for v in vals)
        res["val_curve"] = [
            (v["step"], round(v["validation/loss"], 5)) for v in vals
        ]
    return res


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--preset", choices=PRESETS, default="cpu-tiny")
    ap.add_argument("--out", default="/tmp/ab_token_vs_pixel")
    ap.add_argument("--data", default=None, help="corpus root (default <out>/data)")
    ap.add_argument("--records", action="store_true",
                    help="pack + train from decoded record shards")
    ap.add_argument("--sustained", type=int, default=0,
                    help="warmup steps before the sustained-timing window")
    ap.add_argument("--arm", choices=["pixel", "token", "both"], default="both")
    ap.add_argument("--extra", action="append", default=[],
                    help="extra dotted overrides appended to both arms (e.g. "
                         "trainer.max_steps=150 for a pure sustained-window "
                         "run with validation pushed out of the window)")
    ap.add_argument("--seeds", default=None,
                    help="comma-separated seed list (e.g. 1,2,3): run every "
                         "arm once per seed and report per-arm mean±spread — "
                         "single-seed promotion language is not supported by "
                         "one paired run (VERDICT r4)")
    args = ap.parse_args(argv)

    preset = PRESETS[args.preset]
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    data_root = Path(args.data) if args.data else out / "data"
    ds_overrides = ensure_corpus(data_root, preset, args.records)

    base = preset["base"] + ds_overrides + list(args.extra)
    if args.sustained:
        base = base + [f"this_main.sustained_report_after_steps={args.sustained}"]
    seeds = [int(s) for s in args.seeds.split(",")] if args.seeds else [None]
    results = []

    def _arm(name, overrides, arm, seed):
        """One failed/hung arm must not lose the session's completed arms:
        record the failure, persist the partial report, keep going."""
        try:
            r = run_arm(name, out, overrides, preset["accel"])
        except Exception as e:
            r = {"arm": arm, "error": f"{type(e).__name__}: {e}"[:300]}
            print(f"[{name}] FAILED: {r['error']}", flush=True)
        r["arm"], r["seed"] = arm, seed
        results.append(r)
        with open(out / "ab_report_partial.json", "w") as f:
            json.dump(results, f, indent=2)

    for seed in seeds:
        seed_ov = [] if seed is None else [f"seed={seed}"]
        tag = "" if seed is None else f"_s{seed}"
        if args.arm in ("pixel", "both"):
            _arm(f"pixel{tag}", base + seed_ov, "pixel", seed)
        if args.arm in ("token", "both"):
            _arm(f"token{tag}",
                 base + seed_ov + ["this_main.token_space_train=true"],
                 "token", seed)

    report = {"preset": args.preset, "records": args.records,
              "seeds": seeds if args.seeds else None, "arms": results}
    if args.seeds and len(seeds) > 1:
        import statistics as st

        agg = {}
        for arm in ("pixel", "token"):
            rows = [r for r in results if r["arm"] == arm and "final_val_loss" in r]
            if len(rows) >= 2:
                agg[arm] = {
                    k: {
                        "mean": round(st.mean(r[k] for r in rows), 5),
                        "stdev": round(st.stdev(r[k] for r in rows), 5),
                        "values": [round(r[k], 5) for r in rows],
                    }
                    for k in ("final_val_loss", "final_val_corr",
                              "best_val_loss", "best_val_corr")
                }
        report["aggregate"] = agg
    with open(out / "ab_report.json", "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: v for k, v in report.items() if k != "arms"}
                     | {"arms": [{k2: v2 for k2, v2 in r.items()
                                  if k2 not in ("resolved_config", "val_curve")}
                                 for r in report["arms"]]}, indent=2))


if __name__ == "__main__":
    main()
