"""Multi-method EVAL semantics at production geometry (BASELINE config #4).

The reference's headline evaluation workflow is a K-sweep over a
ConcatDataset of several NVS-method roots, summarised per (dataset, method)
(reference ``utils/io/score_summariser.py:241-250``,
``dataloading/data_manager.py:8-41``). Unit tests pin the mechanics
(tests/test_tasks.py::TestMultiMethodEval); this tool exercises the workflow
END-TO-END on the chip:

1. build a 3-"method" learnable corpus — one DISTINCT degradation process per
   method root (data/synthetic.py ``DEGRADATIONS``), so methods have real,
   different quality profiles;
2. briefly TRAIN on the multi-root ConcatDataset (predictions must track each
   method's degradation, not just one);
3. run ``tasks.test`` at K in {4, 8, 16} over the test split;
4. emit the per-(dataset, method) ``score_summary`` CSVs, the GT summaries
   (``tasks.summarise_score_gt``), and a correlation table
   {K, method -> pred mean, GT mean, per-frame corr, pooled corr} to
   ``<out>/multimethod_report.json`` (resolved configs embedded).

Usage (real TPU; background it):
    python tools/multimethod_eval.py --out /tmp/mm_eval
CPU smoke:
    python tools/multimethod_eval.py --out /tmp/mm_cpu --accel cpu --tiny
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import re
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

METHODS = ("gaussian", "tensorf", "nerfacto")
DATASET = "synthmfr"


def sh(args: list[str], cwd: Path) -> str:
    env = dict(os.environ)
    # APPEND to PYTHONPATH: overwriting drops the axon TPU plugin (CLAUDE.md)
    env["PYTHONPATH"] = f"{REPO}:" + env.get("PYTHONPATH", "/root/.axon_site")
    print("$", " ".join(args[2:] if args[0] == sys.executable else args), flush=True)
    proc = subprocess.run(args, env=env, cwd=cwd, capture_output=True, text=True)
    sys.stdout.write(proc.stdout[-1500:])
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        raise RuntimeError(f"command failed rc={proc.returncode}")
    return proc.stdout


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--out", default="/tmp/mm_eval")
    ap.add_argument("--accel", default="tpu")
    ap.add_argument("--tiny", action="store_true",
                    help="dinov2-test geometry for a CPU smoke run")
    ap.add_argument("--ks", default="4,8,16")
    ap.add_argument("--train-steps", type=int, default=150)
    ap.add_argument("--ckpt", default=None,
                    help="skip the training stage, evaluate this checkpoint")
    args = ap.parse_args(argv)

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    ks = [int(k) for k in args.ks.split(",")]

    if args.tiny:
        hw, scenes, n_tr, n_te = (112, 140), (1, 1, 1), 3, 2
        base = [
            "model.tpu.compute_dtype=float32",
            "model.backbone.preset=dinov2-test",
            "data.loader.train.batch_size=2",
            "data.loader.validation.batch_size=2",
            "data.loader.train.num_workers=2",
            "data.loader.validation.num_workers=2",
            "data.transforms.crop_size=84",
            "this_main.resize_short_side=-1",
        ]
    else:
        hw, scenes, n_tr, n_te = (540, 720), (2, 1, 1), 6, 4
        base = [
            "model.backbone.preset=dinov2-small",
            "data.loader.train.batch_size=24",
            "data.loader.validation.batch_size=2",
            "data.loader.train.num_workers=4",
            "data.loader.validation.num_workers=2",
            "data.transforms.crop_size=518",
            "this_main.resize_short_side=-1",
            # uint8 wire = the production train path AND the same compiled
            # train graph as the A/B runs (warm compile cache on-chip)
            "data.dataset.wire_uint8=true",
        ]

    # 1. corpus ------------------------------------------------------------
    corpus = out / "corpus"
    if not (corpus / METHODS[0] / DATASET / "res_540" / "split.json").exists():
        import jax

        jax.config.update("jax_platforms", "cpu")
        from crossscore_tpu.data.synthetic import generate_method_tree

        t0 = time.time()
        generate_method_tree(
            corpus, methods=METHODS, dataset_name=DATASET, hw=hw,
            scenes_per_split={"train": scenes[0], "val": scenes[1], "test": scenes[2]},
            n_train_imgs=n_tr, n_test_imgs=n_te,
        )
        print(f"corpus generated in {time.time() - t0:.0f}s -> {corpus}")
    roots = ",".join(str(corpus / m / DATASET) for m in METHODS)
    path_ov = f"data.dataset.path=[{roots}]"

    # 2. short train over the ConcatDataset --------------------------------
    ckpt = args.ckpt
    if ckpt is None:
        stdout = sh(
            [sys.executable, "-m", "crossscore_tpu.tasks.train",
             f"trainer.accelerator={args.accel}", f"run.dir={out}", "alias=mmtrain",
             path_ov, f"trainer.max_steps={args.train_steps}",
             "trainer.max_epochs=1000", "trainer.optimizer.lr=3e-4",
             "trainer.num_sanity_val_steps=0", "trainer.limit_val_batches=0",
             "logger.vis_imgs_every_n_train_steps=100000",
             "logger.vis_histogram_every_n_train_steps=100000"] + base,
            out,
        )
        run_dir = Path(re.search(r"train done: \d+ steps -> (.+)", stdout).group(1))
        if not run_dir.is_absolute():
            run_dir = out / run_dir
        ckpt = str(run_dir / "ckpt")

    # 3. K-sweep eval ------------------------------------------------------
    report = {"dataset": DATASET, "methods": list(METHODS), "ckpt": ckpt, "runs": []}
    import pandas as pd

    for k in ks:
        # no run.dir: the test root config derives its out dir from the
        # ckpt path (reference task/test.py:46-65 semantics)
        stdout = sh(
            [sys.executable, "-m", "crossscore_tpu.tasks.test",
             f"trainer.accelerator={args.accel}",
             f"alias=mmtest_k{k}", path_ov,
             f"trainer.ckpt_path_to_load={ckpt}",
             f"data.neighbour_config.cross={k}",
             "this_main.force_batch_size=true"] + base,
            out,
        )
        test_dir = Path(re.search(r"test done: \d+ batches -> (.+)", stdout).group(1))
        if not test_dir.is_absolute():
            test_dir = out / test_dir
        run = {"K": k, "test_dir": str(test_dir), "per_method": {}}
        snap = test_dir / "config.yaml"
        if snap.exists():
            import yaml

            run["resolved_config"] = yaml.safe_load(snap.read_text())
        with open(test_dir / "metrics.csv") as f:
            rows = list(csv.DictReader(f))
        run["pooled"] = {kk: float(v) for kk, v in rows[-1].items() if kk != "batch_idx"}
        for m in METHODS:
            df = pd.read_csv(test_dir / "score_summary" / DATASET / f"{m}.csv")
            run["per_method"][m] = {
                "n_frames": len(df),
                "pred_ssim_mean": round(float(df["pred_ssim_0_1"].mean()), 4),
            }
        report["runs"].append(run)

    # 4. GT summaries + per-frame correlation ------------------------------
    gt_dir = out / "gt_summary"
    for m in METHODS:
        sh([sys.executable, "-m", "crossscore_tpu.tasks.summarise_score_gt",
            "--dir_in", str(corpus / m / DATASET / "res_540"),
            "--dir_out", str(gt_dir), "-n", "4", "-f"], out)
    gt = {m: pd.read_csv(gt_dir / DATASET / f"{m}.csv") for m in METHODS}
    for run in report["runs"]:
        for m in METHODS:
            df = pd.read_csv(Path(run["test_dir"]) / "score_summary" / DATASET / f"{m}.csv")
            g = gt[m]
            merged = df.merge(
                g, left_on=["scene_name", "rendered_dir", "image_name"],
                right_on=["scene_name", "rendered_dir", "image_name"],
            )
            pm = run["per_method"][m]
            pm["gt_ssim_mean"] = round(float(merged["gt_ssim_0_1"].mean()), 4)
            if len(merged) >= 3:
                import numpy as np

                pm["frame_corr"] = round(float(np.corrcoef(
                    merged["pred_ssim_0_1"], merged["gt_ssim_0_1"])[0, 1]), 4)

    with open(out / "multimethod_report.json", "w") as f:
        json.dump(report, f, indent=2)
    slim = {k: v for k, v in report.items() if k != "runs"}
    slim["runs"] = [{k2: v2 for k2, v2 in r.items() if k2 != "resolved_config"}
                    for r in report["runs"]]
    print(json.dumps(slim, indent=2))


if __name__ == "__main__":
    main()
