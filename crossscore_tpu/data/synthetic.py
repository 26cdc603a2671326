"""Synthetic NVS dataset generator (tests, demos, pipeline benchmarks).

Produces the exact directory layout the reference's preprocessing emits
(reference ``dataloading/dataset/nvs_dataset.py:321-426``):

    <root>/<res>/split.json
    <root>/<res>/<scene>/{train,test}/ours_<iter>/renders/frame_XXXXX.png
    <root>/<res>/<scene>/{train,test}/ours_<iter>/gt/frame_XXXXX.png
    <root>/<res>/<scene>/{train,test}/ours_<iter>/metric_map/{ssim,mae}/frame_XXXXX.png

Renders are GT plus noise; metric maps are smooth random fields written with
the uint16 codec. CLI: ``python -m crossscore_tpu.data.synthetic <root> [--hw 84 112]``.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from crossscore_tpu.io.images import image_write, metric_map_write


def generate(
    root: str | Path,
    resolution: str = "res_540",
    scenes_per_split: dict | None = None,
    n_train_imgs: int = 4,
    n_test_imgs: int = 3,
    iters: tuple = (1000,),
    hw: tuple = (84, 112),
    seed: int = 0,
) -> Path:
    scenes_per_split = scenes_per_split or {"train": 2, "val": 1, "test": 1}
    root = Path(root)
    res_dir = root / resolution
    res_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)

    # hw: one (H, W) for all scenes, or a list cycled per scene (mixed-aspect
    # datasets for shape-bucketing tests)
    hw_list = [tuple(hw)] if isinstance(hw[0], int) else [tuple(x) for x in hw]

    split_json: dict[str, list[str]] = {}
    scene_id = 0
    for split, count in scenes_per_split.items():
        split_json[split] = []
        for _ in range(count):
            scene = f"s{scene_id:05d}"
            hw = hw_list[scene_id % len(hw_list)]
            scene_id += 1
            split_json[split].append(scene)
            for gs_split, n_imgs in (("train", n_train_imgs), ("test", n_test_imgs)):
                for it in iters:
                    base = res_dir / scene / gs_split / f"ours_{it}"
                    for sub in ("renders", "gt", "metric_map/ssim", "metric_map/mae"):
                        (base / sub).mkdir(parents=True, exist_ok=True)
                    for i in range(n_imgs):
                        name = f"frame_{i:05d}.png"
                        gt = rng.random((*hw, 3)).astype(np.float32)
                        render = np.clip(gt + rng.normal(0, 0.08, gt.shape), 0, 1).astype(
                            np.float32
                        )
                        # smooth random metric maps
                        coarse = rng.random((6, 8)).astype(np.float32)
                        reps = (hw[0] // 6 + 1, hw[1] // 8 + 1)
                        ssim = np.kron(coarse, np.ones(reps, np.float32))[: hw[0], : hw[1]]
                        ssim = ssim * 1.6 - 0.8  # in [-0.8, 0.8]
                        mae = np.abs(render - gt).mean(-1)

                        image_write(base / "renders" / name, render)
                        image_write(base / "gt" / name, gt)
                        metric_map_write(base / "metric_map/ssim" / name, ssim, [-1, 1])
                        metric_map_write(base / "metric_map/mae" / name, mae, [0, 1])

    with open(res_dir / "split.json", "w") as f:
        json.dump(split_json, f, indent=2)
    return root


def main(argv=None) -> None:
    import argparse

    ap = argparse.ArgumentParser(description="Generate a synthetic NVS dataset tree")
    ap.add_argument("root")
    ap.add_argument("--resolution", default="res_540")
    ap.add_argument("--hw", type=int, nargs=2, default=(84, 112))
    ap.add_argument("--train-imgs", type=int, default=4)
    ap.add_argument("--test-imgs", type=int, default=3)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)
    path = generate(
        args.root,
        resolution=args.resolution,
        hw=tuple(args.hw),
        n_train_imgs=args.train_imgs,
        n_test_imgs=args.test_imgs,
        seed=args.seed,
    )
    print(f"Synthetic dataset written to {path}")


if __name__ == "__main__":
    main()
