"""On-chip training-convergence demonstration (VERDICT r2 #9).

Overfits ONE batch (B=4, K=2, 224px crops, bf16, deterministic crops — the
reference's ``overfit_batches`` mode, ``config/default.yaml:27`` +
``task/train.py:61,66``) through the REAL train CLI until the train-batch
correlation exceeds 0.95 and the L1 loss nears its floor — proving the full
gradient path (Pallas forward+backward kernels, masked AdamW, StepLR)
trains, not merely executes.

The batch is intentionally smaller than the production operating point: in
THIS environment the TPU sits behind a tunnel, so each step's H2D transfer
(463 MB of fp32 pixels at B=24/518px) dominates wall time by >50x — a purely
environmental artifact (CLAUDE.md); the gradient-path claim is shape-
independent, and the production-shape step itself is timed separately
(tools/train_microbench.py, 205 ms/step on-chip).

Usage: python tools/overfit_convergence.py [steps] [workdir] [crop]
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    workdir = Path(sys.argv[2]) if len(sys.argv) > 2 else Path("/tmp/overfit_ws")
    crop = int(sys.argv[3]) if len(sys.argv) > 3 else 224
    workdir.mkdir(parents=True, exist_ok=True)

    from crossscore_tpu.data.records import pack
    from crossscore_tpu.data.synthetic import generate

    data = workdir / "datadir"
    if not (data / "res_540" / "split.json").exists():
        # 2 train scenes x (8 gs_train + 4 gs_test) = 24 query items = one B=24 batch
        generate(data, hw=(540, 720), scenes_per_split={"train": 2, "val": 1, "test": 1},
                 n_train_imgs=8, n_test_imgs=4)
    if not (workdir / "decoded" / "index.npz").exists():
        # random-noise synthetic PNGs are pathological to inflate (~50 ms each
        # on this 1-core host); decoded shards make the overfit loop IO-free
        pack(data, workdir / "decoded", shard_mb=512, verbose=True, decoded=True)

    import os

    os.chdir(workdir)
    from crossscore_tpu.tasks.train import main as train_main

    run_dir = train_main([
        "data.dataset.path=[datadir]",
        f"data.dataset.record_dir={workdir / 'decoded'}",
        "data.loader.train.batch_size=4",
        "data.loader.train.num_workers=4",
        "data.loader.validation.batch_size=4",
        "data.loader.validation.num_workers=1",
        "data.neighbour_config.cross=2",
        f"data.transforms.crop_size={crop}",
        "this_main.resize_short_side=-1",
        "trainer.overfit_batches=1",
        f"trainer.max_epochs={steps}",
        "trainer.num_sanity_val_steps=0",
        "trainer.limit_val_batches=0",
        # 1e-3 oscillates with the 12-layer random-frozen backbone (CPU repro:
        # corr rises to ~0.45 then collapses); 3e-4 converges to 0.99
        "trainer.optimizer.lr=3e-4",
        "trainer.lr_scheduler.step_size=1000",  # keep lr flat over the run
        # trainable multi-view PE (reference `pos_enc.multi_view.req_grad`)
        # gives per-position capacity; without it the frozen-RANDOM backbone's
        # features cap memorisation ~0.78 corr at this size (r3 measured)
        "model.pos_enc.multi_view.req_grad=true",
        # unclamped ssim targets ([-1,1], tanh head): the min=0 clamp flattens
        # half of each synthetic map to exactly 0, starving the correlation
        "model.predict.metric.min=-1",
        "logger.vis_scalar_every_n_train_steps=1",
        "logger.vis_imgs_every_n_train_steps=100000",
        "logger.vis_histogram_every_n_train_steps=100000",
        "alias=overfit",
    ])

    rows = [json.loads(l) for l in (run_dir / "metrics.jsonl").read_text().splitlines()]
    tr = [(r["step"], r["train/loss_cross"], r["train/correlation_cross"])
          for r in rows if "train/correlation_cross" in r]
    print(f"steps logged: {len(tr)}")
    for s, loss, corr in tr[:: max(1, len(tr) // 12)]:
        print(f"  step {s:4d}: L1 {loss:.4f}  corr {corr:.4f}")
    best = max(c for _, _, c in tr)
    final = tr[-1]
    print(f"final: step {final[0]} L1 {final[1]:.4f} corr {final[2]:.4f} "
          f"(best corr {best:.4f})")
    assert best > 0.95, f"did not converge: best corr {best:.3f}"
    print("CONVERGED: correlation > 0.95 on the overfit batch")


if __name__ == "__main__":
    main()
