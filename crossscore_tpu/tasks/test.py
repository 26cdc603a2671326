"""Test/eval entry point: metrics against GT score maps over the NVS tree.

Public interface parity with reference ``task/test.py``:

    python -m crossscore_tpu.tasks.test \\
        trainer.ckpt_path_to_load=<ckpt> data.dataset.path=<root> \\
        this_main.data_split=test

Computes L1 loss, PSNR-from-L1 and Pearson correlation per batch, writes
``metrics.csv`` (CSVLogger-equivalent), per-frame score summaries, gray uint16
score-map PNGs and item-path JSONs — same on-disk layout as the reference.
Images are integer-patch cropped (``crop_mode=integer_patches``) so arbitrary
sizes evaluate without resampling the GT maps.
"""

from __future__ import annotations

import csv
from pathlib import Path

import numpy as np

from crossscore_tpu.tasks.common import parse_cli, resolve_out_dir, load_model_params


def test(cfg) -> Path:
    import jax

    from crossscore_tpu.tasks.common import apply_accelerator
    from crossscore_tpu.utils.compilation_cache import enable as enable_compile_cache

    apply_accelerator(cfg)
    enable_compile_cache()

    from crossscore_tpu.models import CrossScoreNet, CrossScoreConfig
    from crossscore_tpu.data import Loader
    from crossscore_tpu.data.nvs_index import get_dataset
    from crossscore_tpu.io.batch_writer import BatchWriter
    from crossscore_tpu.io.summariser import SummaryWriterPredictedOnlineTestPrediction
    from crossscore_tpu.utils.check_config import ConfigChecker
    from crossscore_tpu.utils.vis import make_visualiser
    from crossscore_tpu.train.step import make_eval_step

    from crossscore_tpu.tasks.common import confirm_batch_size

    ConfigChecker(cfg).check_test()
    confirm_batch_size(cfg)
    out_dir = resolve_out_dir(cfg, "test")
    (out_dir / "vis").mkdir(parents=True, exist_ok=True)

    dataset = get_dataset(
        cfg,
        cfg.this_main.data_split,
        return_item_paths=True,
        crop_mode=cfg.this_main.crop_mode,
        resize_short_side=cfg.this_main.resize_short_side,
        deterministic_crop=True,
    )
    # multi-device eval: batch sharded over a 1-D data mesh; no-op on one chip
    from crossscore_tpu.parallel import make_mesh, batch_sharding

    mesh = make_mesh(batch_size=cfg.data.loader.validation.batch_size)
    # shape bucketing: mixed-aspect test sets share one graph per bucket
    # (see tasks/predict.py / data/bucketing.py); metrics are masked to the
    # valid region inside the jitted step via batch["_valid_hw"]
    from crossscore_tpu.tasks.common import tristate

    bucket_mode = tristate(cfg.this_main.get("shape_buckets", "auto"))
    use_buckets = bucket_mode != "off" and cfg.this_main.crop_mode != "dataset_default"
    if use_buckets:
        shapes = {dataset.get_item_shape(i) for i in range(len(dataset))}
        if bucket_mode == "auto" and len(shapes) <= 1:
            use_buckets = False

    # cached-reference eval (this_main.ref_token_cache): encode each
    # reference image through the frozen backbone once per run — exact, since
    # test-path crops are deterministic per path (deterministic_crop=True
    # above). See tasks/predict.py for the serving-path analogue.
    cache_mode = tristate(cfg.this_main.get("ref_token_cache", "auto"))
    n_proc = jax.process_count()
    use_cache = (
        cache_mode != "off"
        and int(cfg.data.neighbour_config.cross) > 0
        and not cfg.data.dataset.zero_reference
        # multi-host composes (r3): each process evaluates its own index
        # shard on its LOCAL devices; epoch metrics reduce across processes
        # via all_process_weighted_mean (sync_dist equivalent) below
    )
    loader_kw = dict(
        batch_size=cfg.data.loader.validation.batch_size,
        num_workers=cfg.data.loader.validation.num_workers,
        prefetch_batches=cfg.data.loader.validation.prefetch_factor,
        seed=cfg.seed,
        # with the token cache the batch stays host-side (ref pixels never
        # reach the device); the jitted step transfers the rest
        sharding=None if use_cache else batch_sharding(mesh),
    )
    if use_cache and n_proc > 1:
        # disjoint per-process index shards; wrap-around duplicates are
        # masked by _valid inside the jitted metrics (data/loader.py)
        loader_kw.update(shard_index=jax.process_index(), num_shards=n_proc)
    if use_buckets:
        from crossscore_tpu.data.bucketing import ShapeBucketedLoader

        loader = ShapeBucketedLoader(
            dataset,
            bucket_multiple=int(cfg.this_main.get("bucket_multiple", 112)),
            **loader_kw,
        )
        print(
            f"shape-bucketed test: {len(shapes)} item shapes -> "
            f"{len(loader.distinct_buckets())} bucket graph(s)"
        )
    else:
        loader = Loader(dataset, shuffle=False, **loader_kw)

    mcfg = CrossScoreConfig.from_config(cfg)
    model = CrossScoreNet(mcfg)
    first = dataset.get_item(0, np.random.default_rng(cfg.seed))
    example = {
        "query/img": first["query/img"][None],
        "reference/cross/imgs": first["reference/cross/imgs"][None],
    }
    params = load_model_params(cfg, model, example)

    writer = BatchWriter(cfg, "test") if cfg.logger.test.write.flag.batch else None
    summariser = SummaryWriterPredictedOnlineTestPrediction(
        metric_type=cfg.model.predict.metric.type,
        metric_min=cfg.model.predict.metric.min,
        dir_out=str(out_dir),
    )
    visualiser = make_visualiser(cfg)
    eval_step = jax.jit(make_eval_step(model))

    token_cache = None
    cache_sharding = None
    if use_cache:
        # cached eval runs on a host-LOCAL data mesh (plain DP on one host;
        # the per-rank shard compute under multi-host — see
        # parallel.local_batch_sharding)
        from jax.sharding import NamedSharding, PartitionSpec

        from crossscore_tpu.parallel import local_batch_sharding

        cache_sharding = local_batch_sharding(cfg.data.loader.validation.batch_size)
        params_local = jax.device_put(
            params, NamedSharding(cache_sharding.mesh, PartitionSpec())
        )
        from crossscore_tpu.data.token_cache import RefTokenCache
        from crossscore_tpu.models.crossscore import make_backbone_encoder

        encode = jax.jit(make_backbone_encoder(mcfg))
        token_cache = RefTokenCache(
            lambda imgs, valid_hw=None: encode(params, imgs, valid_hw),
            encode_batch=int(cfg.this_main.get("ref_token_cache_encode_batch", 16)),
            max_items=int(cfg.this_main.get("ref_token_cache_max_items", 2048)),
            persist_dir=cfg.this_main.get("ref_token_cache_dir"),
        )
        print("reference-token cache: on (frozen backbone, exact"
              f"{'; bucketed' if use_buckets else ''})")

    vis_every = cfg.logger.test.write.config.vis_img_every_n_steps
    from crossscore_tpu.tasks.common import resolve_limit

    max_batches = resolve_limit(cfg.trainer.limit_test_batches, loader.batches_per_epoch())

    rows = []
    row_weights = []  # valid (non-padded) item count per batch

    def process(batch_idx, batch, pred_dev, metrics_dev):
        outputs = {"score_map_ref_cross": np.asarray(pred_dev, dtype=np.float32)}
        from crossscore_tpu.tasks.common import crop_bucketed, iter_bucketed_items

        rows.append(
            {
                "batch_idx": batch_idx,
                "test/loss": float(metrics_dev["loss"]),
                "test/loss_cross": float(metrics_dev["loss_cross"]),
                "test/corr_cross": float(metrics_dev["correlation_cross"]),
                "test/psnr_cross": float(metrics_dev["psnr_cross"]),
            }
        )
        row_weights.append(int(batch.get("_valid", len(batch["query/img"]))))

        vhw = batch.get("_valid_hw")
        if vhw is not None and np.ndim(vhw) == 2:
            # bucket-PACKED batch (mixed item shapes): consumers take
            # individually-cropped B=1 slices; metrics above are already
            # per-item-masked inside the jitted step
            for i, b1, o1 in iter_bucketed_items(batch, outputs):
                summariser.update(batch_input=b1, batch_output=o1)
                if i == 0 and vis_every > 0 and batch_idx % vis_every == 0:
                    import matplotlib.pyplot as plt

                    fig = visualiser.vis(b1, o1)
                    fig.savefig(out_dir / "vis" / f"r{jax.process_index()}_B{batch_idx:04}_b0.png")
                    plt.close(fig)
                if writer is not None:
                    writer.write_out(b1, o1, local_rank=jax.process_index(),
                                     batch_idx=batch_idx, item_offset=i)
            return

        batch, outputs = crop_bucketed(batch, outputs)
        summariser.update(batch_input=batch, batch_output=outputs)
        if vis_every > 0 and batch_idx % vis_every == 0:
            import matplotlib.pyplot as plt

            fig = visualiser.vis(batch, outputs)
            fig.savefig(out_dir / "vis" / f"r{jax.process_index()}_B{batch_idx:04}_b0.png")
            plt.close(fig)
        if writer is not None:
            writer.write_out(batch, outputs, local_rank=jax.process_index(), batch_idx=batch_idx)

    # one-deep pipeline: overlap device compute with host-side writing
    pending = None
    for batch_idx, batch in enumerate(loader.epoch(0)):
        if max_batches is not None and batch_idx >= max_batches:
            break
        # _valid rides into the jitted step: metrics are masked so padded
        # duplicate items in the final batch don't bias them (VERDICT r1)
        arrays = {k: v for k, v in batch.items() if k != "item_paths"}
        if token_cache is not None:
            arrays["reference/cross/tokens"] = token_cache.gather(
                batch["item_paths"]["reference/cross/imgs"],
                batch["reference/cross/imgs"],
                # bucket-padded batches: per-item valid shapes qualify the
                # cache keys and mask the miss-encode (cache x bucketing)
                valid_hw=batch.get("_valid_hw"),
            )
            del arrays["reference/cross/imgs"]  # pixels stay host-side
            bs = len(batch["query/img"])
            arrays = {
                k: (jax.device_put(v, cache_sharding)
                    if getattr(v, "ndim", 0) > 0 and len(v) == bs else v)
                for k, v in arrays.items()
            }
            pred_dev, metrics_dev = eval_step(params_local, arrays)
        else:
            pred_dev, metrics_dev = eval_step(params, arrays)
        if pending is not None:
            process(*pending)
        pending = (batch_idx, batch, pred_dev, metrics_dev)
    if pending is not None:
        process(*pending)

    # CSVLogger-equivalent epoch metrics; the mean row weights each batch by
    # its valid item count so every item counts exactly once
    if rows:
        if n_proc > 1:
            # reference `self.log(..., sync_dist=True)`: the mean row covers
            # every process's shard, weighted by valid item counts
            from crossscore_tpu.tasks.common import all_process_weighted_mean

            keys = [k for k in rows[0] if k != "batch_idx"]
            means = all_process_weighted_mean(
                [[r[k] for r in rows] for k in keys], row_weights
            )
            agg = dict(zip(keys, means))
        else:
            w = np.asarray(row_weights, np.float64)
            w = w / max(w.sum(), 1.0)
            agg = {
                k: float(np.sum(w * np.asarray([r[k] for r in rows])))
                for k in rows[0]
                if k != "batch_idx"
            }
        with open(out_dir / "metrics.csv", "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            w.writeheader()
            w.writerows(rows)
            agg_row = {"batch_idx": "mean", **{k: round(v, 6) for k, v in agg.items()}}
            w.writerow(agg_row)
        print("test metrics:", agg)

    summariser.summarise()
    print(f"test done: {len(rows)} batches -> {out_dir}")
    return out_dir


def main(argv=None):
    cfg = parse_cli("default_test", argv)
    return test(cfg)


if __name__ == "__main__":
    main()
