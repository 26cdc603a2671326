"""Training entry point: data-parallel SPMD training over the device mesh.

Public interface parity with reference ``task/train.py``:

    python -m crossscore_tpu.tasks.train data.dataset.path=[<root>] alias=run1 \\
        trainer.max_epochs=9 trainer.optimizer.lr=5e-4

TPU-native execution model (replaces Lightning DDP, reference
``task/train.py:109-114``): ONE jitted train step (forward incl. frozen
backbone, L1 loss, backward, masked AdamW) compiled once over a 1-D ``data``
mesh; batches arrive sharded on the batch dim, params replicated; XLA inserts
the gradient all-reduce over ICI. Multi-host runs call
``jax.distributed.initialize`` (``trainer.multi_host=true``) and shard the
index space per host; only process 0 writes logs/checkpoints.

Checkpointing: orbax, wall-clock interval (default 2h) + save_last, keeping
the full train state (params, Adam moments, step) — resume with
``trainer.ckpt_path_to_load=<run_dir>/ckpt``.
"""

from __future__ import annotations

import time
from pathlib import Path

import numpy as np

from crossscore_tpu.tasks.common import parse_cli, timestamp, JsonlLogger, device_view


def apply_train_recipe(cfg) -> str:
    """One-flag production recipes (``this_main.train_recipe``).

    ``token_fast`` composes the validated fast-path pieces that previously
    had to be hand-assembled (6.41x train step, PERFORMANCE.md): token-space
    training (decoder-only train graph, ``this_main.token_space_train``),
    uint8 pixels on the wire (``data.dataset.wire_uint8`` — quarters the
    host->device traffic), and a token cache sized to the in-flight working
    set.

    The geometry guard — falling back to the pixel recipe when the crop
    covers too small a FRACTION of the image — lives in :func:`train` after
    the dataset is built (``token_fast_coverage_guard``), because only the
    dataset knows the true image sizes. The measured axis (three on-chip
    A/Bs, docs/results/ab_token_vs_pixel_*): token matched pixel at 69%
    area coverage (crop 518 on 540x720), and clearly regressed at 45%
    (cpu-tiny, dL1 ~0.02) and at 16% (crop 252 on 540x720, dL1 0.023) —
    the token path's full-image attention context (vs the reference's
    crop-context encode, ``task/core.py:119-161``) hurts when the extra
    context dwarfs the crop, not when the crop dominates the image.

    Returns the recipe applied (``token_fast`` or ``default``);
    ``default``/``pixel`` are no-ops; unknown names raise.
    """
    recipe = str(cfg.this_main.get("train_recipe", "default") or "default")
    if recipe in ("default", "pixel"):
        return "default"
    if recipe != "token_fast":
        raise ValueError(
            f"unknown this_main.train_recipe {recipe!r}; "
            "expected default | pixel | token_fast"
        )
    from crossscore_tpu.confsys import set_key
    from crossscore_tpu.data.token_train import token_working_set

    set_key(cfg, "this_main.token_space_train", True)
    set_key(cfg, "data.dataset.wire_uint8", True)
    need = token_working_set(
        prefetch_batches=int(cfg.data.loader.train.prefetch_factor),
        batch_size=int(cfg.data.loader.train.batch_size),
        k=int(cfg.data.neighbour_config.cross),
    )
    if int(cfg.this_main.get("ref_token_cache_max_items", 0)) < need:
        set_key(cfg, "this_main.ref_token_cache_max_items", need)
    print(
        f"train_recipe=token_fast: token-space training + uint8 wire, "
        f"token cache sized >= {need} items",
        flush=True,
    )
    return "token_fast"


def token_fast_coverage_guard(cfg, ds_train) -> bool:
    """Post-dataset geometry guard for the ``token_fast`` recipe.

    Returns True when the token path should stay on, False to fall back to
    pixel crops. The gate is the crop's AREA COVERAGE of the (resized,
    trimmed) image — ``crop^2 / (H*W)`` from the dataset's own item shapes
    (``get_item_shape`` reads only PNG headers) against
    ``this_main.token_fast_min_coverage`` (default 0.6). Measured points
    (on-chip A/Bs, docs/results): 0.69 coverage -> token == pixel across 3
    seeds; 0.55 -> mild onset (dL1 +0.005, ~1.7x seed noise, n=1); 0.45
    and 0.16 -> clear regressions (dL1 ~0.02, ~8x seed noise). The 0.6
    default sits between the measured-mild 0.55 and the measured-clean
    0.69 points. Manual ``this_main.token_space_train=true`` (without the
    recipe) is never second-guessed."""
    import warnings

    crop = int(cfg.data.transforms.crop_size)
    min_cov = float(cfg.this_main.get("token_fast_min_coverage", 0.6) or 0)
    if len(ds_train) == 0 or min_cov <= 0:
        return True
    h, w = ds_train.get_item_shape(0)
    cov = crop * crop / float(h * w)
    if cov >= min_cov:
        return True
    warnings.warn(
        f"train_recipe=token_fast: the {crop}px crop covers only "
        f"{cov:.0%} of the {h}x{w} image (< token_fast_min_coverage="
        f"{min_cov:.0%}) — the measured regime where the token path's "
        "full-image attention context regresses quality (docs/results "
        "A/Bs at 45% and 16% coverage); falling back to pixel crops. "
        "Set this_main.token_space_train=true to force the token path, "
        "or lower this_main.token_fast_min_coverage",
        RuntimeWarning,
        stacklevel=2,
    )
    return False


def train(cfg) -> Path:
    import jax
    import jax.numpy as jnp

    from crossscore_tpu.tasks.common import apply_accelerator
    from crossscore_tpu.utils.compilation_cache import enable as enable_compile_cache

    apply_accelerator(cfg)
    enable_compile_cache()

    from crossscore_tpu.models import CrossScoreNet, CrossScoreConfig
    from crossscore_tpu.data import Loader
    from crossscore_tpu.data.nvs_index import get_dataset
    from crossscore_tpu.io.checkpoint import CheckpointManager
    from crossscore_tpu.io.summariser import SummaryWriterPredictedOnline
    from crossscore_tpu.parallel import make_mesh, batch_sharding, replicated
    from crossscore_tpu.train import make_optimizer, make_train_step, make_eval_step, create_train_state
    from crossscore_tpu.utils.check_config import ConfigChecker
    from crossscore_tpu.utils.metric_logger import MetricLoggerScalar
    from crossscore_tpu.utils.vis import make_visualiser

    ConfigChecker(cfg).check_train_val()
    recipe = apply_train_recipe(cfg)

    if cfg.trainer.get("multi_host", False):
        jax.distributed.initialize()
    proc0 = jax.process_index() == 0

    run_dir = Path(cfg.run.dir) / f"{timestamp()}_{cfg.alias}" if cfg.alias else Path(
        cfg.run.dir
    ) / timestamp()
    if proc0:
        run_dir.mkdir(parents=True, exist_ok=True)
        from crossscore_tpu.tasks.common import save_config_snapshot

        save_config_snapshot(cfg, run_dir)
    logger = JsonlLogger(run_dir, cfg, use_wandb=cfg.logger.use_wandb) if proc0 else None

    # ------------------------------------------------------------------ data
    overfit = cfg.trainer.overfit_batches
    deterministic_crop = overfit > 0
    # token-space training (this_main.token_space_train, data/token_train.py):
    # the train dataset yields FULL %14-trimmed images; the loader encodes
    # each unique image once through the frozen backbone and slices
    # patch-aligned token windows — the train step becomes the decoder-only
    # graph. Opt-in: full-image attention context + 14px-aligned offsets are
    # a documented semantic delta vs the reference's pixel crops. Validation
    # stays on the pixel path (parity eval).
    token_train = bool(cfg.this_main.get("token_space_train", False))
    ds_train = get_dataset(
        cfg, "train",
        crop_mode="integer_patches" if token_train else "dataset_default",
        return_item_paths=token_train,
        resize_short_side=cfg.this_main.resize_short_side,
        deterministic_crop=deterministic_crop,
    )
    if token_train and recipe == "token_fast" and not token_fast_coverage_guard(cfg, ds_train):
        # recipe-engaged token mode at a measured-bad geometry: fall back to
        # the reference's pixel crops (rebuild with the default crop mode)
        token_train = False
        from crossscore_tpu.confsys import set_key

        set_key(cfg, "this_main.token_space_train", False)
        ds_train = get_dataset(
            cfg, "train", crop_mode="dataset_default",
            resize_short_side=cfg.this_main.resize_short_side,
            deterministic_crop=deterministic_crop,
        )
    ds_val = get_dataset(
        cfg, "test", return_item_paths=True, crop_mode="dataset_default",
        resize_short_side=cfg.this_main.resize_short_side,
        deterministic_crop=deterministic_crop,
    )

    devices_cfg = cfg.trainer.devices
    if devices_cfg in (-1, None):
        n_dev = None
    elif isinstance(devices_cfg, int):
        n_dev = devices_cfg  # Lightning semantics: number of devices
    else:
        n_dev = len(devices_cfg)  # explicit device-index list
    mesh = make_mesh(n_dev, batch_size=cfg.data.loader.train.batch_size)
    bsh = batch_sharding(mesh)

    train_loader_kw = dict(
        batch_size=cfg.data.loader.train.batch_size,
        shuffle=cfg.data.loader.train.shuffle and overfit == 0,
        num_workers=cfg.data.loader.train.num_workers,
        prefetch_batches=cfg.data.loader.train.prefetch_factor,
        seed=cfg.seed,
        drop_last=True,
        shard_index=jax.process_index(),
        num_shards=jax.process_count(),
        sharding=bsh,
    )
    if token_train:
        from crossscore_tpu.data.token_cache import RefTokenCache
        from crossscore_tpu.data.token_train import TokenSpaceLoader

        # the encoder binds the (frozen) backbone params, which exist only
        # after model init below — late-bound through this cell; the loader
        # first encodes inside epoch(), well after the binding
        _encode_cell: dict = {}
        token_cache = RefTokenCache(
            lambda imgs, valid_hw=None: _encode_cell["fn"](imgs),
            encode_batch=int(cfg.this_main.get("ref_token_cache_encode_batch", 16)),
            max_items=int(cfg.this_main.get("ref_token_cache_max_items", 2048)),
            persist_dir=cfg.this_main.get("ref_token_cache_dir"),
        )
        loader_train = TokenSpaceLoader(
            ds_train, token_cache,
            crop_size=int(cfg.data.transforms.crop_size),
            deterministic_crop=deterministic_crop,
            **train_loader_kw,
        )
        # decode-skip: the train path never consumes pixels of a cached
        # image (windows are sliced from cached tokens; supervision is the
        # score map) — skip their PNG decode entirely. Fused-path only;
        # exact (the integer_patches geometry draws no rng). Steady-state
        # epochs decode only the score maps; with a warm persist_dir store
        # (tasks.encode_tokens) that holds from step one.
        from crossscore_tpu.data import fastimage
        from crossscore_tpu.data.nvs_index import leaf_datasets

        if fastimage.available():
            for _leaf in leaf_datasets(ds_train):
                _leaf.ref_pixel_skip = token_cache.has
                _leaf.query_pixel_skip = token_cache.has
    else:
        loader_train = Loader(ds_train, **train_loader_kw)
    # the mesh data axis is sized for the TRAIN batch; a val batch size it
    # does not divide falls back to replicated device_put (correct, just not
    # batch-sharded — only reachable with mismatched train/val batch configs)
    val_bs = cfg.data.loader.validation.batch_size
    val_bsh = bsh if val_bs % mesh.shape["data"] == 0 else replicated(mesh)
    loader_val = Loader(
        ds_val,
        batch_size=val_bs,
        shuffle=cfg.data.loader.validation.shuffle,
        num_workers=cfg.data.loader.validation.num_workers,
        prefetch_batches=cfg.data.loader.validation.prefetch_factor,
        seed=cfg.seed + 1,
        # keep the final partial batch (reference torch DataLoader default
        # drop_last=False, task/train.py:86-103): padded duplicates are masked
        # out of the metrics via _valid, so EVERY val sample is scored
        drop_last=False,
        shard_index=jax.process_index(),
        num_shards=jax.process_count(),
        sharding=val_bsh,
    )

    from crossscore_tpu.tasks.common import resolve_limit

    steps_per_epoch = loader_train.batches_per_epoch()
    limit_train = resolve_limit(cfg.trainer.limit_train_batches, steps_per_epoch)
    if limit_train is None:
        limit_train = steps_per_epoch
    if overfit > 0:
        limit_train = int(overfit)
    limit_val = resolve_limit(cfg.trainer.limit_val_batches, loader_val.batches_per_epoch())
    if limit_val is None:
        limit_val = loader_val.batches_per_epoch()

    # ----------------------------------------------------------------- model
    mcfg = CrossScoreConfig.from_config(cfg)
    model = CrossScoreNet(mcfg)

    item0 = ds_train.get_item(0, np.random.default_rng(cfg.seed))
    params = model.init(
        jax.random.PRNGKey(cfg.seed),
        jnp.asarray(item0["query/img"][None]),
        jnp.asarray(item0["reference/cross/imgs"][None]),
    )["params"]
    # pretrained backbone (orbax dir or HF/Lightning ckpt) can be injected via
    # model.backbone_init_path
    bb_init = cfg.model.backbone.get("init_path")
    if bb_init:
        from crossscore_tpu.io.checkpoint import load_params

        params["backbone"] = load_params(bb_init, like=params["backbone"])

    # the epoch-interval StepLR must count ACTUAL optimiser steps per epoch
    # (limit_train_batches/overfit shrink the epoch), matching Lightning's
    # per-real-epoch stepping
    actual_steps_per_epoch = max(1, min(steps_per_epoch, limit_train))
    tx, lr_schedule = make_optimizer(cfg, params, steps_per_epoch=actual_steps_per_epoch)
    state = create_train_state(params, tx)
    state = jax.device_put(state, replicated(mesh))

    ckpt_mgr = CheckpointManager(
        run_dir / "ckpt",
        train_time_interval_hours=cfg.trainer.checkpointing.train_time_interval,
        every_n_train_steps=cfg.trainer.checkpointing.every_n_train_steps,
        every_n_epochs=cfg.trainer.checkpointing.every_n_epochs,
        hparams=cfg.to_dict() if proc0 else None,
    )
    start_epoch, start_batch = 0, 0
    if cfg.trainer.ckpt_path_to_load is not None:
        from crossscore_tpu.io.checkpoint import CheckpointManager as CM, load_hparams

        # the stored hparams make the ckpt self-describing; a resume under a
        # DIFFERENT config is legal (e.g. new lr) but must be loud, because
        # silent drift makes archived runs unreproducible
        old_hparams = load_hparams(cfg.trainer.ckpt_path_to_load)
        if old_hparams is not None:
            from crossscore_tpu.tasks.common import config_diff

            # run-identity keys (alias, out dirs) legitimately differ
            diffs = [
                d for d in config_diff(old_hparams, cfg.to_dict())
                if not d.startswith(("alias:", "run.", "logger.", "trainer.ckpt_path_to_load:"))
            ]
            if diffs:
                print(
                    "WARNING: resuming with a config that differs from the "
                    "checkpoint's hparams.yaml:\n  " + "\n  ".join(diffs)
                )

        resume_mgr = CM(cfg.trainer.ckpt_path_to_load)
        state = resume_mgr.restore(None, like=state)
        # exact loop cursor from the train state (not derived from step
        # counts, which drifts when limits/dataset size change between runs)
        start_epoch = int(state.epoch)
        start_batch = int(state.batch_in_epoch)
        if start_batch >= actual_steps_per_epoch:
            start_epoch, start_batch = start_epoch + 1, 0
        print(
            f"resumed from step {int(state.step)} "
            f"(epoch {start_epoch}, batch {start_batch})"
        )

    if token_train:
        from functools import partial

        from crossscore_tpu.models.crossscore import make_backbone_encoder

        # bind the token encoder to the POST-RESUME params (a resumed run's
        # frozen backbone is the original run's, not this process's fresh
        # init); training never updates the backbone (masked optimizer), so
        # the bound tokens stay valid for the whole run. COPY the subtree:
        # train_step donates the state, which would invalidate the original
        # buffers after the first step
        _bb_copy = {"backbone": jax.tree_util.tree_map(
            lambda x: jnp.array(x), state.params["backbone"]
        )}
        _encode_cell["fn"] = partial(jax.jit(make_backbone_encoder(mcfg)), _bb_copy)

    # model.tpu.scoped_vmem_kib > 0 raises the scoped-VMEM ceiling for these
    # jits (TPU only — the flag is unknown to other backends). The 2x-res
    # ViT-L stress config needs 32768: the decoder backward keeps whole-nq
    # q/do/dq blocks + an f32 scratch in VMEM, which overflows the 16M
    # default at the 74x74 token grid (PERFORMANCE.md r4 stress section).
    jit_kw = {}
    svk = int(cfg.model.tpu.get("scoped_vmem_kib", 0))
    if svk > 0 and jax.default_backend() not in ("cpu",):
        jit_kw["compiler_options"] = {"xla_tpu_scoped_vmem_limit_kib": str(svk)}
    train_step = jax.jit(make_train_step(model, tx), donate_argnums=(0,), **jit_kw)
    eval_step = jax.jit(make_eval_step(model), **jit_kw)

    # ------------------------------------------------------------- callbacks
    cache_n = cfg.logger.cache_size.train.n_scalar
    train_cache = {"loss": MetricLoggerScalar(cache_n)}
    visualiser = make_visualiser(cfg)
    summariser = SummaryWriterPredictedOnline(
        metric_type=cfg.model.predict.metric.type, metric_min=cfg.model.predict.metric.min
    )
    (run_dir / "vis").mkdir(parents=True, exist_ok=True)

    def run_validation(epoch: int, step: int, max_batches: int):
        if max_batches <= 0:
            return  # don't even spin up the loader: its producer thread
            # eagerly decodes a full prefetch batch the consumer would discard
        from crossscore_tpu.tasks.common import device_view, host_batch, host_rows

        losses, corrs, weights = [], [], []
        for vb_idx, vbatch in enumerate(loader_val.epoch(epoch)):
            if vb_idx >= max_batches:
                break
            # _valid rides into the jitted step as the padded-duplicate mask
            # (single-process scalar prefix, or the per-row _valid_mask of a
            # multi-host global batch — device_view strips the host-side int
            # there, which diverges per process)
            varrays = device_view({k: v for k, v in vbatch.items() if k != "item_paths"})
            pred, metrics = eval_step(state.params, varrays)
            losses.append(float(metrics["loss"]))
            corrs.append(float(metrics["correlation_cross"]))
            weights.append(float(vbatch.get("_valid", len(vbatch["query/img"]))))
            # host consumers pair arrays with the process-local item_paths —
            # under multi-host they get this process's rows of the global pred
            pred_np = np.asarray(host_rows(pred), np.float32)
            hbatch = host_batch(vbatch)
            summariser.update(hbatch, {"score_map_ref_cross": pred_np})
            if proc0 and vb_idx < cfg.logger.cache_size.validation.n_fig:
                import matplotlib.pyplot as plt

                fig = visualiser.vis(hbatch, {"score_map_ref_cross": pred_np})
                fig.savefig(run_dir / "vis" / f"val_e{epoch:03}_B{vb_idx:02}.png")
                plt.close(fig)
        if losses:
            # weighted by valid items per batch, then all-reduced over hosts —
            # the equivalent of the reference's self.log(sync_dist=True)
            # (task/core.py:449): the logged mean covers ALL data, not 1/N.
            # The reduction is collective: EVERY process must reach it.
            from crossscore_tpu.tasks.common import all_process_weighted_mean

            loss, corr = all_process_weighted_mean([losses, corrs], weights)
        if losses and logger is not None:
            logger.log(
                {
                    "validation/loss": loss,
                    "validation/loss_cross": loss,
                    "validation/correlation_cross": corr,
                    "validation/psnr_cross": float(-10 * np.log10(loss**2)) if loss > 0 else 99.0,
                },
                step,
            )
        summariser.reset()

    # ------------------------------------------------------------------ loop
    global_step = int(state.step)
    max_steps = cfg.trainer.max_steps
    t_start = time.time()
    stop = False

    # profiling (reference uses PyTorchProfiler schedule wait=10 warmup=2
    # active=10, task/train.py:134-144): trace steps 12..22 to XPlane/Perfetto
    profile_window = (12, 22) if cfg.trainer.do_profiling and proc0 else None
    profile_dir = str(cfg.trainer.get("profile_dir") or (run_dir / "profiler"))

    if cfg.trainer.num_sanity_val_steps > 0:
        run_validation(0, global_step, cfg.trainer.num_sanity_val_steps)

    pending_losses: list = []  # device scalars; pulled to host at log cadence

    def ckpt_due(step: int, epoch_end: bool = False, epoch: int = 0) -> bool:
        """Uniform-across-processes checkpoint decision.

        Orbax saves of globally-sharded arrays are COLLECTIVE — every process
        must enter save() together — so the decision must not be proc0's
        alone. Step/epoch cadences are deterministic in (config, step) and
        need no coordination; the wall-clock interval (a per-host clock) is
        proc0's verdict broadcast to all, checked at a coarse step cadence so
        the hot loop doesn't pay a collective every step (a 2 h cadence
        doesn't need single-step resolution)."""
        if ckpt_mgr.should_save(step, epoch_end=epoch_end, epoch=epoch, wall_clock=False):
            return True
        if not (epoch_end or step % 16 == 0):
            return False
        if jax.process_count() == 1:
            return ckpt_mgr.wall_clock_due()
        from jax.experimental import multihost_utils

        return bool(multihost_utils.broadcast_one_to_all(
            np.asarray(proc0 and ckpt_mgr.wall_clock_due())
        ))

    # sustained end-to-end throughput window (loader in the loop): warm up
    # for N steps (compile + cache fill), then time to the end of the run.
    # Timing anchors are SMALL-SCALAR host fetches — block_until_ready on a
    # remote pytree does not synchronise through the tunnel (CLAUDE.md).
    # Use max_steps within one epoch for a pure train window (per-epoch
    # validation otherwise lands inside it).
    sustain_after = int(cfg.this_main.get("sustained_report_after_steps", 0) or 0)
    sustain_t0 = sustain_s0 = None
    loop_steps = 0

    for epoch in range(start_epoch, cfg.trainer.max_epochs):
        if int(state.epoch) != epoch:
            # new epoch boundary: reset the on-device loop cursor
            state = state.replace(
                epoch=jnp.asarray(epoch, jnp.int32),
                batch_in_epoch=jnp.asarray(0, jnp.int32),
            )
        epoch_start_batch = start_batch if epoch == start_epoch else 0
        for batch_idx, batch in enumerate(
            loader_train.epoch(0 if overfit else epoch, start_batch=epoch_start_batch),
            start=epoch_start_batch,
        ):
            if batch_idx >= limit_train:
                break
            batch.pop("item_paths", None)
            # unified final-batch loss semantics across process counts: the
            # padded-duplicate mask stays in the batch (single-process
            # ``_valid`` prefix count; multi-host per-row ``_valid_mask``)
            # so ``_weights`` zeroes duplicate rows out of the training loss
            # either way — the reference never trains on duplicates (its
            # final torch batch is simply smaller, ``task/train.py:86-103``)
            batch = device_view(batch)
            if profile_window and global_step == profile_window[0]:
                jax.profiler.start_trace(profile_dir)
            state, metrics = train_step(state, batch)
            pred_dev = metrics.pop("pred")
            global_step += 1
            loop_steps += 1
            if sustain_after and loop_steps == sustain_after:
                float(metrics["loss"])  # host fetch = device sync anchor
                sustain_t0, sustain_s0 = time.time(), global_step
            if profile_window and global_step == profile_window[1]:
                jax.block_until_ready(metrics)
                jax.profiler.stop_trace()
                print(f"profiler trace written to {profile_dir}")

            # cache the loss EVERY step (reference MetricLoggerScalar
            # accumulates every training batch, task/core.py:330-338) — but
            # keep it as a device scalar; host transfer happens in one batched
            # pull at logging cadence, so the hot loop never syncs
            if proc0:
                pending_losses.append(metrics["loss"])

            if proc0 and global_step % cfg.logger.vis_scalar_every_n_train_steps == 0:
                if jax.process_count() > 1:
                    # replicated global scalars fetch locally one by one;
                    # jnp.stack would DISPATCH a computation on
                    # non-fully-addressable arrays from this process alone
                    for x in pending_losses:
                        train_cache["loss"].update(float(x))
                else:
                    for x in np.asarray(jnp.stack(pending_losses)):
                        train_cache["loss"].update(float(x))
                pending_losses.clear()
                m = {k: float(v) for k, v in metrics.items()}
                logger.log(
                    {
                        "train/loss": train_cache["loss"].compute(),
                        "train/loss_cross": m["loss_cross"],
                        "train/psnr_cross": m["psnr_cross"],
                        "train/correlation_cross": m["correlation_cross"],
                        # optax count at the time of this update (post-step
                        # global_step is one ahead)
                        "train/lr": float(lr_schedule(global_step - 1)),
                        "train/steps_per_sec": global_step / max(1e-9, time.time() - t_start),
                    },
                    global_step,
                )

            # train-batch figure + score/L1-diff histograms at their cadences,
            # reusing the training forward's prediction (reference
            # task/core.py:312-362 reuses training_step outputs the same way)
            # token batches carry no pixels to draw; the val-path figures
            # (pixel pipeline) still cover visual monitoring in token mode
            need_fig = (proc0 and not token_train
                        and global_step % cfg.logger.vis_imgs_every_n_train_steps == 0)
            need_hist = proc0 and global_step % cfg.logger.vis_histogram_every_n_train_steps == 0
            if need_fig or need_hist:
                from crossscore_tpu.tasks.common import host_batch, host_rows

                # under multi-host the batch/pred are global arrays — fetch
                # this process's rows (pairing stays consistent: they are the
                # rows this process decoded)
                pred = np.asarray(host_rows(pred_dev), np.float32)
                hbatch = host_batch(batch)
                if need_fig:
                    import matplotlib.pyplot as plt

                    fig = visualiser.vis(hbatch, {"score_map_ref_cross": pred})
                    fig.savefig(run_dir / "vis" / f"train_s{global_step:06}.png")
                    logger.log_figure("train/batch_vis", fig, global_step)
                    plt.close(fig)
                if need_hist:
                    gt = np.asarray(host_rows(hbatch["query/score_map"]), np.float32)
                    logger.log_histogram("train/score_hist", pred, global_step)
                    logger.log_histogram(
                        "train/l1_diff_hist", np.abs(pred - gt), global_step
                    )

            if ckpt_due(global_step):
                ckpt_mgr.save(global_step, state)

            if max_steps > 0 and global_step >= max_steps:
                stop = True
                break
        if stop:
            break

        # Lightning semantics: validate when (epoch+1) % n == 0 (the
        # reference leaves the Trainer default n=1)
        if (epoch + 1) % max(1, int(cfg.trainer.get("check_val_every_n_epoch", 1) or 1)) == 0:
            run_validation(epoch, global_step, limit_val)
        if ckpt_due(global_step, epoch_end=True, epoch=epoch):
            ckpt_mgr.save(global_step, state)

    if sustain_t0 is not None and global_step > sustain_s0:
        float(metrics["loss"])  # end-of-window sync anchor
        n = global_step - sustain_s0
        ms = (time.time() - sustain_t0) / n * 1e3
        print(f"sustained: {ms:.1f} ms/step over {n} steps (loader in loop)")
        if logger is not None:
            logger.log({"train/sustained_ms_per_step": ms,
                        "train/sustained_steps": n}, global_step)

    # save_last is a config flag, uniform across processes — and the save is
    # collective, so it must NOT be proc0-gated
    if cfg.trainer.checkpointing.save_last:
        ckpt_mgr.save(global_step, state, force=True)
        ckpt_mgr.wait()
    if logger is not None:
        logger.close()
    print(f"train done: {global_step} steps -> {run_dir}")
    return run_dir


def main(argv=None):
    cfg = parse_cli("default", argv)
    return train(cfg)


if __name__ == "__main__":
    main()
