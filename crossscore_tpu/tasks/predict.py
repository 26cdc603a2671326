"""Predict entry point: score-map inference from bare query/reference dirs.

Public interface parity with reference ``task/predict.py`` + ``predict.sh``:

    python -m crossscore_tpu.tasks.predict \\
        trainer.ckpt_path_to_load=<orbax dir | lightning .ckpt> \\
        data.dataset.query_dir=<dir> data.dataset.reference_dir=<dir> alias=<name>

Outputs (same layout as the reference): ``<out_dir>/vis/r0_B****_b0.png``
figures, ``<out_dir>/batch/score_map_ref_cross/*.png`` score maps,
``image_query/``, ``image_reference/``, ``score_summary/<dataset>/<method>.csv``.

TPU-native execution: one jitted forward graph (frozen backbone + fused
Pallas cross-attention decoder, bf16), batches prefetched by the threaded host
loader and H2D-transferred asynchronously.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from crossscore_tpu.tasks.common import parse_cli, resolve_out_dir, load_model_params


from typing import NamedTuple


class ServingPlan(NamedTuple):
    """Resolved multi-device serving strategy (pure function of config +
    topology — unit-tested in tests/test_task_utils.py)."""

    use_vp: bool      # K reference views sharded over a mesh
    vp_local: bool    # ... over the process's LOCAL chips (multi-host + cache)
    use_cache: bool   # reference-token cache on


def plan_serving_modes(
    *,
    vp_mode: str,
    cache_mode: str,
    use_buckets: bool,
    need_attn_weights: bool,
    zero_reference: bool,
    k_refs: int,
    n_dev: int,
    n_local: int,
    n_proc: int,
    data_mesh_size: int,
) -> ServingPlan:
    """Pick the serving composition from config knobs and device topology.

    Every pair/triple of {token cache, view-parallel, shape-bucketing,
    multi-host} composes except bucketing x vp (vp shards the view axis,
    buckets change the token count per item). Under multi-host WITH the
    cache, view-parallel runs on a host-LOCAL ``view`` mesh — the
    context-parallel psum rides intra-host ICI, data parallelism across
    hosts is the per-process query shard, and cached token batches never
    need global-mesh assembly. Uncached multi-host vp keeps the global mesh
    (replicated batches feed it fine)."""
    cache_ok = (
        cache_mode != "off"
        and not need_attn_weights
        and k_refs > 0
        and not zero_reference
    )

    def vp_fits(n: int) -> bool:
        return (
            not use_buckets
            and vp_mode != "off"
            and not need_attn_weights
            and n > 1
            and k_refs > 0
            and k_refs % n == 0
            and (vp_mode == "on" or data_mesh_size < n)
        )

    vp_local = n_proc > 1 and cache_ok and vp_fits(n_local)
    use_vp = vp_local or vp_fits(n_dev)
    use_cache = cache_ok and not (n_proc > 1 and use_vp and not vp_local)
    return ServingPlan(use_vp, vp_local, use_cache)


def predict(cfg) -> Path:
    import jax

    from crossscore_tpu.tasks.common import apply_accelerator
    from crossscore_tpu.utils.compilation_cache import enable as enable_compile_cache

    apply_accelerator(cfg)
    enable_compile_cache()

    from crossscore_tpu.models import CrossScoreNet, CrossScoreConfig
    from crossscore_tpu.data import SimpleReference, Loader
    from crossscore_tpu.io.batch_writer import BatchWriter
    from crossscore_tpu.io.summariser import SummaryWriterPredictedOnlineTestPrediction
    from crossscore_tpu.utils.check_config import ConfigChecker
    from crossscore_tpu.utils.vis import make_visualiser
    from crossscore_tpu.train.step import make_predict_step

    from crossscore_tpu.tasks.common import confirm_batch_size

    ConfigChecker(cfg).check_predict()
    confirm_batch_size(cfg)
    out_dir = resolve_out_dir(cfg, "predict")
    (out_dir / "vis").mkdir(parents=True, exist_ok=True)

    dataset = SimpleReference(
        query_dir=cfg.data.dataset.query_dir,
        reference_dir=cfg.data.dataset.reference_dir,
        neighbour_config=cfg.data.neighbour_config,
        crop_size=cfg.data.transforms.crop_size,
        crop_mode=cfg.this_main.crop_mode,
        resize_short_side=cfg.this_main.resize_short_side,
        zero_reference=cfg.data.dataset.zero_reference,
        return_item_paths=True,
        wire_uint8=bool(cfg.data.dataset.get("wire_uint8", False)),
    )
    # multi-device inference. Two strategies, picked from config alone:
    # - data parallel (default): batch sharded over a 1-D mesh (replaces the
    #   reference's DDP predict, task/predict.py:119-124); no-op on one chip.
    # - view parallel (model.tpu.view_parallel: auto|on|off): the K reference
    #   views sharded over ALL devices — each chip encodes the query + its
    #   K/n local refs, the decoder combines exactly via the context-parallel
    #   softmax. `auto` picks it when the batch can't fill the devices but K
    #   divides them (e.g. interactive B=1 predict on a pod slice).
    from crossscore_tpu.parallel import make_mesh, batch_sharding, replicated

    # shape bucketing (this_main.shape_buckets: auto|on|off): mixed-aspect
    # datasets share ONE compiled graph per bucket instead of one per aspect
    # ratio — the reference recompiles per shape (task/predict.py:69-93),
    # operationally broken at 10-25 min/compile on TPU.
    from crossscore_tpu.tasks.common import tristate

    bucket_mode = tristate(cfg.this_main.get("shape_buckets", "auto"))
    use_buckets = bucket_mode != "off" and cfg.this_main.crop_mode != "dataset_default"
    if use_buckets:
        shapes = {dataset.get_item_shape(i) for i in range(len(dataset))}
        if bucket_mode == "auto" and len(shapes) <= 1:
            use_buckets = False  # single static shape: no padding overhead

    n_dev = len(jax.devices())
    n_local = len(jax.local_devices())
    k_refs = int(cfg.data.neighbour_config.cross)
    vp_mode = tristate(cfg.model.tpu.get("view_parallel", "auto"))
    data_mesh = make_mesh(batch_size=cfg.data.loader.validation.batch_size)
    cache_mode = tristate(cfg.this_main.get("ref_token_cache", "auto"))
    n_proc = jax.process_count()
    # cached-reference serving (this_main.ref_token_cache: auto|on|off): the
    # frozen backbone encodes each reference image ONCE per run; queries cost
    # 1 ViT forward instead of 1+K (reference re-encodes refs per query,
    # task/core.py:119-161). Exact — pinned by tests/test_token_cache.py.
    use_vp, vp_local, use_cache = plan_serving_modes(
        vp_mode=vp_mode,
        cache_mode=cache_mode,
        use_buckets=use_buckets,
        need_attn_weights=cfg.model.need_attn_weights,
        zero_reference=cfg.data.dataset.zero_reference,
        k_refs=k_refs,
        n_dev=n_dev,
        n_local=n_local,
        n_proc=n_proc,
        data_mesh_size=len(data_mesh.devices.reshape(-1)),
    )
    if vp_local:
        from crossscore_tpu.parallel import local_view_mesh

        mesh = local_view_mesh()
    elif use_vp:
        mesh = make_mesh()
    else:
        mesh = data_mesh
    # cache x shape-bucketing composes (r3): misses encode bucket-padded
    # pixels with the per-item valid mask; keys carry (bucket, valid) shapes;
    # the cached decoder step masks exactly like the uncached bucketed path.
    # cache x view-parallel composes too: cached tokens shard over the view
    # axis (make_view_parallel_apply_tokens) — the exact context-parallel
    # softmax combine is token-source-agnostic.
    if use_vp:
        n_vp = n_local if vp_local else n_dev
        print(f"view-parallel predict: K={k_refs} refs sharded over {n_vp} "
              f"devices{' (host-local mesh)' if vp_local else ''}")
    loader_kw = dict(
        batch_size=cfg.data.loader.validation.batch_size,
        num_workers=cfg.data.loader.validation.num_workers,
        prefetch_batches=cfg.data.loader.validation.prefetch_factor,
        seed=cfg.seed,
        # with the token cache the batch stays host-side: ref pixels never
        # reach the device (tokens do), the jitted step transfers the rest
        sharding=None if use_cache
        else (replicated(mesh) if use_vp else batch_sharding(mesh)),
    )
    if use_cache and n_proc > 1:
        # each process owns a disjoint query shard; wrap-around duplicates
        # land at the shard tail and are masked by _valid (data/loader.py)
        loader_kw.update(shard_index=jax.process_index(), num_shards=n_proc)
    if use_buckets:
        from crossscore_tpu.data.bucketing import ShapeBucketedLoader

        loader = ShapeBucketedLoader(
            dataset,
            bucket_multiple=int(cfg.this_main.get("bucket_multiple", 112)),
            **loader_kw,
        )
        print(
            f"shape-bucketed predict: {len(shapes)} item shapes -> "
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

    writer = BatchWriter(cfg, "predict") if cfg.logger.predict.write.flag.batch else None
    summariser = SummaryWriterPredictedOnlineTestPrediction(
        metric_type=cfg.model.predict.metric.type,
        metric_min=cfg.model.predict.metric.min,
        dir_out=str(out_dir),
    )
    visualiser = make_visualiser(cfg)

    if use_vp:
        import dataclasses

        from crossscore_tpu.parallel.view_parallel import make_view_parallel_apply

        vp_model = CrossScoreNet(
            dataclasses.replace(mcfg, attention_impl=f"cp:{mesh.axis_names[0]}")
        )
        vp_fn = make_view_parallel_apply(vp_model, mesh)

        def step(params, query, refs):
            return {"score_map_ref_cross": vp_fn(params, query, refs)}

    vis_every = cfg.logger.predict.write.config.vis_img_every_n_steps
    if use_cache:
        from crossscore_tpu.data import fastimage
        from crossscore_tpu.data.token_cache import RefTokenCache
        from crossscore_tpu.models.crossscore import make_backbone_encoder
        from crossscore_tpu.train.step import make_predict_step_cached

        max_items = int(cfg.this_main.get("ref_token_cache_max_items", 2048))
        encode = jax.jit(make_backbone_encoder(mcfg))
        token_cache = RefTokenCache(
            lambda imgs, valid_hw=None: encode(params, imgs, valid_hw),
            encode_batch=int(cfg.this_main.get("ref_token_cache_encode_batch", 16)),
            max_items=max_items,
            persist_dir=cfg.this_main.get("ref_token_cache_dir"),
        )
        # the cached step runs on a host-LOCAL data mesh: single-host this is
        # plain DP over the local chips; multi-host it is the per-rank shard
        # compute that composes the cache with pod deployment (each process
        # feeds only its own queries; no global array assembly needed)
        from jax.sharding import NamedSharding, PartitionSpec

        from crossscore_tpu.parallel import local_batch_sharding

        cache_sharding = local_batch_sharding(cfg.data.loader.validation.batch_size)
        params_local = jax.device_put(
            params, NamedSharding(cache_sharding.mesh, PartitionSpec())
        )
        step_cached = jax.jit(make_predict_step_cached(model))
        # skip the HOST DECODE of cache-hit references too (the loader emits
        # placeholders) when nothing downstream consumes reference pixels and
        # the whole reference pool fits the cache (no eviction possible).
        # Bucketed batches keep decoding (their keys carry the bucket shape,
        # which the loader-side header probe does not know).
        use_skip = (
            vis_every <= 0
            and not use_buckets
            and not cfg.logger.predict.write.flag.image_reference
            and fastimage.available()
            and hasattr(dataset, "reference_pool_size")
            and dataset.reference_pool_size() <= max_items
        )
        if use_skip:
            dataset.ref_pixel_skip = token_cache.has
        print(f"reference-token cache: on (frozen backbone, exact; "
              f"decode-skip {'on' if use_skip else 'off'}"
              f"{'; bucketed' if use_buckets else ''}"
              f"{'; view-parallel' if use_vp else ''})")

        if use_vp:
            from crossscore_tpu.parallel.view_parallel import (
                make_view_parallel_apply_tokens,
            )

            vp_tok_fn = make_view_parallel_apply_tokens(vp_model, mesh)

            def step(params, query, refs, _batch_paths=None, _skipped=None,
                     _valid_hw=None):
                tokens = token_cache.gather(_batch_paths, refs, skipped=_skipped)
                return {
                    "score_map_ref_cross": vp_tok_fn(params, query, tokens)
                }
        else:

            def step(params, query, refs, _batch_paths=None, _skipped=None,
                     _valid_hw=None):
                tokens = token_cache.gather(_batch_paths, refs, skipped=_skipped,
                                            valid_hw=_valid_hw)
                put = lambda x: jax.device_put(x, cache_sharding)
                if _valid_hw is not None:
                    import jax.numpy as jnp

                    return step_cached(params_local, put(query), put(tokens),
                                       put(jnp.asarray(_valid_hw)))
                return step_cached(params_local, put(query), put(tokens))

    elif not use_vp:
        step = jax.jit(
            make_predict_step(
                model,
                need_attn_weights=cfg.model.need_attn_weights,
                head_id=cfg.model.need_attn_weights_head_id,
            )
        )

    n_batches = 0
    from crossscore_tpu.tasks.common import resolve_limit

    max_batches = resolve_limit(cfg.trainer.limit_test_batches, loader.batches_per_epoch())

    def process(batch_idx, batch, outputs_dev):
        # materialising blocks on the device; everything after is host-side
        outputs = {k: np.asarray(v, dtype=np.float32) for k, v in outputs_dev.items()}
        from crossscore_tpu.tasks.common import crop_bucketed, iter_bucketed_items

        vhw = batch.get("_valid_hw")
        if vhw is not None and np.ndim(vhw) == 2:
            # bucket-PACKED batch (mixed item shapes): consumers take
            # individually-cropped B=1 slices
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

    # one-deep pipeline: dispatch batch i+1 before materialising batch i's
    # outputs, overlapping device compute with host-side writing
    pending = None
    for batch_idx, batch in enumerate(loader.epoch(0)):
        if max_batches is not None and batch_idx >= max_batches:
            break
        if use_buckets and use_cache:
            outputs_dev = step(
                params,
                batch["query/img"],
                batch["reference/cross/imgs"],
                _batch_paths=batch["item_paths"]["reference/cross/imgs"],
                _skipped=batch.get("reference/skipped"),
                _valid_hw=batch["_valid_hw"],
            )
        elif use_buckets:
            outputs_dev = step(
                params,
                batch["query/img"],
                batch.get("reference/cross/imgs"),
                batch["_valid_hw"],
            )
        elif use_cache:
            outputs_dev = step(
                params,
                batch["query/img"],
                batch["reference/cross/imgs"],
                _batch_paths=batch["item_paths"]["reference/cross/imgs"],
                _skipped=batch.get("reference/skipped"),
            )
        else:
            outputs_dev = step(params, batch["query/img"], batch.get("reference/cross/imgs"))
        if pending is not None:
            process(*pending)
        pending = (batch_idx, batch, outputs_dev)
        n_batches += 1
    if pending is not None:
        process(*pending)

    summariser.summarise()
    if use_cache:
        print(
            f"ref-token cache: {token_cache.hits} hits, {token_cache.misses} "
            f"unique misses, {token_cache.skipped_decodes} decode-skips"
        )
    print(f"predict done: {n_batches} batches -> {out_dir}")
    return out_dir


def main(argv=None):
    cfg = parse_cli("default_predict", argv)
    return predict(cfg)


if __name__ == "__main__":
    main()
