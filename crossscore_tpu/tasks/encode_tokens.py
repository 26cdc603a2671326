"""Offline token precompute: fill the full-image token store for a corpus.

Token-space training (``this_main.token_space_train``, ``data/token_train.py``)
encodes each unique image once through the frozen backbone during epoch one.
For a large corpus (the reference trains on ~2 TB, reference
``README.md:53-57``) that first epoch can instead be paid OFFLINE and shared:
this CLI walks the dataset index, encodes every unique query render and every
reference-pool capture at the training resolution, and persists the tokens to
the disk store (``this_main.ref_token_cache_dir``). A training run pointed at
the same store starts warm — epoch one is already pure numpy window slicing.

    python -m crossscore_tpu.tasks.encode_tokens \\
        'data.dataset.path=[<root>]' trainer.ckpt_path_to_load=<ckpt> \\
        this_main.ref_token_cache_dir=/shared/tokens_v1

The store supports one-packer/N-reader and concurrent writers
(``data/token_cache.py``); shard a big corpus across machines with
``this_main.encode_shard=i/n`` (each encodes every n-th unique image).

Tokens are a function of the BACKBONE WEIGHTS: key the store directory by
checkpoint identity, exactly like the serving cache.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import numpy as np

from crossscore_tpu.tasks.common import parse_cli


def unique_image_paths(ds) -> list[str]:
    """Every image the token trainer could touch: all query renders + the
    FULL reference pools (the sampler may pick any of them across epochs)."""
    if hasattr(ds, "datasets"):  # ConcatDataset
        out: list[str] = []
        seen = set()
        for sub in ds.datasets:
            for p in unique_image_paths(sub):
                if p not in seen:
                    seen.add(p)
                    out.append(p)
        return out
    paths: list[str] = []
    seen = set()
    tree = ds.neighbour_selector.paths
    for scene in sorted(tree):
        for key in ("gs_train", "gs_test"):
            sp = tree[scene].get(key)
            if not sp:
                continue
            groups = [sp["query"]["images"]]
            if "reference" in sp:
                groups.append(sp["reference"]["cross"]["images"])
            for group in groups:
                for it in sorted(group):
                    for p in group[it]:
                        if p not in seen:
                            seen.add(p)
                            paths.append(p)
    return paths


def encode_tokens(cfg) -> int:
    import jax

    from crossscore_tpu.tasks.common import apply_accelerator, load_model_params
    from crossscore_tpu.utils.compilation_cache import enable as enable_compile_cache

    apply_accelerator(cfg)
    enable_compile_cache()

    from crossscore_tpu.data.nvs_index import get_dataset
    from crossscore_tpu.data.token_cache import RefTokenCache
    from crossscore_tpu.io.images import normalize_imagenet
    from crossscore_tpu.models import CrossScoreConfig, CrossScoreNet
    from crossscore_tpu.models.crossscore import make_backbone_encoder

    store_dir = cfg.this_main.get("ref_token_cache_dir")
    if not store_dir:
        raise ValueError("encode_tokens requires this_main.ref_token_cache_dir")

    ds = get_dataset(
        cfg, cfg.this_main.get("data_split", "train"),
        crop_mode="integer_patches", return_item_paths=True,
        resize_short_side=cfg.this_main.resize_short_side,
    )
    paths = unique_image_paths(ds)
    shard = str(cfg.this_main.get("encode_shard", "0/1"))
    i_sh, n_sh = (int(x) for x in shard.split("/"))
    paths = paths[i_sh::n_sh]

    mcfg = CrossScoreConfig.from_config(cfg)
    model = CrossScoreNet(mcfg)
    probe = ds.datasets[0] if hasattr(ds, "datasets") else ds
    if cfg.trainer.ckpt_path_to_load is None:
        print(
            "WARNING: no checkpoint given — encoding with RANDOM-INIT backbone "
            "weights; tokens will only match a run that loads the same init"
        )
    item0 = probe.get_item(0, np.random.default_rng(cfg.seed))
    params = load_model_params(
        cfg, model,
        {"query/img": item0["query/img"][None],
         "reference/cross/imgs": item0["reference/cross/imgs"][None]},
    )
    encode = jax.jit(make_backbone_encoder(mcfg))

    enc_batch = int(cfg.this_main.get("ref_token_cache_encode_batch", 16))
    cache = RefTokenCache(
        lambda imgs, valid_hw=None: encode(params, imgs),
        encode_batch=enc_batch,
        max_items=enc_batch,  # stream-through: the disk store is the product
        persist_dir=store_dir,
    )

    def _load(p: str) -> np.ndarray:
        img = probe._read_image(p)
        if probe.resize_short_side > 0:
            img = probe._resize(img)
        h, w = img.shape[0] - img.shape[0] % 14, img.shape[1] - img.shape[1] % 14
        return normalize_imagenet(img[:h, :w]).astype(np.float32)

    done = skipped = 0
    workers = int(cfg.data.loader.train.num_workers) or 1
    with ThreadPoolExecutor(max(1, workers)) as pool:
        for i0 in range(0, len(paths), enc_batch):
            chunk = paths[i0 : i0 + enc_batch]
            imgs = list(pool.map(_load, chunk))
            shapes = {im.shape for im in imgs}
            if len(shapes) != 1:
                raise ValueError(
                    f"mixed post-resize shapes in one dataset: {sorted(shapes)} "
                    f"— token-space training needs a uniform training resolution"
                )
            pre_misses = cache.misses
            # gather layout: ref_paths[k][b] with k=1 view, b=len(chunk) items
            cache.gather([chunk], np.stack(imgs)[:, None])
            # already-in-store = everything that did NOT miss (a disk hit
            # bumps BOTH hits and disk_hits, so summing those double-counts)
            skipped += len(chunk) - (cache.misses - pre_misses)
            done += len(chunk)
            if (i0 // enc_batch) % 20 == 0:
                print(f"encode_tokens: {done}/{len(paths)} "
                      f"({skipped} already in store)", flush=True)
    print(
        f"encode_tokens done: {done} images, {skipped} were already in the "
        f"store -> {store_dir}",
        flush=True,
    )
    return done


def main(argv=None):
    return encode_tokens(parse_cli("default", argv))


if __name__ == "__main__":
    main()
