"""BASELINE config #5 end-to-end on one chip: ViT-L backbone at 2x resolution.

The r3 evidence for the stress config was an isolated cross-attention kernel
microbench (tools/bench_stress_attention.py) plus TP correctness at toy dims;
this tool runs the REAL model — ``dinov2-large`` (hidden 1024, 24 layers,
16 heads) at 1036 px (= 2x the 518 px training crop, reference
``config/data/combined_training.yaml:35``) — through the full forward and the
full train step on the chip, establishing HBM fit (remat + batch-size sweep)
and recording ms / maps-per-s / analytic-FLOP MFU.

Timing discipline per CLAUDE.md: in-graph ``lax.fori_loop`` with an
iteration-dependent input perturbation, fresh time-seeded inputs, distinct
values per timed dispatch, host fetch of a small scalar as the sync anchor,
and a sanity floor against relay memoisation.

Usage (real TPU; background it):
    python tools/stress_vitl.py [--hw 1036] [--k 5] [--batches 1,2,4]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

import numpy as np

N_IT = 3
V5E_BF16_PEAK = 197e12  # TPU v5e bf16 peak FLOP/s


def model_flops(hw: int, k: int, vit, d_dec: int, dec_layers: int,
                ffn_ratio: int, patch: int = 14) -> tuple[float, float]:
    """Analytic forward FLOPs per score map: (encoder_all_views, decoder+head).

    MAC-counted x2; attention counted as the 2 N^2 d matmuls (QK^T, PV) —
    softmax/normalisation FLOPs excluded, so MFU is mildly conservative."""
    g = hw // patch
    nt = 1 + g * g  # tokens per view incl CLS
    d = vit.hidden_size
    per_layer = 24 * nt * d * d + 4 * nt * nt * d
    enc_view = vit.num_layers * per_layer + 2 * (nt - 1) * (patch * patch * 3) * d
    enc = (1 + k) * enc_view

    nq = g * g
    nk = k * nq
    dd = d_dec
    self_attn = 8 * nq * dd * dd + 4 * nq * nq * dd
    cross = 4 * nq * dd * dd + 4 * nk * dd * dd + 4 * nq * nk * dd
    ffn = 4 * nq * dd * dd * ffn_ratio
    dec = dec_layers * (self_attn + cross + ffn)
    head = 2 * nq * (dd * dd + dd * 196)
    return float(enc), float(dec + head)


def _mem_stats(jax):
    try:
        s = jax.devices()[0].memory_stats()
        return {k: s[k] for k in ("bytes_in_use", "peak_bytes_in_use") if k in s}
    except Exception:
        return {}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--hw", type=int, default=1036)  # 2 x 518
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--batches", default="1,2,4")
    ap.add_argument("--preset", default="dinov2-large")
    ap.add_argument("--train-batches", default=None,
                    help="batch sizes for the train step (default: same list)")
    ap.add_argument("--cpu", action="store_true", help="CPU smoke run")
    ap.add_argument("--extra", default="", help="extra dotted overrides, comma-separated")
    ap.add_argument("--skip-forward", action="store_true",
                    help="train-step sweep only (forward already recorded)")
    ap.add_argument("--scoped-vmem-kib", type=int, default=0,
                    help="raise xla_tpu_scoped_vmem_limit_kib for the train "
                         "jit (the decoder bwd kernel holds whole-nq q/do/dq "
                         "blocks + an f32 scratch in VMEM; at the 74x74 "
                         "stress grid that overflows the 16M default)")
    ap.add_argument("--token", action="store_true",
                    help="train sweep uses the decoder-only token-space step "
                         "(this_main.token_space_train semantics) — the "
                         "recommended operating point for frozen-backbone "
                         "training after the r4 quality A/B")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from crossscore_tpu.utils.compilation_cache import enable

    enable()
    from crossscore_tpu.confsys import load_config
    from crossscore_tpu.models import CrossScoreNet, CrossScoreConfig
    from crossscore_tpu.train import (
        create_train_state, make_optimizer, make_train_step,
    )

    cfg = load_config(
        "default",
        overrides=[
            f"model.backbone.preset={args.preset}",
            "model.tpu.remat_backbone=true",  # HBM: 24 rematerialised blocks
            *[o for o in args.extra.split(",") if o],
        ],
    )
    mcfg = CrossScoreConfig.from_config(cfg)
    model = CrossScoreNet(mcfg)
    hw, k = args.hw, args.k
    g = hw // mcfg.patch_size
    enc_f, dec_f = model_flops(
        hw, k, mcfg.backbone, mcfg.backbone.hidden_size,
        mcfg.decoder_layers, mcfg.decoder_ffn_ratio, mcfg.patch_size,
    )
    print(
        f"{args.preset} @ {hw}px K={k}: grid {g}x{g} ({g * g} query tokens, "
        f"{k * g * g} memory tokens); analytic fwd FLOPs/map: encoder "
        f"{enc_f / 1e12:.2f} T + decoder/head {dec_f / 1e12:.3f} T",
        flush=True,
    )

    rng = np.random.default_rng(time.time_ns())  # relay memoises across runs
    init = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(rng.standard_normal((1, 70, 70, 3)), jnp.float32),
        jnp.asarray(rng.standard_normal((1, k, 70, 70, 3)), jnp.float32),
    )["params"]
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(init))
    print(f"params: {n_params / 1e6:.0f} M", flush=True)

    def make_batch(b, with_map, token=False):
        if token:
            d = mcfg.backbone.hidden_size
            out = {
                "query/tokens": jnp.asarray(
                    rng.standard_normal((b, g * g, d), dtype=np.float32),
                    jnp.bfloat16,
                ),
                "reference/cross/tokens": jnp.asarray(
                    rng.standard_normal((b, k, g * g, d), dtype=np.float32),
                    jnp.bfloat16,
                ),
            }
        else:
            out = {
                "query/img": jnp.asarray(
                    rng.standard_normal((b, hw, hw, 3), dtype=np.float32), jnp.bfloat16
                ),
                "reference/cross/imgs": jnp.asarray(
                    rng.standard_normal((b, k, hw, hw, 3), dtype=np.float32), jnp.bfloat16
                ),
            }
        if with_map:
            out["query/score_map"] = jnp.asarray(
                rng.random((b, hw, hw), dtype=np.float32)
            )
        return out

    def _anchor(out):
        return float(out[-1] if isinstance(out, tuple) else out)

    def timed_loop(fn_loop, feed, floor_s):
        t0 = time.perf_counter()
        _anchor(fn_loop(*feed))
        print(f"  compile+warmup: {time.perf_counter() - t0:.0f}s "
              f"{_mem_stats(jax)}", flush=True)
        dts = []
        # never 1.0: that would re-dispatch the warmup's exact (program,
        # inputs) pair, which the relay memoises (CLAUDE.md timing hazards)
        for mult in (0.8, 0.9, 1.1):
            feed2 = [
                jax.tree_util.tree_map(lambda v: v * jnp.asarray(mult, v.dtype), x)
                for x in feed
            ]
            t0 = time.perf_counter()
            _anchor(fn_loop(*feed2))
            dts.append(time.perf_counter() - t0)
        if max(dts) < floor_s:
            print(f"  WARNING: {max(dts) * 1e3:.0f}ms < sanity floor "
                  f"{floor_s * 1e3:.0f}ms — likely memoised, do not trust",
                  flush=True)
        return max(dts) / N_IT

    results = {}

    # ---------------- forward (predict-path) sweep ----------------
    import functools

    for b in (int(x) for x in args.batches.split(",") if not args.skip_forward):
        batch = make_batch(b, with_map=False)

        @jax.jit
        def fwd_loop(params, q, refs):
            def body(i, acc):
                q2 = q * (1.0 + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-8))
                out = model.apply({"params": params}, q2, refs)
                return acc + out["score_map_ref_cross"].astype(jnp.float32).mean()

            return jax.lax.fori_loop(0, N_IT, body, jnp.float32(0.0))

        print(f"forward B={b}:", flush=True)
        try:
            dt = timed_loop(
                fwd_loop,
                [init, batch["query/img"], batch["reference/cross/imgs"]],
                floor_s=N_IT * b * (1 + k) * 0.002,  # >=2 ms per 1036px image
            )
        except Exception as e:
            print(f"  FAILED ({type(e).__name__}): {str(e)[:300]}", flush=True)
            results[f"fwd_B{b}"] = {"error": type(e).__name__}
            continue
        fl = b * (enc_f + dec_f)
        results[f"fwd_B{b}"] = {
            "ms": round(dt * 1e3, 1),
            "maps_per_s": round(b / dt, 2),
            "mfu": round(fl / dt / V5E_BF16_PEAK, 3),
        }
        print(f"  {dt * 1e3:.0f} ms ({b / dt:.2f} maps/s, "
              f"MFU {fl / dt / V5E_BF16_PEAK * 100:.1f}%)", flush=True)

    # ---------------- train-step sweep ----------------
    tx, _ = make_optimizer(cfg, init, steps_per_epoch=100)
    step_fn = make_train_step(model, tx)
    perturb_key = "query/tokens" if args.token else "query/img"
    tag = "train_tok" if args.token else "train"
    for b in (int(x) for x in (args.train_batches or args.batches).split(",")):
        batch = make_batch(b, with_map=True, token=args.token)
        state = create_train_state(init, tx)
        jit_kw = {}
        if args.scoped_vmem_kib:
            jit_kw["compiler_options"] = {
                "xla_tpu_scoped_vmem_limit_kib": str(args.scoped_vmem_kib)
            }

        @functools.partial(jax.jit, **jit_kw)
        def train_loop(st, batch):
            def body(i, s):
                b2 = dict(batch)
                b2[perturb_key] = batch[perturb_key] * (
                    1.0 + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-8)
                )
                return step_fn(s, b2)[0]

            st = jax.lax.fori_loop(0, N_IT, body, st)
            return st, st.params["head_fc2"]["kernel"][0, 0]

        print(f"{tag} B={b}:", flush=True)
        try:
            dt = timed_loop(
                train_loop, [state, batch],
                floor_s=N_IT * b * ((1 + k) * 0.002 if not args.token else 0.001),
            )
        except Exception as e:
            print(f"  FAILED ({type(e).__name__}): {str(e)[:300]}", flush=True)
            results[f"{tag}_B{b}"] = {"error": type(e).__name__}
            continue
        # frozen backbone: encoder is forward-only; decoder+head do fwd+bwd.
        # token mode never touches the encoder at all.
        fl = b * ((0 if args.token else enc_f) + 3 * dec_f)
        results[f"{tag}_B{b}"] = {
            "ms": round(dt * 1e3, 1),
            "ms_per_map": round(dt * 1e3 / b, 1),
            "mfu": round(fl / dt / V5E_BF16_PEAK, 3),
        }
        print(f"  {dt * 1e3:.0f} ms/step ({dt * 1e3 / b:.0f} ms/map, "
              f"MFU {fl / dt / V5E_BF16_PEAK * 100:.1f}%)", flush=True)

    import json

    print(json.dumps({"hw": hw, "k": k, "preset": args.preset,
                      "params_m": round(n_params / 1e6), **results}))


if __name__ == "__main__":
    main()
