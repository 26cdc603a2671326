"""Train-batch sweep at the production operating point (VERDICT r4 #8).

B=24 is inherited from the reference's 24 GB A5000
(reference ``config/data/combined_training.yaml:3``); on a 16 GB v5e with
remat the items/s optimum may sit elsewhere. One SESSION (CLAUDE.md noise
rules: all variants A/B'd in one process, B=24 re-measured alongside),
sweeping B in {16, 24, 32, 48} for BOTH the pixel train step and the
token-space (decoder-only) train step at K=5, 518 px, bf16. OOM/compile
failures are recorded, not fatal.

Usage (real TPU; background it):
    python tools/batch_sweep.py [--out /tmp/batch_sweep.json]
CPU smoke:  python tools/batch_sweep.py --cpu --hw 56 --batches 1,2
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

import numpy as np

N_IT = 3


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--preset", default="dinov2-small")
    ap.add_argument("--hw", type=int, default=518)
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--batches", default="16,24,32,48")
    ap.add_argument("--modes", default="pixel,token")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default=None)
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
        "default", overrides=[f"model.backbone.preset={args.preset}"]
    )
    mcfg = CrossScoreConfig.from_config(cfg)
    model = CrossScoreNet(mcfg)
    hw, k = args.hw, args.k
    g = hw // mcfg.patch_size
    d = mcfg.backbone.hidden_size

    rng = np.random.default_rng(time.time_ns())
    init = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(rng.standard_normal((1, hw, hw, 3)), jnp.float32),
        jnp.asarray(rng.standard_normal((1, k, hw, hw, 3)), jnp.float32),
    )["params"]
    tx, _ = make_optimizer(cfg, init, steps_per_epoch=100)
    step_fn = make_train_step(model, tx)

    def make_batch(b, token):
        if token:
            return {
                "query/tokens": jnp.asarray(
                    rng.standard_normal((b, g * g, d), dtype=np.float32),
                    jnp.bfloat16),
                "reference/cross/tokens": jnp.asarray(
                    rng.standard_normal((b, k, g * g, d), dtype=np.float32),
                    jnp.bfloat16),
                "query/score_map": jnp.asarray(
                    rng.random((b, hw, hw), dtype=np.float32)),
            }
        return {
            "query/img": jnp.asarray(
                rng.standard_normal((b, hw, hw, 3), dtype=np.float32),
                jnp.bfloat16),
            "reference/cross/imgs": jnp.asarray(
                rng.standard_normal((b, k, hw, hw, 3), dtype=np.float32),
                jnp.bfloat16),
            "query/score_map": jnp.asarray(
                rng.random((b, hw, hw), dtype=np.float32)),
        }

    results = []
    for mode in args.modes.split(","):
        token = mode == "token"
        for b in (int(x) for x in args.batches.split(",")):
            state = create_train_state(init, tx)
            batch = make_batch(b, token)
            key = "query/tokens" if token else "query/img"

            @jax.jit
            def loop(state, batch, _key=key):
                def body(i, carry):
                    st, acc = carry
                    b2 = dict(batch)
                    b2[_key] = batch[_key] * (
                        1.0 + i.astype(batch[_key].dtype)
                        * jnp.asarray(1e-8, batch[_key].dtype))
                    st, metrics = step_fn(st, b2)
                    return st, acc + metrics["loss"]
                _, acc = jax.lax.fori_loop(
                    0, N_IT, body, (state, jnp.float32(0.0)))
                return acc

            label = f"{mode} B={b}"
            try:
                t0 = time.perf_counter()
                float(loop(state, batch))
                compile_s = time.perf_counter() - t0
                dts = []
                for mult in (0.8, 0.9, 1.1):  # never 1.0 (relay memoisation)
                    b2 = jax.tree_util.tree_map(
                        lambda v: v * jnp.asarray(mult, v.dtype), batch)
                    t0 = time.perf_counter()
                    float(loop(state, b2))
                    dts.append(time.perf_counter() - t0)
                ms = max(dts) / N_IT * 1e3
                row = {"mode": mode, "B": b, "ms_per_step": round(ms, 1),
                       "items_per_s": round(b / (ms / 1e3), 1),
                       "compile_s": round(compile_s, 0)}
                print(f"{label}: {ms:.1f} ms/step "
                      f"({b / (ms / 1e3):.1f} items/s, compile {compile_s:.0f}s)",
                      flush=True)
            except Exception as e:
                row = {"mode": mode, "B": b, "error": type(e).__name__,
                       "detail": str(e)[:200]}
                print(f"{label}: FAILED ({type(e).__name__}) {str(e)[:160]}",
                      flush=True)
            results.append(row)

    best = {}
    for mode in args.modes.split(","):
        ok = [r for r in results if r["mode"] == mode and "items_per_s" in r]
        if ok:
            best[mode] = max(ok, key=lambda r: r["items_per_s"])
            print(f"best {mode}: B={best[mode]['B']} "
                  f"({best[mode]['items_per_s']} items/s)", flush=True)
    report = {"preset": args.preset, "hw": hw, "k": k,
              "results": results, "best": best}
    if args.out:
        Path(args.out).write_text(json.dumps(report, indent=2))
        print(f"report -> {args.out}", flush=True)


if __name__ == "__main__":
    main()
