"""Fused vs unfused backbone-MLP timing at the bench operating point.

Times ONE ViT-block MLP half (ln2 -> fc1 -> gelu -> fc2 -> ls2 -> residual)
over the backbone's (72 views x 1370 tokens x D=384) activation, bf16.
In-graph fori_loop timing per PERFORMANCE.md rules (device time only,
warmup with different values because the relay memoises identical dispatches).

Usage: python tools/mlp_microbench.py [xla fused] [block_m ...]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

import numpy as np

M_VIEWS, N_TOK, D, F = 72, 1370, 384, 1536
N_IT = 20


def main():
    import jax
    import jax.numpy as jnp

    from crossscore_tpu.utils.compilation_cache import enable

    enable()
    from crossscore_tpu.ops.fused_mlp import (
        _fused_ln_mlp_fwd_pallas, _reference_xla,
    )

    # fresh seed per process: the execution relay memoises (program, inputs)
    # dispatches ACROSS sessions — a fixed seed re-times a cached result
    rng = np.random.default_rng(time.time_ns())
    dt = jnp.bfloat16
    x = jnp.asarray(rng.standard_normal((M_VIEWS, N_TOK, D)) * 0.5, dt)
    ln_s = jnp.asarray(1 + 0.1 * rng.standard_normal(D), dt)
    ln_b = jnp.asarray(0.1 * rng.standard_normal(D), dt)
    w1 = jnp.asarray(rng.standard_normal((D, F)) * D ** -0.5, dt)
    b1 = jnp.asarray(0.1 * rng.standard_normal(F), dt)
    w2 = jnp.asarray(rng.standard_normal((F, D)) * F ** -0.5, dt)
    b2 = jnp.asarray(0.1 * rng.standard_normal(D), dt)
    ls2 = jnp.asarray(1 + 0.05 * rng.standard_normal(D), dt)
    args = (ln_s, ln_b, w1, b1, w2, b2, ls2)

    modes = [a for a in sys.argv[1:] if not a.isdigit()] or ["xla", "fused"]
    blocks = [int(a) for a in sys.argv[1:] if a.isdigit()] or [256, 512, 1024]

    def time_fn(fn, label):
        @jax.jit
        def loop(x):
            def body(i, c):
                out = fn(x * (dt(1) + i.astype(dt) * dt(1e-8)))
                return c + out.reshape(-1)[0].astype(jnp.float32)

            return jax.lax.fori_loop(0, N_IT, body, jnp.float32(0.0))

        t = time.perf_counter()
        loop(x * dt(0.7)).block_until_ready()
        comp = time.perf_counter() - t
        dts = []
        for _ in range(2):
            t0 = time.perf_counter()
            loop(x).block_until_ready()
            dts.append(time.perf_counter() - t0)
        ms = max(dts) / N_IT * 1e3
        gflop = 4 * M_VIEWS * N_TOK * D * F / 1e9
        print(f"{label:24s} {ms:7.3f} ms/layer  {gflop/ms:6.1f} TFLOP/s "
              f"(compile {comp:.0f}s)", flush=True)

    for mode in modes:
        try:
            if mode == "xla":
                time_fn(lambda xx: _reference_xla(xx, *args, 1e-6), "xla unfused")
            else:
                for bm in blocks:
                    try:
                        time_fn(
                            lambda xx, bm=bm: _fused_ln_mlp_fwd_pallas(
                                xx, *args, block_m=bm),
                            f"fused block_m={bm}",
                        )
                    except Exception as e:
                        print(f"fused block_m={bm} FAILED: {str(e)[:140]}",
                              flush=True)
        except Exception as e:
            print(f"{mode} FAILED: {str(e)[:140]}", flush=True)


if __name__ == "__main__":
    main()
