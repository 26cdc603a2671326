"""int8 vs bf16 matmul A/B at the backbone MLP operating point.

Verifies XLA actually lowers int8 x int8 -> int32 dot_general onto the v5e
int8 MXU path (2x bf16 peak) and measures the end-to-end win including the
dynamic activation-quantization passes.

Usage: python tools/matmul_microbench.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

import numpy as np

M, K1 = 72 * 1370, 384   # tokens x hidden at the bench point
N_IT = 8


def main():
    import jax
    import jax.numpy as jnp

    from crossscore_tpu.utils.compilation_cache import enable

    enable()
    from crossscore_tpu.ops.quant import int8_matmul

    rng = np.random.default_rng(time.time_ns())  # fresh seed: the relay memoises (program, inputs) across sessions

    for (m, k, n, tag) in [
        (M, 384, 1536, "fc1"),
        (M, 1536, 384, "fc2"),
        (M, 384, 3 * 384, "qkv"),
    ]:
        x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((k, n)) / np.sqrt(k), jnp.bfloat16)
        flops = 2 * m * k * n

        def bf16_mm(x, w):
            return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(jnp.bfloat16)

        # static-scale variants: weights pre-quantized (constant-folded in a
        # frozen backbone), activations quantized with a FIXED scalar scale
        # (one fused mul+clip+round+cast pass, no absmax reduce)
        wq = jnp.clip(jnp.round(w.astype(jnp.float32) * 127.0), -127, 127).astype(jnp.int8)
        w_scale = jnp.float32(1 / 127.0)
        x_scale = jnp.float32(4.0 / 127.0)  # pretend |x|<=4 calibration

        def int8_static(x, w_unused):
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) * (1.0 / x_scale)),
                          -127, 127).astype(jnp.int8)
            y = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            return (y.astype(jnp.float32) * (x_scale * w_scale)).astype(jnp.bfloat16)

        xq0 = jnp.clip(jnp.round(rng.standard_normal((m, k)) * 31), -127, 127
                       ).astype(jnp.int8)

        def int8_pure(x, w_unused):
            # both operands already int8: the raw int8 MXU bound (the x*scale
            # perturbation below keeps bf16 x alive; we use xq0 via closure
            # with an int8 perturbation to stay memoisation-proof)
            # the tiny multiplier keeps a real data dependence on the traced,
            # per-iteration x (a *0 would constant-fold and CSE the loop away)
            xx = xq0 + (x[0, 0] * jnp.bfloat16(1e-30)).astype(jnp.int8)
            y = jax.lax.dot_general(xx, wq, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            return (y.astype(jnp.float32) * w_scale).astype(jnp.bfloat16)

        for name, mm in [("bf16", bf16_mm), ("int8", int8_matmul),
                         ("int8_static", int8_static), ("int8_pure", int8_pure)]:
            @jax.jit
            def loop(x, w, _mm=mm):
                def body(i, c):
                    xx = x * (1.0 + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-8))
                    return c + _mm(xx, w)[0, 0].astype(jnp.float32)

                return jax.lax.fori_loop(0, N_IT, body, jnp.float32(0.0))

            loop(x * jnp.bfloat16(0.5), w).block_until_ready()
            dts = []
            for mult in (0.75, 1.0):
                t0 = time.perf_counter()
                loop(x * jnp.bfloat16(mult), w).block_until_ready()
                dts.append(time.perf_counter() - t0)
            dt = max(dts) / N_IT
            print(f"{tag:4s} {name}: {dt*1e3:7.3f} ms  {flops/dt/1e12:6.1f} TFLOP/s "
                  f"(runs {dts[0]*1e3:.1f}/{dts[1]*1e3:.1f}ms)", flush=True)

        err = float(jnp.max(jnp.abs(
            int8_matmul(x, w).astype(jnp.float32) - bf16_mm(x, w).astype(jnp.float32)
        )))
        print(f"{tag:4s} int8-vs-bf16 max abs err: {err:.4f}", flush=True)


if __name__ == "__main__":
    main()
