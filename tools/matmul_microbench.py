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

        for name, mm in [("bf16", bf16_mm), ("int8", int8_matmul)]:
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
