"""Stress benchmark for the fused cross-attention (BASELINE.json config 5).

2x-resolution / ViT-L operating point: 1036px query -> 74x74 = 5476 query
tokens; K=16 references -> 87,616 reference tokens; 16 heads x head_dim 64.
A dense attention matrix here would be 5476 x 87616 x 16 heads x B — tens of
GB — unrunnable; the flash kernel streams it in O(Q+KV) memory.

Run on the TPU: ``python tools/bench_stress_attention.py``
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from crossscore_tpu.utils.compilation_cache import enable

    enable()
    from crossscore_tpu.ops.flash_attention import flash_cross_attention

    b, h, hd = 2, 16, 64
    nq = 74 * 74            # 5476
    nk = 16 * 74 * 74       # 87,616
    rng = np.random.default_rng(time.time_ns())  # fresh seed: the relay memoises (program, inputs) across sessions
    q = jnp.asarray(rng.standard_normal((b, h, nq, hd)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, nk, hd)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, nk, hd)), jnp.bfloat16)
    flops = 4 * b * h * nq * nk * hd
    dense_bytes = b * h * nq * nk * 2
    print(f"dense scores would be {dense_bytes/2**30:.1f} GiB bf16 -> flash only")

    n_it = 3

    @jax.jit
    def loop(q, k, v):
        # args (not closure constants) so the remote-compile payload stays small
        def body(i, c):
            qq = q * (1.0 + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-8))
            return c + flash_cross_attention(qq, k, v, 512, 1024)[0, 0, 0, 0].astype(jnp.float32)

        return jax.lax.fori_loop(0, n_it, body, jnp.float32(0))

    t = time.perf_counter(); loop(q, k, v).block_until_ready()
    print(f"compile {time.perf_counter()-t:.0f}s")
    t0 = time.perf_counter(); loop(q, k, v).block_until_ready()
    dt = (time.perf_counter() - t0) / n_it
    print(f"stress cross-attn (B={b} H={h} {nq}x{nk} hd={hd}): "
          f"{dt*1e3:.1f} ms  {flops/dt/1e12:.1f} TFLOP/s")


if __name__ == "__main__":
    main()
