"""Block sweep for the layout-native cross-attention BACKWARD kernel
(`_bwd_cross_ln_pallas`) at the production decoder shape (B=24, H=8,
Nq=1369, Nk=5*1369, packed hd=64).

Timing per PERFORMANCE.md rules: in-graph fori_loop with iteration-dependent
inputs, fresh time seed, scalar host fetch as the sync anchor, sanity floor.

Usage: python tools/bwd_microbench.py [b] [k]
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

import numpy as np

N_IT = 8


def main():
    import jax
    import jax.numpy as jnp

    from crossscore_tpu.utils.compilation_cache import enable

    enable()
    from crossscore_tpu.ops.flash_attention import (
        _bwd_cross_ln_pallas, _flash_cross_ln_fwd, pick_cross_ln_blocks,
    )

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    k_views = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    nq = int(sys.argv[3]) if len(sys.argv) > 3 else 1369
    h = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    hd = 64
    nk = k_views * nq
    dtot = h * hd

    rng = np.random.default_rng(time.time_ns())
    qp = jnp.asarray(rng.standard_normal((b, nq, dtot)), jnp.bfloat16)
    kp = jnp.asarray(rng.standard_normal((b, nk, dtot)), jnp.bfloat16)
    vp = jnp.asarray(rng.standard_normal((b, nk, dtot)), jnp.bfloat16)
    do = jnp.asarray(rng.standard_normal((b, nq, dtot)), jnp.bfloat16)

    bq, bk_fwd = pick_cross_ln_blocks(nq, nk)
    o, l, m = _flash_cross_ln_fwd(qp, kp, vp, h, hd, block_q=bq, block_k=bk_fwd)
    o, l, m = jax.block_until_ready((o, l, m))

    flops = 10 * b * h * nq * nk * hd  # 5 matmuls, 2*n*k*d each

    import os

    vmem_kib = os.environ.get("SCOPED_VMEM_KIB")
    jit_kw = (
        {"compiler_options": {"xla_tpu_scoped_vmem_limit_kib": vmem_kib}}
        if vmem_kib else {}
    )

    def time_cfg(block_k, budget, hd_true=0):
        @functools.partial(jax.jit, **jit_kw)
        def loop(qp, kp, vp, o, do, l, m):
            def body(i, carry):
                scale = 1.0 + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-8)
                dq, dk, dv = _bwd_cross_ln_pallas(
                    qp * scale, kp, vp, o, do, l, m, h, hd,
                    block_k=block_k, qc_budget=budget, hd_true=hd_true,
                )
                return carry + dq[0, 0, 0].astype(jnp.float32)

            return jax.lax.fori_loop(0, N_IT, body, jnp.float32(0.0))

        try:
            float(loop(qp * jnp.bfloat16(0.5), kp, vp, o, do, l, m))  # warmup, distinct input
        except Exception as e:
            msg = str(e)
            if "vmem" in msg.lower() or "Scoped allocation" in msg:
                return None
            raise
        t0 = time.perf_counter()
        float(loop(qp, kp, vp, o, do, l, m))
        dt = (time.perf_counter() - t0) / N_IT
        if dt < 0.5e-3:
            print(f"  WARNING: {dt*1e3:.2f} ms below sanity floor — memoised?")
        return dt

    # hd_true=48: skip the pad-lane arithmetic of the 48->64 packing (the
    # production decoder path since r4); 0 = full padded width
    for block_k, budget, hd_true in [
        (512, 300_000, 0), (512, 480_000, 0), (512, 700_000, 0),
        (768, 300_000, 0), (768, 420_000, 0),
        (1024, 300_000, 0), (1024, 240_000, 0),
        (256, 300_000, 0),
        (768, 420_000, 48), (512, 480_000, 48), (1024, 300_000, 48),
    ]:
        dt = time_cfg(block_k, budget, hd_true)
        tag = f" hd_true={hd_true}" if hd_true else ""
        if dt is None:
            print(f"bk={block_k:5d} budget={budget:7d}{tag}: VMEM OOM")
            continue
        print(
            f"bk={block_k:5d} budget={budget:7d}{tag}: {dt*1e3:6.2f} ms/layer "
            f"({flops / dt / 1e12:5.1f} TFLOP/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
