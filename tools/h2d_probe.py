"""Probe: host->device transfer rate through the axon tunnel.

Times device_put of (a) the float32 pixel batch the loader currently ships
(B=24, K=5, 518px ~ 490 MB) vs (b) the same batch as uint8 (~116 MB), each
anchored by a tiny jitted reduction + host fetch of a scalar (CLAUDE.md
timing hazard: block_until_ready on remote pytrees does not synchronise).
Fresh time-seeded values per rep so the relay cannot memoise.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

dev = jax.devices()[0]
print("device:", dev)

B, K, S = 24, 5, 518

@jax.jit
def consume_f32(x, y):
    return jnp.float32(x[0, 0, 0, 0]) + jnp.float32(y[0, 0, 0, 0, 0])

@jax.jit
def consume_u8(x, y):
    return jnp.float32(x[0, 0, 0, 0]) + jnp.float32(y[0, 0, 0, 0, 0])

rng = np.random.default_rng(int(time.time()))

for name, dt, fn in [("float32", np.float32, consume_f32),
                     ("uint8", np.uint8, consume_u8)]:
    for rep in range(2):
        if dt is np.float32:
            q = rng.random((B, S, S, 3), dtype=np.float32)
            r = rng.random((B, K, S, S, 3), dtype=np.float32)
        else:
            q = rng.integers(0, 255, (B, S, S, 3), dtype=np.uint8)
            r = rng.integers(0, 255, (B, K, S, S, 3), dtype=np.uint8)
        nbytes = q.nbytes + r.nbytes
        t0 = time.perf_counter()
        qd = jax.device_put(q, dev)
        rd = jax.device_put(r, dev)
        s = float(fn(qd, rd))  # host fetch anchors the timing
        dt_s = time.perf_counter() - t0
        print(f"{name} rep{rep}: {nbytes/1e6:.0f} MB in {dt_s:.2f}s "
              f"= {nbytes/1e6/dt_s:.1f} MB/s (sum={s:.3e})")
