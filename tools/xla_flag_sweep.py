"""Profile-guided XLA flag sweep over the headline forward graph.

VERDICT r2 #8: the last untried forward lever besides Mosaic scheduling.
Times the full CrossScoreNet forward (bench operating point: B=8, K=8, 518px
bf16) under per-jit ``compiler_options`` variations — the only way to pass
TPU-only XLA flags here (env XLA_FLAGS crashes the local jaxlib; per-jit
options forward through the tunnel's remote compile, CLAUDE.md).

Each option set is a FRESH compile (options are part of the compilation-cache
key), so a full sweep costs one cold compile per set — run it in the
background. Rejected flags (unknown to the remote compiler) are reported as
data, not errors.

Usage:
    python tools/xla_flag_sweep.py                 # curated default subset
    python tools/xla_flag_sweep.py all             # every candidate set
    python tools/xla_flag_sweep.py baseline no_lhs # named sets only

Timing: in-graph fori_loop, data-dependent perturbation per iteration, warmup
on distinct input values, two timed dispatches with distinct scales keeping
the slower (the full memoisation-proof discipline, PERFORMANCE.md).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

import numpy as np

BATCH, K, HW = 8, 8, 518
N_IT = 8

# Candidate single-chip compute flags. Collective/SPMD flags (the MaxText
# lists) are irrelevant on one chip and excluded. Values are strings — the
# remote compile parses them like XLA_FLAGS words.
SETS = {
    "baseline": {},
    # scheduler: off is expected to LOSE; it bounds how much the latency-
    # hiding scheduler is worth on this graph (data either way)
    "no_lhs": {"xla_tpu_enable_latency_hiding_scheduler": "false"},
    # strength-reduced dots sometimes mis-tile small-K matmuls (hd=48/64)
    "no_dot_strength": {"xla_tpu_enable_dot_strength_reduction": "false"},
    # reduce-window/broadcast fusion off: affects LN/softmax epilogues
    "no_rwb_fusion": {"xla_tpu_rwb_fusion": "false"},
    # allow duplicating a dot into two consumers instead of materialising
    "dot_dot_dup": {"xla_tpu_dot_dot_fusion_duplicated": "true"},
    # raise the non-Pallas scoped-VMEM budget for XLA's own fusions
    # (the 32M raise was a no-op for the PALLAS kernels; this targets the
    # XLA-generated fusions between them)
    "scoped_vmem_32m": {"xla_tpu_scoped_vmem_limit_kib": "32768"},
    # loop-invariant code motion size budget (conv/matmul epilogue hoisting)
    "licm_2x": {"xla_tpu_licm_size_inflation_ratio": "2.0"},
}
DEFAULT = ["baseline", "no_dot_strength", "no_rwb_fusion", "dot_dot_dup",
           "scoped_vmem_32m"]


def main():
    import jax
    import jax.numpy as jnp

    from crossscore_tpu.utils.compilation_cache import enable

    enable()
    from crossscore_tpu.confsys import load_config
    from crossscore_tpu.models import CrossScoreNet, CrossScoreConfig

    names = sys.argv[1:] or DEFAULT
    if names == ["all"]:
        names = list(SETS)
    for n in names:
        if n not in SETS:
            raise SystemExit(f"unknown set {n!r}; known: {list(SETS)}")

    cfg = load_config("default_predict")
    mcfg = CrossScoreConfig.from_config(cfg)
    model = CrossScoreNet(mcfg)
    rng = np.random.default_rng(time.time_ns())  # relay memoises across sessions
    query = jnp.asarray(rng.standard_normal((BATCH, HW, HW, 3)), jnp.bfloat16)
    refs = jnp.asarray(rng.standard_normal((BATCH, K, HW, HW, 3)), jnp.bfloat16)
    params = model.init(
        jax.random.PRNGKey(0), query[:1, :70, :70], refs[:1, :, :70, :70]
    )["params"]

    def loop_fn(q, r):
        def body(i, c):
            qq = q * (1.0 + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-8))
            out = model.apply({"params": params}, qq, r)
            return c + out["score_map_ref_cross"][0, 0, 0].astype(jnp.float32)

        return jax.lax.fori_loop(0, N_IT, body, jnp.float32(0.0))

    results = []
    sacrificial = True
    for name in names:
        opts = SETS[name]
        try:
            fn = jax.jit(loop_fn, compiler_options=opts) if opts else jax.jit(loop_fn)
            t = time.perf_counter()
            float(fn(query * jnp.bfloat16(0.5), refs))
            compile_s = time.perf_counter() - t
            if sacrificial:
                # first timed dispatch of a process can read ~0 ms; burn one
                float(fn(query * jnp.bfloat16(0.6), refs))
                sacrificial = False
            dts = []
            for mult in (0.75, 1.0):
                t0 = time.perf_counter()
                float(fn(query * jnp.bfloat16(mult), refs))
                dts.append(time.perf_counter() - t0)
            dt = max(dts) / N_IT
            maps_s = BATCH / dt
            floor_ms = BATCH * (1 + K) * 0.5
            flag = "  [BELOW SANITY FLOOR — memoised?]" if dt * 1e3 < floor_ms else ""
            print(f"{name:20s} {dt*1e3:8.2f} ms/fwd  {maps_s:7.2f} maps/s  "
                  f"(compile {compile_s:.0f}s, runs "
                  f"{dts[0]*1e3:.0f}/{dts[1]*1e3:.0f}ms){flag}", flush=True)
            results.append((name, dt * 1e3, maps_s))
        except Exception as e:
            print(f"{name:20s} REJECTED: {str(e)[:200]}", flush=True)
            results.append((name, float("inf"), 0.0))

    print("\nranked:")
    for name, ms, maps_s in sorted(results, key=lambda r: r[1]):
        print(f"  {name:20s} {ms:8.2f} ms/fwd  {maps_s:7.2f} maps/s")


if __name__ == "__main__":
    main()
