"""Where does the bench step time go? Times model sections on the real chip.

Sections (each an in-graph fori_loop with data dependency, PERFORMANCE.md
timing rules; the FIRST loop is a sacrificial re-measure of the full model —
the first timed dispatch in a process can read ~0 ms):

  full      — CrossScoreNet forward, bench operating point (B=8, K=8, 518px)
  backbone  — Dinov2Encoder alone on the 72 stacked views
  decoder   — 2-layer cross-reference decoder alone (1369 q x 10952 kv tokens)

Usage: python tools/model_breakdown.py [full backbone decoder]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

import numpy as np

BATCH, K, HW = 8, 8, 518
N_IT = 6


def _time_loop(jax, jnp, fn, args, n_it=N_IT, label=""):
    """fn(i, *args) -> array; chained via additive perturbation."""

    @jax.jit
    def loop(*args):
        def body(i, c):
            out = fn(i + c * 0, *args)  # c-dependency keeps iterations ordered
            return c + out.reshape(-1)[0].astype(jnp.float32)

        return jax.lax.fori_loop(0, n_it, body, jnp.float32(0.0))

    # every dispatch uses DISTINCT input values (the relay memoises identical
    # (program, inputs) pairs — a repeat reads ~0 ms)
    import jax.numpy as jnp

    scaled = lambda mult: tuple(
        a * jnp.bfloat16(mult) if hasattr(a, "dtype") and a.dtype == jnp.bfloat16 else a
        for a in args
    )
    t = time.perf_counter()
    loop(*scaled(0.5)).block_until_ready()
    compile_s = time.perf_counter() - t
    dts = []
    for mult in (0.75, 1.0):
        inputs = scaled(mult)
        t0 = time.perf_counter()
        loop(*inputs).block_until_ready()
        dts.append(time.perf_counter() - t0)
    dt = max(dts) / n_it
    print(f"{label:12s} {dt*1e3:8.2f} ms  (compile {compile_s:.0f}s, "
          f"runs {dts[0]*1e3:.0f}/{dts[1]*1e3:.0f}ms)", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from crossscore_tpu.utils.compilation_cache import enable

    enable()
    from crossscore_tpu.confsys import load_config
    from crossscore_tpu.models import CrossScoreNet, CrossScoreConfig
    from crossscore_tpu.models.dinov2 import Dinov2Encoder
    from crossscore_tpu.models.decoder import CrossReferenceDecoder

    sections = sys.argv[1:] or ["full", "backbone", "decoder"]
    cfg = load_config("default_predict")
    mcfg = CrossScoreConfig.from_config(cfg)
    rng = np.random.default_rng(time.time_ns())  # fresh seed: the relay memoises (program, inputs) across sessions

    if "full" in sections or "full2" in sections:
        model = CrossScoreNet(mcfg)
        query = jnp.asarray(rng.standard_normal((BATCH, HW, HW, 3)), jnp.bfloat16)
        refs = jnp.asarray(rng.standard_normal((BATCH, K, HW, HW, 3)), jnp.bfloat16)
        params = model.init(
            jax.random.PRNGKey(0), query[:1, :70, :70], refs[:1, :, :70, :70]
        )["params"]

        def fwd(i, q, r):
            qq = q * (1.0 + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-8))
            return model.apply({"params": params}, qq, r)["score_map_ref_cross"]

        _time_loop(jax, jnp, fwd, (query, refs), label="full(warm)")
        _time_loop(jax, jnp, fwd, (query, refs), label="full")

    backbone_variants = [s for s in sections if s.startswith("backbone")]
    if backbone_variants:
        imgs = jnp.asarray(
            rng.standard_normal((BATCH * (1 + K), HW, HW, 3)), jnp.bfloat16
        )
        for sec in backbone_variants:
            # backbone | backbone_int8 | backbone_xla | backbone_fusedmlp
            quant = "int8" if "int8" in sec else "none"
            impl = "xla" if "xla" in sec else mcfg.attention_impl
            mlp = "fused" if "fusedmlp" in sec else "xla"
            enc = Dinov2Encoder(mcfg.backbone, dtype=jnp.bfloat16,
                                attention_impl=impl, quant=quant, mlp_impl=mlp)
            eparams = enc.init(jax.random.PRNGKey(0), imgs[:1, :70, :70])["params"]

            def enc_fwd(i, x, _enc=enc, _p=eparams):
                xx = x * (1.0 + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-8))
                return _enc.apply({"params": _p}, xx)

            _time_loop(jax, jnp, enc_fwd, (imgs,), label=sec)

    if "decoder" in sections:
        d = mcfg.backbone.hidden_size
        n_patch = (HW // 14) ** 2
        dec = CrossReferenceDecoder(
            d_model=d, num_heads=mcfg.decoder_heads, num_layers=mcfg.decoder_layers,
            ffn_ratio=mcfg.decoder_ffn_ratio, do_self_attn=True, do_short_cut=True,
            dtype=jnp.bfloat16, attention_impl=mcfg.attention_impl,
        )
        qt = jnp.asarray(rng.standard_normal((BATCH, n_patch, d)), jnp.bfloat16)
        kt = jnp.asarray(rng.standard_normal((BATCH, K * n_patch, d)), jnp.bfloat16)
        dparams = dec.init(jax.random.PRNGKey(0), qt, kt)["params"]

        def dec_fwd(i, q, kv):
            qq = q * (1.0 + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-8))
            return dec.apply({"params": dparams}, qq, kv)[0]

        _time_loop(jax, jnp, dec_fwd, (qt, kt), label="decoder")


if __name__ == "__main__":
    main()
