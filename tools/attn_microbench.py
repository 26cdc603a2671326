"""A/B microbenchmark for the backbone flash-attention kernel variants.

Times a chain of L=12 attention calls (the 12 ViT blocks of one backbone
forward at the bench operating point: B*K+B = 72 images, 6 heads, 1370
tokens, head_dim 64) inside one in-graph ``lax.fori_loop``, following the
timing rules in PERFORMANCE.md: warmup uses DIFFERENT input values than the
timed call (the execution relay memoises identical dispatches), and each
iteration feeds its output back as the next input (data dependency, CSE-proof).

Usage:
    python tools/attn_microbench.py v1:688,1408,2 v2:688,1408,2 v2aug:688,1408,2

Each spec is  <variant>:<block_q>,<block_k>,<block_h>  where variant is one of
v1 (round-1 kernel), v2 (fused bias+scale), v2aug (+ MXU row sums),
v2aug_bf16 (+ bf16 exp2). Prints ms/layer and TFLOP/s per spec, plus the max
|diff| vs the first spec's output for a numerics sanity check.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

import numpy as np

import os

# default: backbone self-attention at the bench point; DEC=1 switches to the
# decoder cross-attention shape (B=8, H=8, 1369 q x 10952 kv, hd=48)
if os.environ.get("ATTN_BENCH_DEC"):
    B, H, N, NK, HD = 8, 8, 1369, 8 * 1369, 48
    LAYERS = 4
else:
    B, H, N, HD = 72, 6, 1370, 64
    NK = N
LAYERS = int(os.environ.get("ATTN_BENCH_LAYERS", 12 if N == NK else 4))
N_IT = 4


def main():
    import jax
    import jax.numpy as jnp

    from crossscore_tpu.utils.compilation_cache import enable

    enable()
    from crossscore_tpu.ops.flash_attention import _flash_fwd

    specs = sys.argv[1:] or ["v1:688,1408,2", "v2:688,1408,2", "v2aug:688,1408,2"]
    rng = np.random.default_rng(time.time_ns())  # fresh seed: the relay memoises (program, inputs) across sessions
    q0 = jnp.asarray(rng.standard_normal((B, H, N, HD)), jnp.bfloat16)
    k0 = jnp.asarray(rng.standard_normal((B, H, NK, HD)), jnp.bfloat16)
    v0 = jnp.asarray(rng.standard_normal((B, H, NK, HD)), jnp.bfloat16)
    flops_per_layer = 4 * B * H * N * NK * HD

    ref_out = None
    for spec in specs:
        try:
            ref_out = _run_spec(spec, jax, jnp, _flash_fwd, q0, k0, v0,
                                flops_per_layer, ref_out)
        except Exception as e:  # e.g. VMEM OOM for an oversized config
            print(f"{spec:24s} FAILED: {str(e)[:160]}", flush=True)


def _run_spec(spec, jax, jnp, _flash_fwd, q0, k0, v0, flops_per_layer, ref_out):
    import time
    if True:
        name, blocks = spec.split(":")
        if name == "qkvp":
            # timing PROBE for the layout-native kernel (wrong math):
            # qkvp:<block_q>,<hpack>,<probe> with probe in {mxu,nomax,nosum}
            from crossscore_tpu.ops.flash_attention import _flash_qkv_fwd

            bq_s, hp_s, probe = blocks.split(",")
            bq, hp = int(bq_s), int(hp_s)
            qkv0 = jnp.concatenate(
                [x.transpose(0, 2, 1, 3).reshape(B, N, H * HD) for x in (q0, k0, v0)],
                axis=-1,
            )

            @jax.jit
            def loop(qkv, _bq=bq, _hp=hp, _probe=probe):
                def body(i, cur):
                    o = _flash_qkv_fwd(cur, H, block_q=_bq, hpack=_hp,
                                       probe=_probe)[0]
                    scale = 1.0 + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-8)
                    return jnp.tile(o * scale, (1, 1, 3))

                def layer_chain(i, cur):
                    return jax.lax.fori_loop(0, LAYERS, body, cur)

                out = jax.lax.fori_loop(0, N_IT, layer_chain, qkv)
                return out[0, 0, 0].astype(jnp.float32)

            t = time.perf_counter()
            loop(qkv0 * jnp.bfloat16(0.5)).block_until_ready()
            compile_s = time.perf_counter() - t
            dts = []
            for mult in (0.75, 1.0):
                t0 = time.perf_counter()
                loop(qkv0 * jnp.bfloat16(mult)).block_until_ready()
                dts.append(time.perf_counter() - t0)
            dt = max(dts)
            ms_layer = dt / (N_IT * LAYERS) * 1e3
            tflops = flops_per_layer / (ms_layer / 1e3) / 1e12
            print(f"{spec:24s} {ms_layer:7.2f} ms/layer  {tflops:6.1f} TFLOP/s  "
                  f"PROBE(wrong math)  (compile {compile_s:.0f}s, "
                  f"runs {dts[0]*1e3:.0f}/{dts[1]*1e3:.0f}ms, incl o->qkv tile)",
                  flush=True)
            return ref_out
        if name == "xln":
            # layout-native CROSS kernel at the decoder shape:
            # xln:<block_q>,<block_k> (token-major packed inputs; hd padded
            # to 64 with the q-prescale fold, as the decoder wires it)
            from crossscore_tpu.ops.flash_attention import _flash_cross_ln_fwd

            bq, bk = (int(x) for x in blocks.split(","))
            hd_pad = 64 if HD <= 64 else 128
            prescale = (hd_pad ** 0.5) / (HD ** 0.5)
            padh = lambda x: jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, hd_pad - HD)))
            packh = lambda x: x.transpose(0, 2, 1, 3).reshape(B, x.shape[2], H * hd_pad)
            qp0 = packh(padh(q0 * jnp.bfloat16(prescale)))
            kp0 = packh(padh(k0))
            vp0 = packh(padh(v0))

            @jax.jit
            def loop(qp, kp, vp, _bq=bq, _bk=bk):
                def body(i, c):
                    qq = qp * (1.0 + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-8))
                    o, _, _ = _flash_cross_ln_fwd(qq, kp, vp, H, hd_pad,
                                                  block_q=_bq, block_k=_bk)
                    return c + o[0, 0, 0].astype(jnp.float32)

                def layer_chain(i, c):
                    return jax.lax.fori_loop(0, LAYERS, body, c)

                return jax.lax.fori_loop(0, N_IT, layer_chain, jnp.float32(0))

            t = time.perf_counter()
            float(loop(qp0 * jnp.bfloat16(0.5), kp0, vp0))
            compile_s = time.perf_counter() - t
            dts = []
            for mult in (0.75, 1.0):
                t0 = time.perf_counter()
                float(loop(qp0 * jnp.bfloat16(mult), kp0, vp0))
                dts.append(time.perf_counter() - t0)
            ms_layer = max(dts) / (N_IT * LAYERS) * 1e3
            tflops = flops_per_layer / (ms_layer / 1e3) / 1e12
            print(f"{spec:24s} {ms_layer:7.2f} ms/layer  {tflops:6.1f} TFLOP/s  "
                  f"(compile {compile_s:.0f}s, runs {dts[0]*1e3:.0f}/{dts[1]*1e3:.0f}ms)",
                  flush=True)
            return ref_out
        if name in ("qkv", "qkvc"):
            # layout-native kernel: spec qkv:<block_q>,<hpack> or
            # qkvc:<block_q>,<hpack>,<n_chunks> (in-VMEM chunked online
            # softmax for MXU/VPU overlap). A trailing non-numeric part is a
            # Mosaic scheduling experiment, e.g. qkv:688,2,1,allpar+fuse
            # (see _flash_qkv_fwd sched). The loop carries (B, N, 3D)
            # directly; the o->qkv tile between layers costs one ~0.5ms copy
            # shared by all qkv specs (absent in the real model, where the
            # qkv projection produces the layout).
            from crossscore_tpu.ops.flash_attention import _flash_qkv_fwd

            raw = blocks.split(",")
            sched = raw.pop() if not raw[-1].lstrip("-").isdigit() else ""
            parts = [int(x) for x in raw]
            bq, hp = parts[0], parts[1]
            n_chunks = parts[2] if len(parts) > 2 else 1
            d3 = 3 * H * HD
            qkv0 = jnp.concatenate(
                [x.transpose(0, 2, 1, 3).reshape(B, N, H * HD) for x in (q0, k0, v0)],
                axis=-1,
            )

            @jax.jit
            def loop(qkv, _bq=bq, _hp=hp, _nc=n_chunks, _sched=sched):
                def body(i, cur):
                    o = _flash_qkv_fwd(cur, H, block_q=_bq, hpack=_hp,
                                       chunks=_nc, sched=_sched)[0]
                    scale = 1.0 + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-8)
                    return jnp.tile(o * scale, (1, 1, 3))

                def layer_chain(i, cur):
                    return jax.lax.fori_loop(0, LAYERS, body, cur)

                out = jax.lax.fori_loop(0, N_IT, layer_chain, qkv)
                return out[0, 0, 0].astype(jnp.float32)

            out = _flash_qkv_fwd(qkv0, H, block_q=bq, hpack=hp, chunks=n_chunks,
                                 sched=sched)[0]
            out = out.reshape(B, N, H, HD).transpose(0, 2, 1, 3)
            out.block_until_ready()
            diff = 0.0 if ref_out is None else float(
                jnp.max(jnp.abs(out.astype(jnp.float32) - ref_out.astype(jnp.float32))))
            if ref_out is None:
                ref_out = out
            t = time.perf_counter()
            loop(qkv0 * jnp.bfloat16(0.5)).block_until_ready()
            compile_s = time.perf_counter() - t
            dts = []
            for mult in (0.75, 1.0):
                t0 = time.perf_counter()
                loop(qkv0 * jnp.bfloat16(mult)).block_until_ready()
                dts.append(time.perf_counter() - t0)
            dt = max(dts)
            ms_layer = dt / (N_IT * LAYERS) * 1e3
            tflops = flops_per_layer / (ms_layer / 1e3) / 1e12
            print(f"{spec:24s} {ms_layer:7.2f} ms/layer  {tflops:6.1f} TFLOP/s  "
                  f"maxdiff={diff:.4f}  (compile {compile_s:.0f}s, "
                  f"runs {dts[0]*1e3:.0f}/{dts[1]*1e3:.0f}ms, incl o->qkv tile)",
                  flush=True)
            return ref_out
        else:
            bq, bk, bh = (int(x) for x in blocks.split(","))
            variant = {"v1": "v1", "v2": "v2", "v2noaug": "v2_noaug",
                       "v2bf16": "v2_bf16", "v2noexp": "v2_noexp",
                       "v2mxu": "v2_mxuprobe"}[name]  # v2mxu: wrong-math probe

            def attn(q, k, v, _variant=variant, _bq=bq, _bk=bk, _bh=bh):
                return _flash_fwd(q, k, v, block_q=_bq, block_k=_bk, block_h=_bh,
                                  variant=_variant)[0]

        # numerics check vs first spec (single call)
        out = attn(q0, k0, v0)
        out.block_until_ready()
        if ref_out is None:
            ref_out = out
            diff = 0.0
        else:
            diff = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                         - ref_out.astype(jnp.float32))))

        @jax.jit
        def loop(q, k, v, _attn=attn):
            def body(i, carry):
                qq, kk, vv = carry
                o = _attn(qq, kk, vv)
                # feed output back as q; tiny perturbation keeps values bounded
                # (k/v keep their shape — Nq != Nk for the decoder mode)
                scale = 1.0 + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-8)
                return (o * scale, kk, vv)

            def layer_chain(i, carry):
                return jax.lax.fori_loop(0, LAYERS, body, carry)

            q, k, v = jax.lax.fori_loop(0, N_IT, layer_chain, (q, k, v))
            return q[0, 0, 0, 0].astype(jnp.float32)

        t = time.perf_counter()
        loop(q0 * jnp.bfloat16(0.5), k0, v0).block_until_ready()  # warmup, distinct values
        compile_s = time.perf_counter() - t
        # The FIRST timed dispatch in a process intermittently reads ~0 ms
        # (relay memoisation / non-blocking block_until_ready — see memory
        # notes); measure twice with distinct inputs and keep the slower.
        dts = []
        for mult in (0.75, 1.0):
            t0 = time.perf_counter()
            loop(q0 * jnp.bfloat16(mult), k0, v0).block_until_ready()
            dts.append(time.perf_counter() - t0)
        dt = max(dts)
        ms_layer = dt / (N_IT * LAYERS) * 1e3
        tflops = flops_per_layer / (ms_layer / 1e3) / 1e12
        print(f"{spec:24s} {ms_layer:7.2f} ms/layer  {tflops:6.1f} TFLOP/s  "
              f"maxdiff={diff:.4f}  (compile {compile_s:.0f}s, "
              f"runs {dts[0]*1e3:.0f}/{dts[1]*1e3:.0f}ms)",
              flush=True)
    return ref_out


if __name__ == "__main__":
    main()
