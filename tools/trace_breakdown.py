"""Capture a device profile of the backbone forward and print the per-op
time breakdown — the ground truth the in-graph microbenches approximate.

This is how the ~0.6 ms/layer of hidden reshape copies around the fused MLP
kernel was found (r2): flattening (B, N, D) -> (B*N, D) forces a physical
re-tile on TPU when N is not sublane-aligned.

Trace parsing: the tensorboard profile plugin in this image is version-skewed
against tensorflow, but the raw XSpace proto parses fine with
``tensorflow.tsl.profiler.protobuf.xplane_pb2`` under
``PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python`` (set below before TF import).

Usage: python tools/trace_breakdown.py [trace_dir]
  With no arg: captures a fresh 3-forward backbone trace into /tmp/jaxtrace
  (bench operating point) and analyses it. With a dir: analyse an existing
  trace (e.g. from tasks/train.py's profiler window).
"""

import collections
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import numpy as np


def capture(trace_dir: str) -> None:
    import jax
    import jax.numpy as jnp

    from crossscore_tpu.utils.compilation_cache import enable

    enable()
    from crossscore_tpu.confsys import load_config
    from crossscore_tpu.models import CrossScoreConfig
    from crossscore_tpu.models.dinov2 import Dinov2Encoder

    cfg = load_config("default_predict")
    mcfg = CrossScoreConfig.from_config(cfg)
    rng = np.random.default_rng(time.time_ns())
    imgs = jnp.asarray(rng.standard_normal((72, 518, 518, 3)), jnp.bfloat16)
    enc = Dinov2Encoder(mcfg.backbone, dtype=jnp.bfloat16,
                        attention_impl=mcfg.attention_impl, mlp_impl=mcfg.mlp_impl)
    params = enc.init(jax.random.PRNGKey(0), imgs[:1, :70, :70])["params"]
    fwd = jax.jit(lambda x: enc.apply({"params": params}, x))
    fwd(imgs * jnp.bfloat16(0.5)).block_until_ready()
    with jax.profiler.trace(trace_dir):
        for mult in (0.7, 0.8, 0.9):
            float(fwd(imgs * jnp.bfloat16(mult))[0, 0, 0].astype(jnp.float32))
    print(f"trace captured -> {trace_dir}", flush=True)


def analyse(trace_dir: str, n_runs: int = 3) -> None:
    import glob

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(f"{trace_dir}/plugins/profile/*/*.xplane.pb")
    if not paths:
        raise SystemExit(f"no .xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(sorted(paths)[-1], "rb").read())
    for p in xs.planes:
        if not p.name.startswith("/device:"):
            continue
        ev_names = p.event_metadata
        for ln in p.lines:
            if ln.name != "XLA Ops":
                continue
            tot = collections.Counter()
            cnt = collections.Counter()
            for ev in ln.events:
                name = ev_names[ev.metadata_id].name
                fam = re.split(r"[ .=]", name.lstrip("%"))[0]
                tot[fam] += ev.duration_ps / 1e9 / n_runs  # ms per run
                cnt[fam] += 1
            print(f"{p.name}: {sum(tot.values()):.1f} ms/run over "
                  f"{len(ln.events)} events ({n_runs} runs)")
            for name, ms in tot.most_common(20):
                print(f"   {ms:7.2f} ms  x{cnt[name] // n_runs:4d}  {name}")


def main():
    if len(sys.argv) > 1:
        analyse(sys.argv[1])
    else:
        capture("/tmp/jaxtrace")
        analyse("/tmp/jaxtrace")


if __name__ == "__main__":
    main()
