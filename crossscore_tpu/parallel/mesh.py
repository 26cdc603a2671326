"""Device mesh + sharding strategy.

The reference scales with Lightning DDP over NCCL (reference
``task/train.py:109-114``). TPU-native equivalent: single-controller SPMD —
one jitted step over a ``jax.sharding.Mesh``; XLA inserts the gradient
all-reduce over ICI from the sharding annotations (no explicit collectives).

Axes:
- ``data``: batch-dim sharding (DP). Gradients all-reduce automatically.
- ``model`` (optional): Megatron-style tensor parallelism for the decoder and
  backbone MLP/attention projections — column-parallel first matmul
  (kernel sharded on output dim), row-parallel second matmul (input dim), with
  XLA inserting the psum. The 384-dim model doesn't need TP at production
  scale, but the ViT-L / 2x-resolution stress configs (BASELINE.json config 5)
  do, and the same annotations serve both.

Multi-host: ``jax.distributed.initialize`` + per-host data sharding is handled
by the caller (tasks/train.py); ``process_index() == 0`` replaces the
reference's ``rank_zero_only`` gating.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# Most recently constructed mesh. GSPMD cannot partition `pallas_call`, so
# kernels that must run under tensor parallelism are wrapped in `shard_map`,
# which needs the mesh axes at TRACE time — but Flax modules only carry config
# strings ("tp:model"). make_mesh registers here; current_mesh() resolves it.
_CURRENT_MESH: Optional[Mesh] = None


def current_mesh() -> Mesh:
    if _CURRENT_MESH is None:
        raise RuntimeError(
            "No mesh registered: build one with parallel.make_mesh() (or call "
            "parallel.set_current_mesh) before using a 'tp:<axis>' attention impl"
        )
    return _CURRENT_MESH


def set_current_mesh(mesh: Mesh) -> None:
    global _CURRENT_MESH
    _CURRENT_MESH = mesh


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    batch_size: Optional[int] = None,
) -> Mesh:
    """1-D ``(data,)`` mesh, or 2-D ``(data, model)`` when model_parallel > 1.

    If ``batch_size`` is given, the data axis is clamped to the largest device
    count that divides it (per-device batches must be equal under SPMD).
    """
    devices = jax.devices()
    n = len(devices) if n_devices in (None, -1) else min(n_devices, len(devices))
    if n < model_parallel:
        # without this the batch clamp below computes data_par = 0 and
        # silently builds an empty mesh that fails later with an opaque
        # shape error instead of here
        raise ValueError(
            f"model_parallel={model_parallel} exceeds the {n} available devices"
        )
    if batch_size is not None:
        data_par = n // model_parallel
        if jax.process_count() > 1:
            # multi-host: clamping would drop whole hosts' devices from the
            # mesh, which the per-process global-batch assembly
            # (data/loader.py _ship) cannot express — the GLOBAL batch
            # (per-process batch x process count) must divide instead
            global_batch = batch_size * jax.process_count()
            if global_batch % data_par:
                raise ValueError(
                    f"global batch {global_batch} (= {batch_size} per process"
                    f" x {jax.process_count()} processes) is not divisible "
                    f"over the {data_par}-way data axis; adjust "
                    f"data.loader.train.batch_size or trainer.devices"
                )
        else:
            while data_par > 1 and batch_size % data_par:
                data_par -= 1
            n = data_par * model_parallel
    devices = np.asarray(devices[:n])
    if model_parallel > 1:
        if n % model_parallel:
            raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
        mesh = Mesh(devices.reshape(n // model_parallel, model_parallel), ("data", "model"))
    else:
        mesh = Mesh(devices, ("data",))
    set_current_mesh(mesh)
    return mesh


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def local_batch_sharding(batch_size: int) -> NamedSharding:
    """Host-LOCAL 1-D batch sharding (not registered as the current mesh).

    The cached-serving path computes on each process's own query shard with
    host-local batches (reference DDP-predict semantics, ``task/predict.py:
    119-124``: every rank runs its subset and writes rank-qualified files) —
    a global SPMD mesh cannot be fed from host-local arrays, but a mesh of
    ``jax.local_devices()`` can, and it keeps all local chips busy. On a
    single process this is ordinary single-host data parallelism."""
    devs = jax.local_devices()
    n = len(devs)
    while n > 1 and batch_size % n:
        n -= 1
    return NamedSharding(Mesh(np.asarray(devs[:n]), ("data",)), P("data"))


def local_view_mesh() -> Mesh:
    """Host-LOCAL 1-D mesh over all local devices, axis ``view``.

    The cache x view-parallel x multi-host serving composition: each process
    predicts its own query shard with the K reference views sharded over its
    OWN chips — the context-parallel softmax combine (``cp:view``) rides
    intra-host ICI only, and cached token batches stay host-local (a global
    mesh would need every process to co-assemble each array). Data
    parallelism across hosts comes from the per-process index shard
    (reference DDP-predict semantics, ``task/predict.py:119-124``)."""
    return Mesh(np.asarray(jax.local_devices()), ("view",))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Put a host batch onto the mesh, sharded along the batch dimension."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def _tp_spec_for(path: tuple, leaf) -> P:
    """Tensor-parallel PartitionSpec for one param leaf (2-D mesh only).

    Column-parallel: qkv/q/k/v projections, MLP fc1/linear1, head_fc1
    (kernel (in, out) -> P(None, 'model')). Row-parallel: out projections,
    fc2/linear2 (kernel -> P('model', None)); their biases stay replicated and
    XLA produces the partial-sum psum.
    """
    names = [str(p) for p in path]
    joined = "/".join(names)
    is_kernel = names[-1] == "kernel"
    if not is_kernel or getattr(leaf, "ndim", 0) != 2:
        return P()
    col = any(t in joined for t in ("qkv", "q_proj", "k_proj", "v_proj", "fc1", "linear1"))
    row = any(t in joined for t in ("out", "out_proj", "fc2", "linear2"))
    if col:
        return P(None, "model")
    if row:
        return P("model", None)
    return P()


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """NamedShardings for a param tree: replicated on a 1-D mesh; Megatron-style
    TP on the ``model`` axis of a 2-D mesh."""
    has_model_axis = "model" in mesh.axis_names

    def spec(path, leaf):
        if not has_model_axis:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, _tp_spec_for(tuple(p.key for p in path), leaf))

    return jax.tree_util.tree_map_with_path(spec, params)
