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


def _device_process_groups(devices, n_proc: int) -> list:
    """Split the global device list into ``n_proc`` equal per-process groups.

    Real multi-host: group by ``d.process_index`` (jax orders ``devices()``
    by process, but don't rely on it). Emulated multi-host (tests patch
    ``jax.process_count`` while every device is local) can't satisfy that
    grouping, so fall back to contiguous equal chunks — the same shape a real
    topology with ``len(devices)/n_proc`` chips per host would have."""
    groups: dict = {}
    for d in devices:
        groups.setdefault(getattr(d, "process_index", 0), []).append(d)
    sizes = {len(g) for g in groups.values()}
    if len(groups) == n_proc and len(sizes) == 1:
        return [groups[k] for k in sorted(groups)]
    if len(groups) > 1:
        # a REAL multi-host topology (distinct process_index values) that the
        # grouping cannot cover evenly — e.g. a host with fewer healthy
        # chips, or a device subset slicing across hosts. Chunking by list
        # position here would hand "process p" another host's devices, and
        # make_array_from_process_local_data (data/loader.py::_ship) would
        # fail far from the cause — refuse loudly instead.
        raise ValueError(
            f"multi-host device groups are uneven ({ {k: len(g) for k, g in groups.items()} } "
            f"across {n_proc} processes); an SPMD data mesh needs an equal "
            "device count per host — exclude the uneven host or fix its chips"
        )
    per = len(devices) // n_proc
    if per == 0:
        raise ValueError(
            f"{len(devices)} devices cannot cover {n_proc} processes"
        )
    return [list(devices[i * per : (i + 1) * per]) for i in range(n_proc)]


def _per_process_data_par(group_size: int, model_parallel: int, batch_size: int) -> int:
    """Per-process width of the data axis: the largest d <= group_size //
    model_parallel with ``batch_size % d == 0``. Each process contributes its
    OWN ``batch_size`` decoded rows to the global batch
    (``data/loader.py::_ship`` via ``make_array_from_process_local_data``),
    so those rows must divide evenly over the process's mesh devices —
    the reference DDP invariant of equal per-device shards
    (reference ``task/train.py:109-114``)."""
    d = group_size // model_parallel
    if d < 1:
        raise ValueError(
            f"model_parallel={model_parallel} exceeds the {group_size} "
            "devices available per process"
        )
    while d > 1 and batch_size % d:
        d -= 1
    return d


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    batch_size: Optional[int] = None,
) -> Mesh:
    """1-D ``(data,)`` mesh, or 2-D ``(data, model)`` when model_parallel > 1.

    If ``batch_size`` is given, the data axis is clamped to the largest device
    count that divides it (per-device batches must be equal under SPMD).
    Multi-host, the clamp is applied PER PROCESS — an equal number of devices
    is kept from every host (dropping a whole host would strand its loader
    shard; ``data/loader.py::_ship`` assembles each process's ``batch_size``
    rows onto that process's own mesh devices), and per-process batches are
    contiguous blocks along the data axis in process order.
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
        n_proc = jax.process_count()
        if n_proc > 1:
            groups = _device_process_groups(devices, n_proc)
            per_host = min(len(g) for g in groups)
            if n_devices not in (None, -1):
                # an explicit device cap is interpreted globally; keep the
                # per-host counts equal under it. A cap below one device per
                # process is unsatisfiable — never silently exceed it.
                if n < n_proc:
                    raise ValueError(
                        f"trainer.devices={n_devices} is below the "
                        f"{n_proc} processes; a multi-host data mesh needs "
                        ">=1 device per process"
                    )
                per_host = min(per_host, n // n_proc)
            d = _per_process_data_par(per_host, model_parallel, batch_size)
            sel = [dev for g in groups for dev in g[: d * model_parallel]]
            n = len(sel)
            devices = sel
        else:
            data_par = n // model_parallel
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
