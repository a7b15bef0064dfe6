"""Device mesh and sharding rules.

The reference is single-process, single-device (A1_train.py:222-224) with no
communication layer of any kind (SURVEY.md §2.9).  Here scaling is expressed
the XLA way: a ("data", "model") mesh; batches sharded on "data"
(data-parallel — gradients all-reduce over ICI automatically); attention
heads and feed-forward hidden dims sharded on "model" (tensor-parallel).
XLA inserts the collectives; there is no hand-written NCCL/MPI analogue to
port.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = -1, model: int = 1,
              devices=None) -> Mesh:
    """Build a ("data", "model") mesh.  data=-1 uses all remaining devices.

    When the default backend has too few devices for the requested mesh
    (e.g. one real TPU chip while testing an 8-way sharding), fall back to
    the virtual CPU devices (xla_force_host_platform_device_count).
    """
    if devices is None:
        devices = jax.devices()
        need = (1 if data == -1 else data) * model
        if len(devices) < need:
            try:
                cpus = jax.devices("cpu")
            except RuntimeError:
                cpus = []
            if len(cpus) >= need:
                devices = cpus
    n = len(devices)
    if data == -1:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} exceeds {n} devices")
    grid = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(grid, ("data", "model"))


# ---------------------------------------------------------------------------
# parameter sharding rules (tensor parallel over the "model" axis)
# ---------------------------------------------------------------------------

def _param_pspec(path: tuple, leaf) -> P:
    """Partition rule by parameter path.

    * attention q/k/v: output (head) dim on "model"; out_proj: input dim on
      "model" (the classic Megatron split — XLA reduces the partial sums)
    * feed-forward: linear1 output / linear2 input on "model"
    * SwiGLU: fc1/fc2 output, fc3 input on "model"
    * everything else (embeddings, norms, heads) replicated — they are tiny
    """
    names = [getattr(k, "key", str(k)) for k in path]
    name = "/".join(names)
    is_kernel = names[-1] == "kernel"
    ndim = getattr(leaf, "ndim", len(getattr(leaf, "shape", ())))
    lead = (None,) * max(ndim - (2 if is_kernel else 1), 0)

    def col():  # shard output features (rank-general: scan adds a lead axis)
        return P(*lead, None, "model") if is_kernel else P(*lead, "model")

    def row():  # shard input features; bias replicated
        return P(*lead, "model", None) if is_kernel else P()

    if any(a in name for a in ("q_proj", "k_proj", "v_proj")):
        return col()
    if "out_proj" in name:
        return row()
    if "ff/linear1" in name:
        return col()
    if "ff/linear2" in name:
        return row()
    if "/fc1/" in name or "/fc2/" in name:
        return col()
    if "/fc3/" in name:
        return row()
    return P()


def param_shardings(params, mesh: Mesh):
    """NamedSharding tree for a parameter pytree."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _param_pspec(path, leaf)),
        params)


def batch_shardings(batch, mesh: Mesh):
    """Shard every array's leading (batch) axis over "data"."""
    return jax.tree.map(
        lambda _: NamedSharding(mesh, P("data")), batch)


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_params(params, mesh: Mesh):
    from .distributed import global_put
    return jax.tree.map(global_put, params, param_shardings(params, mesh))


def shard_batch(batch, mesh: Mesh):
    from .distributed import global_put
    return jax.tree.map(global_put, batch, batch_shardings(batch, mesh))
