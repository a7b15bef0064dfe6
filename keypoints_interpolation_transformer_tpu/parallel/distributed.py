"""Multi-host (multi-process) execution.

The reference is strictly single-process, single-device
(A1_train.py:222-224) with no distributed layer of any kind (SURVEY.md
§2.9); this module EXTENDS the mesh layer across hosts the JAX way:

* ``jax.distributed.initialize`` joins the coordination service (one
  coordinator address, every process calls in with its rank);
* the device mesh becomes hybrid DCN x ICI: the data-parallel axis spans
  processes over the slow inter-host network (gradient all-reduce is the
  only cross-host collective), while the tensor-parallel axis stays inside
  a process/slice where ICI bandwidth lives
  (``mesh_utils.create_hybrid_device_mesh``);
* host arrays are lifted to global sharded arrays with
  ``make_array_from_callback`` — every process holds the full host batch
  (the pipeline is seed-deterministic, so all ranks assemble identical
  batches) and contributes only the shards it is addressable for;
* metrics come back via ``multihost_utils.process_allgather``.

Single-process behaviour is unchanged: every helper degrades to the plain
single-host path when ``jax.process_count() == 1``.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding

_INITIALIZED = False


def init_distributed(coordinator: str, num_processes: int, process_id: int,
                     local_device_ids=None) -> None:
    """Join the jax.distributed coordination service (idempotent)."""
    global _INITIALIZED
    if _INITIALIZED or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids)
    _INITIALIZED = True


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def is_coordinator() -> bool:
    return jax.process_index() == 0


def make_hybrid_mesh(data: int = -1, model: int = 1,
                     dcn_data: Optional[int] = None) -> Mesh:
    """("data", "model") mesh whose data axis spans processes over DCN.

    ``dcn_data`` defaults to the process count; the per-process remainder
    of the data axis (and all of the model axis) is laid out over the
    intra-process devices so tensor-parallel collectives ride ICI.
    """
    nproc = jax.process_count()
    dcn = nproc if dcn_data is None else dcn_data
    if dcn <= 1:
        from .mesh import make_mesh
        return make_mesh(data, model)
    from jax.experimental import mesh_utils

    devices = jax.devices()
    need = (model * dcn if data == -1
            else max(data, 1) * model)
    if len(devices) < need:
        # same fallback as mesh.make_mesh: a too-small default backend
        # (e.g. the one real TPU chip during tests) falls back to the
        # virtual CPU devices
        try:
            cpus = jax.devices("cpu")
        except RuntimeError:
            cpus = []
        if len(cpus) >= need:
            devices = cpus
    ndev = len(devices)
    if ndev % dcn:
        raise ValueError(f"{ndev} devices not divisible by dcn={dcn}")
    per = ndev // dcn
    if per % model:
        raise ValueError(f"{per} devices/granule not divisible by "
                         f"model={model}")
    ici_data = per // model
    if data not in (-1, dcn * ici_data):
        raise ValueError(
            f"data={data} incompatible with dcn_data={dcn} x "
            f"ici_data={ici_data} (= {dcn * ici_data})")
    try:
        # TPU pods: granule = slice (devices carry slice_index)
        grid = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(ici_data, model), dcn_mesh_shape=(dcn, 1),
            devices=devices)
    except ValueError:
        # CPU and single-slice-per-process backends, including dcn counts
        # that GROUP several processes per DCN granule (e.g. 4 processes,
        # dcn_data=2): slice devices process-major into ``dcn`` contiguous
        # granules, lay each granule out (ici_rows, model), and stack the
        # granules along the data axis — "model" collectives stay inside a
        # granule, only the data all-reduce crosses the slow axis
        if nproc < dcn or nproc % dcn:
            raise ValueError(
                f"dcn_data={dcn} needs one granule (slices or process "
                f"groups) per DCN slot, but {nproc} process(es) cannot "
                f"form {dcn} equal granules")
        import numpy as _np
        devs = sorted(devices, key=lambda d: (d.process_index, d.id))
        per_granule = ndev // dcn
        ici_rows = per_granule // model
        grid = _np.concatenate(
            [_np.array(devs[g * per_granule:(g + 1) * per_granule],
                       dtype=object).reshape(ici_rows, model)
             for g in range(dcn)], axis=0)
    return Mesh(grid, ("data", "model"))


def global_put(x, sharding: NamedSharding):
    """Lift a full host/local array to a (possibly non-addressable) global
    sharded array.  Each process must hold the SAME full value; only the
    addressable shards are transferred."""
    if not is_multiprocess():
        return jax.device_put(x, sharding)
    arr = np.asarray(x)
    return jax.make_array_from_callback(arr.shape, sharding,
                                        lambda idx: arr[idx])


def gather_to_host(x) -> np.ndarray:
    """Fetch a (possibly non-addressable) global array to every host."""
    if not is_multiprocess():
        return np.asarray(x)
    if getattr(x, "is_fully_addressable", True):
        return np.asarray(x)
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


_CONCAT_JIT_CACHE: dict = {}


def _concat_ravel_jit(n_leaves: int):
    fn = _CONCAT_JIT_CACHE.get(n_leaves)
    if fn is None:
        import jax.numpy as jnp
        fn = jax.jit(lambda *ls: jnp.concatenate([x.ravel() for x in ls]))
        _CONCAT_JIT_CACHE[n_leaves] = fn
    return fn


def gather_tree_to_host(tree):
    """Fetch a pytree of (possibly non-addressable) global arrays to every
    host with ONE collective per dtype group instead of one per leaf.

    Per-leaf gathers spin up a fresh CPU Gloo context each (the
    checkpoint tree is ~100 leaves); every context is a rendezvous that
    every rank must reach within Gloo's connect timeout, and per-leaf
    compile-time skew across 4 contending processes was observed tripping
    it ("Gloo context initialization failed: Connect timeout").  Batching
    to one flat gather per dtype keeps values bit-exact and reduces the
    rendezvous count by ~50x."""
    leaves, treedef = jax.tree.flatten(tree)
    if not is_multiprocess() or not leaves:
        return jax.tree.map(gather_to_host, tree)
    from collections import defaultdict
    groups = defaultdict(list)
    for i, leaf in enumerate(leaves):
        groups[np.dtype(leaf.dtype).name].append(i)
    out = [None] * len(leaves)
    for idxs in groups.values():
        flat = _concat_ravel_jit(len(idxs))(*[leaves[i] for i in idxs])
        host = gather_to_host(flat)
        off = 0
        for i in idxs:
            n = int(np.prod(leaves[i].shape)) if leaves[i].shape else 1
            out[i] = host[off:off + n].reshape(leaves[i].shape)
            off += n
    return jax.tree.unflatten(treedef, out)


def gather_concat(chunks) -> np.ndarray:
    """Concatenate per-step 1-D metric arrays and fetch to every host.

    In a multi-process run the chunks are concatenated ON DEVICE first so
    the whole epoch costs ONE allgather instead of one per step (each CPU
    Gloo collective sets up a fresh context; per-step gathers were
    observed timing out under load)."""
    if not chunks:
        return np.zeros((0,), np.float32)
    if not is_multiprocess():
        return np.concatenate([np.asarray(x) for x in chunks])
    import jax.numpy as jnp
    return gather_to_host(jnp.concatenate([jnp.asarray(x) for x in chunks]))


def launch_local(num_processes: int, argv, port: int = 12377,
                 cpu_devices_per_process: int = 0, env=None):
    """Spawn ``argv`` ``num_processes`` times with the coordination env
    (coordinator on localhost:``port``); returns the Popen list.

    Used for same-machine multi-process runs and tests; on a real multi-
    host TPU pod each host launches its own rank with the coordinator
    pointing at host 0.
    """
    import os
    import subprocess
    import sys

    procs = []
    for pid in range(num_processes):
        e = dict(os.environ)
        if env:
            e.update(env)
        e["KIT_COORDINATOR"] = f"localhost:{port}"
        e["KIT_NUM_PROCESSES"] = str(num_processes)
        e["KIT_PROCESS_ID"] = str(pid)
        # same-machine ranks must ride loopback: Gloo's data plane picks
        # the default (external) interface from the hostname otherwise,
        # and sandboxed/firewalled hosts drop or throttle those local
        # connections intermittently ("Gloo context initialization
        # failed: Connect timeout", observed ~30% of 4-process runs)
        e.setdefault("GLOO_SOCKET_IFNAME", "lo")
        if cpu_devices_per_process:
            e["JAX_PLATFORMS"] = "cpu"
            # a TPU-plugin sitecustomize (e.g. axon) can force-register a
            # device backend that outranks JAX_PLATFORMS; drop its env
            # trigger so CPU workers are CPU-pure
            e.pop("PALLAS_AXON_POOL_IPS", None)
            e["XLA_FLAGS"] = (
                e.get("XLA_FLAGS", "") +
                f" --xla_force_host_platform_device_count="
                f"{cpu_devices_per_process}")
        procs.append(subprocess.Popen(
            [sys.executable] + list(argv), env=e,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    return procs


def init_from_env() -> bool:
    """Initialize from KIT_COORDINATOR/KIT_NUM_PROCESSES/KIT_PROCESS_ID
    (set by ``launch_local`` or a pod launcher).  Returns True if a
    multi-process group was joined."""
    import os
    n = int(os.environ.get("KIT_NUM_PROCESSES", "1"))
    if n <= 1:
        return False
    init_distributed(os.environ["KIT_COORDINATOR"], n,
                     int(os.environ["KIT_PROCESS_ID"]))
    return True
