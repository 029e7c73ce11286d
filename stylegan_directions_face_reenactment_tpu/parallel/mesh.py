"""Device mesh + sharding utilities — the framework's scaling layer.

The reference has no distributed code at all (single hard-coded CUDA
device, SURVEY.md §2.13). This module supplies the TPU-native equivalent:
a `jax.sharding.Mesh` with a data-parallel axis, NamedSharding helpers, and
utilities to place batches/params. Workloads here are conv GANs ≤ ~30M
params — fully replicated params + batch sharding is the right mapping;
gradient reduction rides ICI via the psum XLA inserts for the replicated
out-sharding of grads.

Axis convention: ``dp`` (data parallel over batch/frames) on a 1-D mesh;
multi-host pods add an outer ``dcn`` axis (`make_hybrid_mesh`) so the batch
shards over hosts×chips while the only cross-host collective is the psum of
the A-matrix gradients (~61k params — a trivial DCN payload; everything
bandwidth-heavy stays on ICI within a slice). The helpers are written
against arbitrary mesh shapes: batch placement shards axis 0 over ALL mesh
axes, so a hybrid mesh needs no call-site changes.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "dp"
DCN_AXIS = "dcn"


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence[Any]] = None,
              axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over the available devices."""
    if devices is None:
        # honor an explicit jax_default_device routing (e.g. tests pin the
        # virtual CPU devices while a TPU plugin is also registered)
        dflt = jax.config.jax_default_device
        devices = (jax.devices(dflt.platform) if dflt is not None
                   else jax.devices())
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devices)} device(s) are available")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def make_hybrid_mesh(n_devices: Optional[int] = None,
                     dcn_slices: int = 1,
                     devices: Optional[Sequence[Any]] = None,
                     axis_names: Sequence[str] = (DCN_AXIS, DATA_AXIS)) -> Mesh:
    """2-D ``(dcn, dp)`` mesh for multi-host pods: the outer axis crosses the
    data-center network (one row per host/slice), the inner axis rides ICI.

    Batch placement (`shard_batch`) shards axis 0 over BOTH axes, so this is
    still pure data parallelism — but the XLA partitioner now reduces
    gradients hierarchically (ICI psum within a slice, then a DCN all-reduce
    of the already-reduced per-slice values), which is the right collective
    shape when the inter-host link is ~10× slower than ICI. For this
    framework's workloads only the A-matrix gradients (~61k params) ever
    cross DCN.

    In a real multi-process run (`jax.process_count() > 1`, after
    `distributed_init`) the device grid comes from
    `mesh_utils.create_hybrid_device_mesh`, which groups each process's
    local devices into one DCN row. Single-process (tests, virtual CPU
    meshes) simply folds the flat device list into a (dcn, ici) grid.
    """
    if dcn_slices < 1:
        raise ValueError(f"dcn_slices must be >= 1, got {dcn_slices}")
    if devices is None and jax.process_count() > 1:
        n_proc = jax.process_count()
        if dcn_slices != n_proc:
            raise ValueError(
                f"multi-process hybrid mesh: dcn_slices ({dcn_slices}) must "
                f"equal the process count ({n_proc}) — one DCN row per "
                "host/slice (grouping multiple hosts per row is not "
                "supported)")
        if n_devices is not None and n_devices != len(jax.devices()):
            raise ValueError(
                f"n_devices ({n_devices}) cannot restrict a multi-process "
                f"mesh — all {len(jax.devices())} devices participate")
        from jax.experimental import mesh_utils
        n_local = len(jax.local_devices())
        grid = mesh_utils.create_hybrid_device_mesh(
            (1, n_local), (dcn_slices, 1),
            devices=jax.devices(), allow_split_physical_axes=True)
        return Mesh(grid.reshape(dcn_slices, -1), tuple(axis_names))
    if devices is None:
        dflt = jax.config.jax_default_device
        devices = (jax.devices(dflt.platform) if dflt is not None
                   else jax.devices())
    n = len(devices) if n_devices is None else n_devices
    if n > len(devices):
        raise ValueError(f"requested a {n}-device mesh but only "
                         f"{len(devices)} device(s) are available")
    if n % dcn_slices != 0:
        raise ValueError(f"dcn_slices {dcn_slices} must divide the device "
                         f"count {n}")
    grid = np.asarray(list(devices[:n])).reshape(dcn_slices, n // dcn_slices)
    return Mesh(grid, tuple(axis_names))


_DIST_INITIALIZED = False


def distributed_init(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialize JAX multi-process mode for a multi-host pod (DCN).

    MUST run before any JAX call that initializes the XLA backend
    (`jax.distributed.initialize` refuses otherwise) — the CLIs call this
    at the very top of main(), before any model load or device op.

    Arguments fall back to the standard ``JAX_COORDINATOR_ADDRESS`` /
    ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID`` environment variables (and
    on Cloud TPU VMs `jax.distributed.initialize()` autodetects all three).
    Returns True if multi-process mode is active after the call. With
    nothing configured it touches no JAX state at all (so a later
    backend init still sees pristine flags) and returns False."""
    global _DIST_INITIALIZED
    coordinator_address = (coordinator_address
                           or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    env_pid = os.environ.get("JAX_PROCESS_ID")
    num_processes = (num_processes if num_processes is not None
                     else int(env_np) if env_np else None)
    process_id = (process_id if process_id is not None
                  else int(env_pid) if env_pid else None)
    if coordinator_address is None and num_processes is None:
        return _DIST_INITIALIZED  # nothing configured: strict no-op
    if _DIST_INITIALIZED:
        return True
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    _DIST_INITIALIZED = True
    return True


def batch_sharding(mesh: Mesh, axis_name: Optional[str] = None) -> NamedSharding:
    """Shard axis 0 (batch) over the mesh — over ALL mesh axes by default
    (dp on a 1-D mesh, (dcn, dp) on a hybrid mesh)."""
    spec = tuple(mesh.axis_names) if axis_name is None else axis_name
    return NamedSharding(mesh, P(spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _is_array(x) -> bool:
    return isinstance(x, (jax.Array, np.ndarray))


def shard_batch(mesh: Mesh, batch, axis_name: Optional[str] = None):
    """Place a pytree of arrays with axis-0 sharded over the mesh (all mesh
    axes). Non-array leaves (static metadata ints/strings) pass through.

    Multi-process (pod) semantics: every process passes the SAME full
    global batch (all hosts walk the same dataset tree with the same seed,
    so the host-side batch construction is replicated computation); each
    process then contributes only its own contiguous row-block — process p
    owns DCN row p of the hybrid mesh, and row-major batch sharding gives
    it rows [p·B/P, (p+1)·B/P) — assembled into the global array without
    any cross-host transfer. Single-process: a plain device_put."""
    s = batch_sharding(mesh, axis_name)
    if jax.process_count() > 1:
        p, n_proc = jax.process_index(), jax.process_count()

        def place(x):
            if not _is_array(x):
                return x
            x = np.asarray(x)
            if x.shape[0] % n_proc != 0:
                raise ValueError(
                    f"global batch {x.shape[0]} must divide the process "
                    f"count {n_proc}")
            per = x.shape[0] // n_proc
            local = x[p * per:(p + 1) * per]
            return jax.make_array_from_process_local_data(
                s, local, global_shape=x.shape)
        return jax.tree_util.tree_map(place, batch)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, s) if _is_array(x) else x, batch)


def replicate(mesh: Mesh, tree):
    """Fully replicate a parameter pytree over the mesh (arrays only).
    Multi-process: every process passes the same host values (replicated
    computation — same checkpoints / same init seed) and contributes its
    local copies, assembled without cross-host transfer."""
    s = replicated(mesh)
    if jax.process_count() > 1:
        def place(x):
            if not _is_array(x):
                return x
            x = np.asarray(x)
            return jax.make_array_from_process_local_data(
                s, x, global_shape=x.shape)
        return jax.tree_util.tree_map(place, tree)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, s) if _is_array(x) else x, tree)


def data_parallel_jit(fn, mesh: Mesh, *, batch_argnums: Sequence[int] = (0,),
                      axis_name: Optional[str] = None, **jit_kwargs):
    """jit ``fn`` with batch args sharded on axis 0 and everything else
    replicated; outputs left to the compiler (grad trees come back
    replicated, implying an ICI psum)."""
    bs = batch_sharding(mesh, axis_name)
    rep = replicated(mesh)

    def in_sharding_for(i):
        return bs if i in batch_argnums else rep

    def wrapped(*args):
        placed = [jax.device_put(
            a, in_sharding_for(i)) if isinstance(a, jax.Array) else
            jax.tree_util.tree_map(lambda x: jax.device_put(x, in_sharding_for(i)), a)
            for i, a in enumerate(args)]
        return jax.jit(fn, **jit_kwargs)(*placed)

    return wrapped


def pad_to_multiple(x: np.ndarray, multiple: int, axis: int = 0):
    """Pad a host batch so it divides the mesh; returns (padded, real_len)."""
    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x, n
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    return np.pad(x, pad, mode="edge"), n
