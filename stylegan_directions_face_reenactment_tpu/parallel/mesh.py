"""Device mesh + sharding utilities — the framework's scaling layer.

The reference has no distributed code at all (single hard-coded CUDA
device, SURVEY.md §2.13). This module supplies the TPU-native equivalent:
a `jax.sharding.Mesh` with a data-parallel axis, NamedSharding helpers, and
utilities to place batches/params. Workloads here are conv GANs ≤ ~30M
params — fully replicated params + batch sharding is the right mapping;
gradient reduction rides ICI via the psum XLA inserts for the replicated
out-sharding of grads.

Axis convention: ``dp`` (data parallel over batch/frames). The helpers are
written against arbitrary mesh shapes so a future ``fsdp`` axis slots in
without changing call sites.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "dp"


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


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard axis 0 (batch) over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _is_array(x) -> bool:
    return isinstance(x, (jax.Array, np.ndarray))


def shard_batch(mesh: Mesh, batch, axis_name: str = DATA_AXIS):
    """Place a pytree of arrays with axis-0 sharded over the mesh.
    Non-array leaves (static metadata ints/strings) pass through."""
    s = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, s) if _is_array(x) else x, batch)


def replicate(mesh: Mesh, tree):
    """Fully replicate a parameter pytree over the mesh (arrays only)."""
    s = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, s) if _is_array(x) else x, tree)


def data_parallel_jit(fn, mesh: Mesh, *, batch_argnums: Sequence[int] = (0,),
                      axis_name: str = DATA_AXIS, **jit_kwargs):
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
