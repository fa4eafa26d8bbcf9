"""Device mesh + sharding utilities (the framework's multi-chip layer).

The reference has NO distributed machinery (SURVEY.md §2.4 — a single
``cuda:0`` device and subprocess env workers over Pipes). This module is the
TPU-native replacement: env batch and rollout data are sharded over a ``dp``
mesh axis, per-agent actor/critic params and optimizer states are replicated,
and XLA/GSPMD inserts the ``psum``-style collectives for gradient reduction
over ICI. Multi-host pods extend the same mesh via ``jax.distributed``.

Usage:
    mesh = make_mesh()                           # all local devices
    state = shard_train_state(state, mesh, batch_size=n_rollout_threads)
    with jax.sharding.use_mesh(mesh): ...        # or rely on explicit putting
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def distributed_init(coordinator: Optional[str] = None, num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host init over DCN (no-op when single-process)."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(coordinator, num_processes, process_id)


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "dp") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "dp") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_by_leading_axis(tree, mesh: Mesh, batch_size: int, axis_name: str = "dp"):
    """device_put: leaves whose leading dim == batch_size are sharded over the
    mesh axis; everything else is replicated."""
    bs = batch_sharding(mesh, axis_name)
    rep = replicated(mesh)

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == batch_size:
            return jax.device_put(x, bs)
        return jax.device_put(x, rep)

    return jax.tree.map(put, tree)


def shard_train_state(state, mesh: Mesh, batch_size: int, axis_name: str = "dp"):
    """Shard a runner TrainState/OffPolicyState: env carry over dp, the rest
    replicated. Works for any NamedTuple state with a ``carry`` field."""
    rep = replicated(mesh)
    parts = {}
    for field in state._fields:
        val = getattr(state, field)
        if field in ("carry", "buffer"):
            parts[field] = shard_by_leading_axis(val, mesh, batch_size, axis_name)
        else:
            parts[field] = jax.device_put(val, rep)
    return type(state)(**parts)
