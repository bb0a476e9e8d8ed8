"""Device mesh + sharding layer.

The reference has no parallelism of any kind (SURVEY.md section 2.9 — single
process, single device, no collectives).  Here data parallelism over an ICI
mesh is the default execution mode: the batch axis is sharded over the
`data` mesh axis, parameters and optimizer state are replicated, and the
gradient all-reduce is the XLA psum implied by jit-with-shardings — no
explicit communication code, no NCCL analogue.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(num_devices: Optional[int] = None,
                axis_name: str = "data",
                devices: Optional[Sequence] = None) -> Mesh:
    """1D mesh over the data axis (v5e-8 slice or CPU virtual devices)."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        if len(devices) < num_devices:
            # refuse to silently truncate: an "8-device mesh" quietly
            # running on 1 device invalidates every scaling measurement
            # and hides missing xla_force_host_platform_device_count
            raise ValueError(
                f"requested a {num_devices}-device mesh but only "
                f"{len(devices)} device(s) are available "
                f"({jax.default_backend()} backend)")
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(axis_name))

def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, axis_name: str = "data"):
    """Device-put a pytree of batch-leading arrays with the batch dim sharded."""
    s = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, s), tree)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params / opt state) across the mesh."""
    s = replicated(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, s), tree)
