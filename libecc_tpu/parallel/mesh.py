"""Device-mesh scaling: shard the signature batch across chips.

TPU-native replacement for the reference's only scale mechanisms (OpenMP
test sharding + sequential Bos-Coster batching; SURVEY §2.13): the batch
(lane) axis of every limb tensor is sharded over a 1-D or 2-D
jax.sharding.Mesh. All field/curve ops are elementwise or limb-axis-local,
so GSPMD partitions them with zero communication; only final reductions
(batch-verify accept counts, MSM partial point sums) emit psums over ICI.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "batch") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def make_mesh_2d(n_hosts: int, chips_per_host: int) -> Mesh:
    """('dcn','ici') 2-D mesh for multi-host pods: batch shards over both,
    reductions ride ICI first."""
    devs = np.array(jax.devices()[: n_hosts * chips_per_host])
    return Mesh(devs.reshape(n_hosts, chips_per_host), ("dcn", "ici"))


def batch_sharding(mesh: Mesh, ndim: int, batch_axes=None) -> NamedSharding:
    """Sharding for a limb tensor (K, ..., N): batch (last) dim over all
    mesh axes, limb axes replicated."""
    if batch_axes is None:
        batch_axes = tuple(mesh.axis_names) if len(mesh.axis_names) > 1 \
            else mesh.axis_names[0]
    spec = [None] * (ndim - 1) + [batch_axes]
    return NamedSharding(mesh, P(*spec))


def shard_batch(mesh: Mesh, tree):
    """Device_put every array in the pytree with batch-dim sharding."""
    return jax.tree.map(
        lambda a: jax.device_put(a, batch_sharding(mesh, a.ndim)), tree)
