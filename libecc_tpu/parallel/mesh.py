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
from jax.sharding import PartitionSpec as P_


def _pick_devices(n: int):
    """Default-backend devices, falling back to the host-CPU backend when
    the default has fewer than n (e.g. 1 real chip + virtual CPU devices
    from --xla_force_host_platform_device_count for sharding tests)."""
    devs = jax.devices()
    if n > len(devs):
        cpu = jax.devices("cpu")
        if len(cpu) >= n:
            devs = cpu
    if n > len(devs):
        raise ValueError(f"need {n} devices, have {len(devs)}")
    return devs[:n]


def make_mesh(n_devices: int | None = None, axis: str = "batch") -> Mesh:
    n = n_devices if n_devices is not None else len(jax.devices())
    return Mesh(np.array(_pick_devices(n)), (axis,))


def make_mesh_2d(n_hosts: int, chips_per_host: int) -> Mesh:
    """('dcn','ici') 2-D mesh for multi-host pods: batch shards over both,
    reductions ride ICI first."""
    devs = np.array(_pick_devices(n_hosts * chips_per_host))
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


def sharded_point_sum(mesh: Mesh, curve, P):
    """Batch point sum across a sharded lane axis: shard-local lane-tree
    reduction, then an explicit all_gather of the per-shard partial points
    over the mesh (ICI) and a final small tree — the TPU-native analog of
    Bos-Coster's final accumulation across a distributed batch
    (SURVEY §2.13 'psum for partial point sums'; point addition is not a
    psum-able monoid over raw coords, so partials are gathered instead).

    P: point batch with coords (K, N), N divisible by mesh size.
    Returns a replicated 1-point batch.
    """
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map
    from ..sig.batch_verify import point_tree_reduce
    from ..curves.group import pstack, punstack
    cls = type(P)
    axes = tuple(mesh.axis_names)
    spec_in = P_(None, None, axes if len(axes) > 1 else axes[0])

    def local(arr):
        local_pt = punstack(cls, arr)
        red = point_tree_reduce(curve, local_pt)      # (K, 1) per shard
        gathered = jax.lax.all_gather(
            pstack(red), axes[0] if len(axes) == 1 else axes,
            axis=2, tiled=True)                        # (nc, K, ndev)
        return pstack(point_tree_reduce(curve, punstack(cls, gathered)))

    # the gathered+reduced result is replicated by construction, but the
    # static replication checker can't see through the point adds
    try:
        fn = shard_map(local, mesh=mesh, in_specs=(spec_in,),
                       out_specs=P_(None, None, None), check_vma=False)
    except TypeError:   # older jax spells it check_rep
        fn = shard_map(local, mesh=mesh, in_specs=(spec_in,),
                       out_specs=P_(None, None, None), check_rep=False)
    return punstack(cls, fn(pstack(P)))
