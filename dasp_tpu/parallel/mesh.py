"""Device mesh helpers for data/sequence-parallel training.

The reference is single-device (SURVEY.md §2: no torch.distributed, no
collectives). On TPU, scaling is first-class: a ``jax.sharding.Mesh``
with a data-parallel axis ("dp") and a sequence-parallel axis ("sp").
Batches are sharded over dp (gradients psum over ICI automatically under
jit); long-audio FIR convolution shards the time axis over sp with halo
exchange (see parallel.sharded).

All helpers work identically on a real TPU pod slice and on a host-level
virtual mesh (XLA_FLAGS=--xla_force_host_platform_device_count=N).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding", "shard_batch", "replicate"]


def make_mesh(
    shape: Optional[Tuple[int, int]] = None,
    axis_names: Tuple[str, str] = ("dp", "sp"),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Create a (dp, sp) mesh over the available devices.

    Args:
        shape: (dp_size, sp_size). Default: all devices on dp, sp=1.
        axis_names: mesh axis names; ("dp", "sp") by convention.
        devices: devices to use (default ``jax.devices()``).

    Returns:
        A 2-axis ``jax.sharding.Mesh``.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    dp, sp = shape
    if dp < 1 or sp < 1:
        raise ValueError(f"mesh shape {shape} must have positive axis sizes")
    if dp * sp != n:
        raise ValueError(
            f"mesh shape (dp={dp}, sp={sp}) needs dp*sp={dp * sp} devices but "
            f"{n} were given; pass shape=({n}, 1) / ({n // sp if sp and n % sp == 0 else '?'}, {sp}) "
            f"or a matching `devices=` subset (e.g. jax.devices()[:{dp * sp}])"
        )
    dev_array = np.asarray(devices).reshape(dp, sp)
    return Mesh(dev_array, axis_names)


def batch_sharding(mesh: Mesh, batch_axis: int = 0) -> NamedSharding:
    """NamedSharding that splits axis 0 over the mesh's dp axis."""
    spec = [None] * (batch_axis + 1)
    spec[batch_axis] = "dp"
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(x, mesh: Mesh):
    """Place a (batch, ...) array with the batch axis split over dp.

    Raises ValueError (instead of an opaque XLA sharding error) when the
    batch does not divide evenly over the dp axis.
    """
    dp = mesh.shape["dp"]
    if x.shape[0] % dp != 0:
        raise ValueError(
            f"batch size {x.shape[0]} is not divisible by the mesh's dp axis "
            f"({dp} devices); pad the batch to a multiple of {dp} or use a "
            f"mesh with dp dividing the batch"
        )
    return jax.device_put(x, batch_sharding(mesh))


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (e.g. model params) over the whole mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)
