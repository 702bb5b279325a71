"""Device-mesh helpers: data-parallel and spatially-partitioned scaling.

The reference's only multi-device story is single-process
``nn.DataParallel`` on two GPUs (`pancreas/dataloaders.py:12-19`). The
TPU-native equivalents (SURVEY.md C28/C29):

- **Data parallel** (``num_devices``): a 1-D ``jax.sharding.Mesh`` over
  the chips with batches sharded on the leading axis and parameters
  replicated. The jitted train steps need no changes — XLA partitions
  the program and inserts the gradient ``all-reduce`` over ICI
  automatically.
- **Spatial partitioning** (``sp_devices`` > 1): a 2-D
  ``('data', 'space')`` mesh where every volume additionally shards
  along its leading spatial axis (x). XLA's SPMD partitioner inserts
  the halo exchanges the 3^3 convolutions need at shard boundaries and
  ``psum``s the batch-norm statistics — nothing in the model or step
  changes. This is how a volume too large for one chip's HBM trains:
  at these model sizes (V-Net ~9.4M params) the *activations*, not the
  parameters, are the memory bound, and they scale with patch volume.

Scaling semantics: global batch grows with the data axis only (the
per-``data``-shard sub-batch stays the reference's); the two-stream
labeled/unlabeled split survives shardings because the feed keeps each
stream a separate array. The spatial axis wants the patch's x extent
divisible by ``sp`` at every V-Net level (x/16 at the bottom) for
halo-exchange efficiency; XLA stays *correct* (it pads/replicates small
dims) but pays extra collectives otherwise.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SPATIAL_AXIS = "space"


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "data",
              sp: int = 1,
              devices=None) -> Mesh:
    """1-D ``(data,)`` mesh, or 2-D ``(data, space)`` when ``sp`` > 1.

    ``n_devices`` is the TOTAL device count (or None = all visible);
    ``sp`` must divide it — the data axis gets ``n_devices // sp``.
    ``devices`` overrides the device list (e.g. ``jax.devices('cpu')``
    for a simulated host mesh when another backend is the default).
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    sp = max(int(sp), 1)
    if sp == 1:
        return Mesh(np.asarray(devices), (axis_name,))
    if len(devices) % sp:
        raise ValueError(
            f"sp_devices={sp} must divide the mesh size {len(devices)}")
    grid = np.asarray(devices).reshape(len(devices) // sp, sp)
    return Mesh(grid, (axis_name, SPATIAL_AXIS))


def flat_mesh(mesh: Mesh, axis_name: str = "data") -> Mesh:
    """The same devices as a 1-D mesh (eval shards window *batches*, so
    it wants every chip on one axis regardless of the train mesh)."""
    if len(mesh.axis_names) == 1:
        return mesh
    return Mesh(np.asarray(mesh.devices).reshape(-1), (axis_name,))


def data_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis across the mesh's data axis."""
    return NamedSharding(mesh, P(axis_name))


def stream_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Sharding for feed stream arrays ``(B, X, ...)``: batch on the data
    axis and, on a 2-D mesh, the leading spatial axis on ``space``."""
    if SPATIAL_AXIS in mesh.axis_names:
        return NamedSharding(mesh, P(axis_name, SPATIAL_AXIS))
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Place a host batch dict with the leading axis sharded over the
    data axis (and x over ``space`` on a 2-D mesh). Every stream array's
    batch dim must divide the data-axis size, and its x extent the
    space-axis size."""
    return jax.device_put(batch, stream_sharding(mesh, axis_name))


def replicate_state(state, mesh: Mesh):
    """Replicate the TrainState pytree across the mesh (params live on
    every chip; XLA all-reduces grads under jit)."""
    sharding = replicated_sharding(mesh)
    return jax.device_put(state, sharding)
