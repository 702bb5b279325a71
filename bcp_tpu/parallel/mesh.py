"""Device-mesh helpers for data-parallel scaling.

The reference's only multi-device story is single-process
``nn.DataParallel`` on two GPUs (`pancreas/dataloaders.py:12-19`). The
TPU-native equivalent (SURVEY.md C28/C29): a 1-D ``jax.sharding.Mesh`` over
the chips with batches sharded on the leading axis and parameters
replicated. The jitted train steps need no changes — XLA partitions the
program and inserts the gradient ``all-reduce`` over ICI automatically.
Mesh axes beyond 'data' are reserved for future model sharding; at these
model sizes (V-Net ~9.4M params) DP is the right decomposition.

Scaling semantics: global batch grows with the mesh (per-device sub-batch
stays the reference's); the two-stream labeled/unlabeled split survives
shardings because the feed keeps each stream a separate array.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def data_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Place a host batch dict with the leading axis sharded over the
    mesh. Every stream array's batch dim must divide the mesh size."""
    sharding = data_sharding(mesh, axis_name)
    return jax.device_put(batch, sharding)


def replicate_state(state, mesh: Mesh):
    """Replicate the TrainState pytree across the mesh (params live on
    every chip; XLA all-reduces grads under jit)."""
    sharding = replicated_sharding(mesh)
    return jax.device_put(state, sharding)
