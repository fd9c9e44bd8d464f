"""Device mesh + sharding helpers.

TPU-native data parallelism (SURVEY.md §2.3): the model is ResNet-18-scale
(~11M params), so the right decomposition is pure DP — batch sharded over a
1-D ``data`` mesh axis, parameters replicated, gradient all-reduce emitted
by XLA as a psum over ICI. No NCCL/MPI translation: ``jax.jit`` with
NamedSharding constraints is the whole communication layer. Tensor/pipeline
parallel axes are deliberately absent (documented non-goal, matching the
reference's scope).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host-side batch pytree with the leading dim sharded over data.

    Arrays whose leading dim does not divide the mesh are replicated
    (e.g. tiny debug batches on a big mesh) rather than erroring.
    """
    sh = batch_sharding(mesh)
    rep = replicated(mesh)
    n = mesh.size

    def place(x):
        ok = hasattr(x, "shape") and x.ndim > 0 and x.shape[0] % n == 0
        return jax.device_put(x, sh if ok else rep)

    return jax.tree_util.tree_map(place, batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params/state) across the mesh."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
