"""Device mesh and sharding rules.

The reference is single-GPU (SURVEY.md §0); the rebuild data-parallels
training over a TPU slice (BASELINE config 5) via `jax.sharding`:

* mesh axes are named ``("data", "model")`` — only "data" is populated at
  this model scale (~7 M params), but the "model" axis is the documented seam
  for tensor-parallelising the post-net/embedding later (SURVEY.md §2.6),
* the batch is sharded over "data", parameters/optimizer state are
  replicated; XLA inserts the gradient all-reduce over ICI on its own.

No NCCL/MPI analog exists or is needed — collectives are emitted by XLA from
the sharding annotations (SURVEY.md §5.8).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data_parallel: Optional[int] = None,
) -> Mesh:
    """Build a ("data", "model") mesh; model axis size 1 (seam only)."""
    if devices is None:
        devices = jax.devices()
    n = data_parallel or len(devices)
    dev = np.asarray(devices[:n]).reshape(n, 1)
    return Mesh(dev, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over "data"."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Device-put every array in a batch pytree with the batch axis sharded."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
