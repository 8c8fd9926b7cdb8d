"""Device mesh and sharding rules.

The reference is single-GPU (SURVEY.md §0); the rebuild parallelizes
training over a TPU slice (BASELINE config 5) via `jax.sharding`:

* mesh axes are named ``("data", "model")``: the batch shards over "data"
  (data parallelism — the primary strategy at ~7 M params), and the
  "model" axis optionally tensor-parallelizes the widest parameter
  matrices (SURVEY.md §2.6 seam, populated via
  `training.model_parallel`): the character embedding column-parallel
  over its feature dim and the post-net linear projection row-parallel
  over its input dim (Megatron-style — the 1025-wide output bias stays
  replicated, so no axis needs to divide the odd n_linear),
* every other parameter and the optimizer state mirror their parameter's
  sharding; XLA/GSPMD inserts the gradient all-reduce over "data" and the
  activation collectives over "model" on its own.

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
    model_parallel: int = 1,
) -> Mesh:
    """Build a ("data", "model") mesh of data_parallel x model_parallel
    devices (model axis defaults to 1 — pure DP)."""
    if devices is None:
        devices = jax.devices()
    n = data_parallel or len(devices) // model_parallel
    if n < 1 or n * model_parallel > len(devices):
        raise ValueError(
            f"make_mesh: {n} x {model_parallel} mesh needs "
            f"{max(n, 1) * model_parallel} devices, have {len(devices)}"
        )
    dev = np.asarray(devices[: n * model_parallel]).reshape(
        n, model_parallel
    )
    return Mesh(dev, ("data", "model"))


#: Tensor-parallel layout rules, matched as path suffixes against every
#: array in the train state (parameters AND the Adam moments, whose trees
#: mirror the parameter paths).  Column-parallel embedding (feature dim is
#: 256-divisible); row-parallel post-net projection (input dim 2*post_gru,
#: divisible; output 1025 stays whole so the odd width never constrains
#: the axis size).
TP_RULES: Sequence[tuple] = (
    (("embedding", "embedding"), P(None, "model")),
    (("linear_proj", "kernel"), P("model", None)),
)


def _path_names(path) -> tuple:
    return tuple(
        str(getattr(k, "key", getattr(k, "name", k))) for k in path
    )


def state_shardings(mesh: Mesh, tree: Any) -> Any:
    """Per-leaf NamedShardings for a train-state pytree: TP_RULES suffixes
    shard over "model", everything else is replicated.  `tree` may hold
    arrays or ShapeDtypeStructs (jax.eval_shape output)."""

    def leaf_sharding(path, leaf):
        names = _path_names(path)
        for suffix, spec in TP_RULES:
            if names[-len(suffix):] == tuple(suffix):
                return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(leaf_sharding, tree)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over "data"."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Device-put every array in a batch pytree with the batch axis sharded."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
