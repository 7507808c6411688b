"""Device mesh and sharding layout for data-parallel (and future tensor-
parallel) training.

The reference is strictly single-device (SURVEY.md §2.7: no distributed
code of any kind). TPU-native scaling here follows the standard JAX recipe:
build a `jax.sharding.Mesh`, annotate batch arrays with
``P('data', ...)`` and parameters as replicated, and let XLA insert the
gradient all-reduce over ICI when the jitted train step consumes sharded
inputs and produces replicated outputs — no hand-written collectives.

At ~1M generator params, data parallelism is the axis that pays; the
'model' axis carries Megatron-style tensor-parallel parameter layouts
(parallel/partition.py) so larger models scale without a mesh migration —
a (d, m) mesh step is numerically identical to a (d*m, 1) step
(tests/test_tp.py).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = -1, model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Create a ('data', 'model') mesh. ``data=-1`` uses all devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} needs {data * model} devices, "
                         f"have {n}")
    grid = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(grid, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis data sharding for batch arrays."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place every batch array on the mesh, sharded over 'data'."""
    sharding = batch_sharding(mesh)
    return {k: jax.device_put(v, sharding) if hasattr(v, "shape") and getattr(v, "ndim", 0) > 0 else v
            for k, v in batch.items()}


def replicate_tree(tree: Any, mesh: Mesh) -> Any:
    """Replicate a parameter/optimizer pytree across the mesh."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
