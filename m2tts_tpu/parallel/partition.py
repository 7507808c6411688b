"""Tensor-parallel parameter partitioning over the mesh's 'model' axis.

Megatron-style layout for the transformer blocks (column-split the fused
QKV and FFN-in projections, row-split the output projections) expressed as
PartitionSpec rules on parameter paths. XLA's SPMD partitioner propagates
these through the jitted train/serve graphs and inserts the ICI
collectives itself — no hand-written all-reduces (the standard JAX
recipe; reference has no distributed code at all, SURVEY.md §2.7).

On a mesh with model=1 every rule degenerates to replication, so the
trainers apply these specs unconditionally; flipping to TP is purely a
mesh-shape change (``system.mesh.model=2``). Conv stacks (duration
predictor, vocoder, discriminator) stay replicated: their channel counts
are far below one chip's MXU tile, so splitting them would only buy
latency from collectives.
"""

from __future__ import annotations

import re
from typing import Any, List, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.tree_util import keystr, tree_flatten_with_path, tree_unflatten

# (path regex, spec) — first match wins; default is replicated.
TP_RULES: List[Tuple[str, P]] = [
    (r"attn.*qkv.*kernel", P(None, "model")),   # column: heads split
    (r"attn.*out.*kernel", P("model", None)),   # row: reduce over model
    (r"ffn.*fc1.*kernel", P(None, "model")),    # column
    (r"ffn.*fc1.*bias", P("model")),
    (r"ffn.*fc2.*kernel", P("model", None)),    # row
]


def spec_for_path(path_str: str) -> P:
    for pattern, spec in TP_RULES:
        if re.search(pattern, path_str):
            return spec
    return P()


def partition_specs(tree: Any) -> Any:
    """Pytree of PartitionSpec mirroring ``tree`` (params or grads)."""
    leaves, treedef = tree_flatten_with_path(tree)
    specs = [spec_for_path(keystr(path)) for path, _ in leaves]
    return tree_unflatten(treedef, specs)


def tree_shardings(tree: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree for ``tree``: TP rules on matching param
    paths, replication everywhere else (optimizer scalars, counters)."""
    leaves, treedef = tree_flatten_with_path(tree)
    out = []
    for path, leaf in leaves:
        spec = spec_for_path(keystr(path))
        # optimizer state mirrors the param tree (mu/nu of adamw), so the
        # same path rules hit; scalars and mismatched ranks replicate
        if len(spec) > getattr(leaf, "ndim", 0):
            spec = P()
        out.append(NamedSharding(mesh, spec))
    return tree_unflatten(treedef, out)


def shard_tree(tree: Any, mesh: Mesh) -> Any:
    """device_put ``tree`` with TP shardings (replicated where no rule)."""
    shardings = tree_shardings(tree, mesh)
    return jax.tree_util.tree_map(jax.device_put, tree, shardings)
