"""Partition rules and collective helpers.

TPU-native replacement for the reference's DDP/NCCL machinery (SURVEY §5.8):
- DP: batch over the mesh 'data' axis, params replicated (GSPMD inserts the
  gradient all-reduce over ICI);
- optional TP over the 'model' axis: the large GEMM weights (ViT MLP fc1/fc2,
  DINO-head hidden + prototype matrix) are column/row sharded;
- BatchNorm cross-replica stat sync (the reference's --dist-bn / SyncBN,
  train.py:298-301, 542-554, 928-945) as a pmean over the data axis — only
  relevant for BN-bearing models (DINOHead use_bn, ResNet trunk).
"""

from __future__ import annotations

from typing import Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpuwsi.core.mesh import DATA_AXIS, MODEL_AXIS


def tensor_parallel_rules(path, leaf) -> P:
    """Default TP partition rules for ViT+DINOHead parameter trees."""
    names = "/".join(str(getattr(p, "key", p)) for p in path)
    if getattr(leaf, "ndim", 0) == 2:
        if "fc1" in names or "mlp_0" in names or "mlp_1" in names:
            return P(None, MODEL_AXIS)  # column parallel
        if "fc2" in names or "mlp_out" in names:
            return P(MODEL_AXIS, None)  # row parallel
        if "last_layer" in names:
            return P(None, MODEL_AXIS)  # prototype matrix column parallel
    return P()


def shard_params(mesh: Mesh, params, rules: Callable = tensor_parallel_rules):
    """Place a parameter pytree on the mesh per the partition rules."""
    specs = jax.tree_util.tree_map_with_path(rules, params)
    shardings = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s),
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def replicate_params(mesh: Mesh, params):
    repl = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), params)


def sync_batch_stats(batch_stats):
    """Cross-replica BN stat averaging (SyncBN / --dist-bn 'reduce' parity).

    Inside pjit/GSPMD, batch stats computed from the sharded batch are already
    global means IF reductions span the batch axis; use this in shard_map
    contexts where the mean is per-shard.
    """
    return jax.tree_util.tree_map(
        lambda x: jax.lax.pmean(x, DATA_AXIS), batch_stats
    )
