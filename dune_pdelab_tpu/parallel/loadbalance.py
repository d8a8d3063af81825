"""Load balancing and redistribution over device meshes.

TPU-native analog of the reference's grid load balancing with attached DOF
data (reference: dune/pdelab/gridfunctionspace/loadbalance.hh:24-360 —
`loadBalance(grid, gfs, x...)` repartitions the grid and ships DOF vectors
along). Here the "grid" is static index arrays and the "ranks" are devices,
so redistribution decomposes into:

  * `partition_weighted` — contiguous slab partition balanced by a
    per-entity cost model (the LoadBalancer policy analog); feed its ranges
    to the sharded operators instead of equal-count splits when element
    costs are skewed (e.g. mixed materials, locally refined regions);
  * `rebalance` — rebuild a sharded operator (DofShardedStencil or
    NonoverlappingShardedGridOperator) on a different device set / mesh
    shape;
  * `redistribute` — move DOF vectors between two operators' layouts. When
    both are live jax arrays this is a device-to-device reshard
    (`jax.device_put` with the destination sharding; XLA moves shards over
    ICI), falling back to a host round-trip for layout changes with
    different padding.
"""
from __future__ import annotations

import numpy as np
import jax

from dune_pdelab_tpu.parallel.dofsharded import DofShardedStencil
from dune_pdelab_tpu.parallel.novlp import NonoverlappingShardedGridOperator


def partition_weighted(weights, ndev: int):
    """Contiguous ranges [(lo, hi), ...] of len ndev balancing sum(weights).

    Cut points sit at the total-cost quantiles (prefix-sum splitting), the
    static analog of the reference's load balancer for entity costs."""
    w = np.asarray(weights, dtype=np.float64)
    c = np.cumsum(w)
    total = float(c[-1]) if len(c) else 0.0
    # smallest prefix whose cost reaches each quantile target
    cuts = np.searchsorted(c, total * (np.arange(1, ndev) / ndev),
                           side="left") + 1
    bounds = np.concatenate([[0], np.clip(cuts, 0, len(w)), [len(w)]])
    bounds = np.maximum.accumulate(bounds)
    return [(int(bounds[i]), int(bounds[i + 1])) for i in range(ndev)]


def imbalance(ranges, weights):
    """max shard cost / mean shard cost (1.0 = perfectly balanced)."""
    w = np.asarray(weights, dtype=np.float64)
    costs = np.array([w[lo:hi].sum() for lo, hi in ranges])
    mean = costs.mean() if costs.size else 1.0
    return float(costs.max() / max(mean, 1e-300))


def rebalance(op, devices=None, mesh_shape=None):
    """Rebuild a sharded operator on a different device set / mesh shape."""
    if isinstance(op, DofShardedStencil):
        return DofShardedStencil(op.st, devices=devices,
                                 mesh_shape=mesh_shape)
    if isinstance(op, NonoverlappingShardedGridOperator):
        return NonoverlappingShardedGridOperator(op.go, devices=devices)
    raise TypeError(f"cannot rebalance {type(op).__name__}")


def redistribute(x, src, dst):
    """Move a sharded DOF vector from src's layout to dst's layout."""
    if isinstance(src, DofShardedStencil) and isinstance(
            dst, DofShardedStencil):
        if src.padded_shape == dst.padded_shape:
            # same lattice padding: pure device-to-device reshard
            return jax.device_put(x, dst.sharding)
        return dst.device_put(src.gather(x))
    if isinstance(src, NonoverlappingShardedGridOperator) and isinstance(
            dst, NonoverlappingShardedGridOperator):
        if src.B * src.ndev == dst.B * dst.ndev:
            return jax.device_put(x, dst.sharding)
        return dst.device_put(src.gather(x))
    raise TypeError("redistribute needs two operators of the same kind")
