"""Distributed geometric multigrid: V-cycle with halo-only smoother comm.

The reference reaches distributed multigrid through ISTL's parallel AMG
(reference: dune/pdelab/backend/istl/ovlpistlsolverbackend.hh AMG rows,
dune/pdelab/backend/istl/parallelhelper.hh ownership). The TPU translation
keeps the geometric hierarchy of linalg/multigrid.py and swaps each level's
operator application for the nonoverlapping block-sharded one
(parallel/novlp.py): Jacobi smoothing then costs two H-row `ppermute`s per
sweep instead of any global collective, and level transfers are static
gather/scatters that XLA shards over the same device mesh.

Coarse levels whose block size would be smaller than the stencil halo fall
back to the sequential operator — the coarse-grid-on-one-rank strategy every
distributed MG uses (coarse work is O(N / 8^levels) and not worth the
latency of distributing).
"""
from __future__ import annotations

import jax

from dune_pdelab_tpu.linalg.multigrid import GeometricMultigrid
from dune_pdelab_tpu.parallel.novlp import NonoverlappingShardedGridOperator


class ShardedGeometricMultigrid(GeometricMultigrid):
    """GeometricMultigrid whose fine-level operators run block-DOF-sharded.

    Drop-in for the sequential class (same preconditioner protocol); V-cycle
    math is identical, so preconditioned-CG iteration counts match the
    sequential GMG exactly.
    """

    def __init__(self, lop, mesh, fem, bctype=None, devices=None, **kw):
        super().__init__(lop, mesh, fem, bctype=bctype, **kw)
        devices = list(devices) if devices is not None else jax.devices()
        sharded = []
        for l, go in enumerate(self.gos):
            if l == self.nlevels - 1:
                sharded.append(go)   # coarsest: dense-LU path stays sequential
                continue
            try:
                sharded.append(NonoverlappingShardedGridOperator(
                    go, devices=devices))
            except ValueError:
                sharded.append(go)   # level too coarse for this device count
        self.gos = sharded
