"""Sharded assembly entry point + shared context builders.

History: round 1 shipped an overlapping element-sharded scheme here that
kept DOF vectors replicated and reduced residual partials with a
full-vector `lax.psum` per apply — correct, but its communication volume
was O(N) per operator application instead of O(halo). Round 3 retired that
path: `ShardedGridOperator` now IS the window-sharded operator
(parallel/windowed.py), whose communication per apply is a handful of
halo-sized `lax.ppermute`s (verified by jaxpr inspection in
tests/test_windowed.py). The name is kept as the package's main sharded
entry point.

`ShardedContextMixin` holds the uniform-mesh context builders shared with
the lattice-specialized nonoverlapping path (parallel/novlp.py).

Reference mapping: overlapping backends dune/pdelab/backend/istl/
ovlpistlsolverbackend.hh; border accumulation gridoperator/common/
borderdofexchanger.hh:498; data handles gridfunctionspace/
genericdatahandle.hh:130.
"""
from __future__ import annotations

import jax.numpy as jnp

from dune_pdelab_tpu.parallel.windowed import WindowShardedGridOperator


class ShardedContextMixin:
    """Uniform-mesh context builders for sharded assembly (used by the
    lattice nonoverlapping path). Subclasses provide `self.go`."""

    def _vol_ctx(self, origins_local, time, dtype):
        go = self.go
        from dune_pdelab_tpu.ops.base import VolumeContext
        vg = go.vol_geo
        x = origins_local[:, None, :].astype(dtype) + jnp.asarray(
            vg.qp_phys_offset, dtype)[None]
        return VolumeContext(
            weights=jnp.asarray(vg.weights, dtype),
            x=x,
            factor=jnp.asarray(vg.factor, dtype),
            tabs=go._leaf_tabs(go._vol_tabs, dtype),
            jac_inv_T=jnp.asarray(vg.jac_inv_T, dtype),
            cell_volume=jnp.asarray(vg.cell_volume, dtype),
            time=time,
        )

    def _face_ctx(self, g, x_local, time, dtype):
        from dune_pdelab_tpu.ops.base import FaceContext
        go = self.go
        return FaceContext(
            weights=jnp.asarray(g.weights, dtype),
            x=x_local.astype(dtype),
            factor=jnp.asarray(g.factor, dtype),
            normal=jnp.asarray(g.normal, dtype),
            tabs=go._leaf_tabs(g.tabs_in, dtype),
            h_inside=jnp.asarray(g.h_in, dtype),
            time=time,
        )

    def _skel_ctx(self, g, x_local, time, dtype):
        from dune_pdelab_tpu.ops.base import SkeletonContext
        go = self.go
        return SkeletonContext(
            weights=jnp.asarray(g.weights, dtype),
            x=x_local.astype(dtype),
            factor=jnp.asarray(g.factor, dtype),
            normal=jnp.asarray(g.normal, dtype),
            tabs_in=go._leaf_tabs(g.tabs_in, dtype),
            tabs_out=go._leaf_tabs(g.tabs_out, dtype),
            h_inside=jnp.asarray(g.h_in, dtype),
            h_outside=jnp.asarray(g.h_out, dtype),
            time=time,
        )

    def jacobian_diagonal(self, x, time=0.0):
        """Delegates to the sequential operator (setup-phase probing)."""
        return self.go.jacobian_diagonal(x, time)

    @property
    def space(self):
        return self.go.space

    @property
    def lop(self):
        return self.go.lop


class ShardedGridOperator(WindowShardedGridOperator):
    """The package's default sharded GridOperator (window-sharded).

    API: residual / jacobian_apply (flat (N,), trace-safe) and the
    padded-sharded variants for Krylov loops. jacobian_diagonal delegates
    to the sequential operator (a setup-phase probing quantity)."""

    def jacobian_diagonal(self, x, time=0.0):
        return self.go.jacobian_diagonal(x, time)
