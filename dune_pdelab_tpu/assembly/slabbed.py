"""Slab-chunked residual assembly for very large structured grids.

The batched volume sweep materializes (E, nqp, dim)-shaped intermediates;
at 100M+ DOFs a single sweep exceeds HBM. This module assembles the
residual in z-slabs: each slab is a translated sub-mesh problem (uniform
spacing makes every slab's kernel identical), with the physical coordinate
offset threaded through the traced `time` channel so ONE compiled slab
executable serves all slabs.

The analog of the reference's streaming element loop (reference:
dune/pdelab/gridoperator/default/assembler.hh:116 — elements are visited
one at a time, never materialized as a batch).
"""
from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from dune_pdelab_tpu.assembly.gridoperator import GridOperator
from dune_pdelab_tpu.mesh.structured import StructuredMesh
from dune_pdelab_tpu.space.space import FunctionSpace


class _ShiftedLop:
    """Wraps a volume-only LOP; shifts ctx.x by a traced offset carried in
    the `time` argument as (t, offset)."""

    def __init__(self, lop):
        self._lop = lop
        self._t = None
        self._off = None
        self.is_linear = getattr(lop, "is_linear", False)
        if hasattr(lop, "alpha_volume"):
            self.alpha_volume = self._alpha_volume
        if hasattr(lop, "lambda_volume"):
            self.lambda_volume = self._lambda_volume

    def quad_order(self, degree):
        return self._lop.quad_order(degree)

    def set_time(self, t_off):
        t, off = t_off
        new = _ShiftedLop(self._lop.set_time(t) if hasattr(
            self._lop, "set_time") else self._lop)
        new._t = t
        new._off = off
        return new

    def _shift(self, ctx):
        return dataclasses.replace(ctx, x=ctx.x + self._off, time=self._t)

    def _alpha_volume(self, ctx, u):
        return self._lop.alpha_volume(self._shift(ctx), u)

    def _lambda_volume(self, ctx):
        return self._lop.lambda_volume(self._shift(ctx))


def residual_slabbed(space, lop, cg, x, nslabs=8, time=0.0):
    """Constrained residual assembled in z-slabs; equals go.residual(x).

    Requirements: single-leaf C0 space on a uniform non-periodic
    structured cube mesh, volume-only LOP (boundary terms must vanish —
    the pure-Dirichlet case), no hanging nodes.
    """
    assert space.is_leaf and space.fem.continuity == "C0"
    mesh = space.mesh
    assert mesh.uniform and mesh.geometry_type == "cube"
    assert not mesh.periodic[-1]
    assert cg is None or not cg.has_affine
    k = space.fem.degree
    dims = space._dof_grid_dims
    dim = mesh.dim
    cz = mesh.cells[-1]
    slab = -(-cz // nslabs)

    plane = int(np.prod(dims[:-1]))
    xg = x.reshape(dims[-1], plane)
    rg = jnp.zeros_like(xg)

    cache = {}

    def slab_fn(dzc):
        if dzc in cache:
            return cache[dzc]
        cells_sub = tuple(mesh.cells[:-1]) + (dzc,)
        upper = mesh.lower + np.array(cells_sub) * mesh.h
        mesh_sub = StructuredMesh(mesh.lower, upper, cells_sub,
                                  periodic=mesh.periodic[:-1] + (False,))
        V_sub = FunctionSpace(mesh_sub, space.fem)
        go_sub = GridOperator(V_sub, _ShiftedLop(lop), skip_boundary=True)

        @jax.jit
        def fn(x_sub, off):
            return go_sub.residual_unconstrained(x_sub, time=(time, off))

        cache[dzc] = fn
        return fn

    for z0 in range(0, cz, slab):
        dzc = min(slab, cz - z0)
        fn = slab_fn(dzc)
        x_sub = xg[k * z0: k * (z0 + dzc) + 1].reshape(-1)
        off = jnp.zeros(dim, x.dtype).at[-1].set(z0 * mesh.h[-1])
        r_sub = fn(x_sub, off)
        rg = rg.at[k * z0: k * (z0 + dzc) + 1].add(
            r_sub.reshape(k * dzc + 1, plane))
    r = rg.reshape(-1)
    if cg is not None:
        r = jnp.where(cg.mask, 0.0, r)
    return r
