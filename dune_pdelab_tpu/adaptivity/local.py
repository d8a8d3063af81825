"""Local adaptive refinement driver: estimate -> mark -> refine -> transfer.

TPU-native analog of the reference adaptivity cycle on locally refined
grids (reference: dune/pdelab/adaptivity/adaptivity.hh:632,672 adapt_grid =
backup -> grid.adapt() -> replay; hanging nodes from
constraints/hangingnode.hh). Static shapes: each adapt step produces a NEW
AdaptiveMesh / FunctionSpace (a new static element batch); solvers re-trace.
The backup/replay cycle collapses to one interpolation at the new nodal
points.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from dune_pdelab_tpu.mesh.adaptive import AdaptiveMesh
from dune_pdelab_tpu.space.space import FunctionSpace


def evaluate_fe(space, x, pts):
    """Evaluate the FE function (space, x) at physical points (n, dim).

    Works on AdaptiveMesh (leaf location by lattice walk) and uniform
    StructuredMesh. x must be hanging-consistent (solvers return it so).
    """
    mesh = space.mesh
    pts = np.atleast_2d(np.asarray(pts, dtype=np.float64))
    xv = np.asarray(x)
    dofs = np.asarray(space.element_dofs)
    if isinstance(mesh, AdaptiveMesh):
        elems, ref = mesh.locate(pts)
    else:
        rel = (pts - mesh.lower) / mesh.h
        emi = np.clip(np.floor(rel).astype(np.int64), 0,
                      np.array(mesh.cells) - 1)
        ref = rel - emi
        strides = np.ones(mesh.dim, dtype=np.int64)
        for d in range(1, mesh.dim):
            strides[d] = strides[d - 1] * mesh.cells[d - 1]
        elems = emi @ strides
    vals, _ = space.fem.tabulate(ref)            # (n, nb) at per-point ref
    # tabulate at distinct points gives (n, nb); combine per point
    return np.einsum("nb,nb->n", vals, xv[dofs[elems]])


def volume_residual_indicator(go, problem, x, time=0.0):
    """eta_K^2 = h_K^2 || f + div(A grad u) - b.grad u - c u ||_K^2.

    The volume part of the classical residual estimator (reference:
    dune/pdelab/localoperator/convectiondiffusionfem.hh:359) for per-element
    axis-aligned geometry (AdaptiveMesh or any cube mesh). Scalar A only.
    """
    space = go.space
    assert space.is_leaf
    mesh = space.mesh
    fem = space.fem
    dim = mesh.dim
    dtype = x.dtype
    if go.cg is not None and go.cg.has_affine:
        x = go.cg.prolong(x)

    vctx = go._volume_ctx(time, dtype)
    tab = vctx.tabs[0]
    u_loc = go.dof_maps[0].gather(x)                   # (E, nloc)
    uq = jnp.einsum("qb,eb->eq", tab.phi, u_loc)
    if tab.grad.shape[0] == 1:
        gu = jnp.einsum("qbd,eb->eqd", tab.grad[0], u_loc)
    else:
        gu = jnp.einsum("eqbd,eb->eqd", tab.grad, u_loc)

    if isinstance(mesh, AdaptiveMesh):
        h_e = mesh.element_sizes()                     # (E, dim)
    else:
        h_e = np.broadcast_to(mesh.h, (mesh.nelements, dim))
    H = fem.tabulate_hessian(go.vol_geo.qp_ref)        # (nqp, nb, d, d)
    Hdiag = np.einsum("qbdd->qbd", H)                  # second derivs per axis
    lap_basis = jnp.einsum(
        "qbd,ed->eqb", jnp.asarray(Hdiag, dtype),
        jnp.asarray(1.0 / h_e**2, dtype))              # (E, nqp, nb)
    lap = jnp.einsum("eqb,eb->eq", lap_basis, u_loc)

    A = jnp.asarray(problem.A(vctx.x))
    Ascal = A if A.ndim <= vctx.x.ndim - 1 else jnp.einsum("...ii", A) / dim
    b = jnp.asarray(problem.b(vctx.x))
    c = jnp.asarray(problem.c(vctx.x))
    f = jnp.asarray(problem.f(vctx.x))
    rvol = f + Ascal * lap - jnp.sum(
        jnp.broadcast_to(b, vctx.x.shape) * gu, axis=-1) - c * uq
    hK2 = jnp.asarray((h_e.max(axis=1) ** 2), dtype)   # (E,)
    return hK2 * jnp.sum(rvol**2 * vctx.factor, axis=-1)


def adapt_local(space_old, x_old, marks):
    """Refine marked elements (2:1-balanced closure) and transfer the
    solution by interpolation at the new nodal points.

    space_old.mesh may be a StructuredMesh (first adapt: converted) or an
    AdaptiveMesh. Returns (space_new, x_new).
    """
    mesh = space_old.mesh
    if not isinstance(mesh, AdaptiveMesh):
        amesh = AdaptiveMesh(mesh.lower, mesh.upper, mesh.cells)
        # same element order (lexicographic) by construction
        mesh = amesh
    mesh_new = mesh.refine(marks)
    space_new = FunctionSpace(mesh_new, space_old.fem, name=space_old.name)
    pts = space_new.dof_coords()
    vals = evaluate_fe(space_old, x_old, pts)
    return space_new, jnp.asarray(vals, x_old.dtype)
