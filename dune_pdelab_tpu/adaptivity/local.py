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


def adapt_local(space_old, x_old, marks, coarsen_marks=None):
    """Refine marked elements (2:1-balanced closure), optionally coarsen
    (sibling-complete merges), and transfer the solution by interpolation
    at the new nodal points (the adapt_grid backup/replay collapse,
    reference: dune/pdelab/adaptivity/adaptivity.hh:632).

    space_old.mesh may be a StructuredMesh (first adapt: converted) or an
    AdaptiveMesh. Refine marks take precedence over coarsen marks.
    Returns (space_new, x_new).
    """
    mesh = space_old.mesh
    if not isinstance(mesh, AdaptiveMesh):
        amesh = AdaptiveMesh(mesh.lower, mesh.upper, mesh.cells)
        # same element order (lexicographic) by construction
        mesh = amesh
    marks = np.asarray(marks, dtype=bool)
    if coarsen_marks is not None and np.any(coarsen_marks):
        cm = np.asarray(coarsen_marks, dtype=bool) & ~marks
        marked_centers = mesh.element_centers()[marks]
        mesh_c = mesh.coarsen(cm)
        space_c = FunctionSpace(mesh_c, space_old.fem, name=space_old.name)
        x_old = jnp.asarray(
            evaluate_fe(space_old, x_old, space_c.dof_coords()),
            jnp.asarray(x_old).dtype)
        space_old, mesh = space_c, mesh_c
        # refine marks carry over to the (identical — never coarsened)
        # leaves of the new mesh, located by element center
        marks = np.zeros(mesh.nelements, dtype=bool)
        if len(marked_centers):
            elems, _ = mesh.locate(marked_centers)
            marks[elems] = True
    mesh_new = mesh.refine(marks)
    space_new = FunctionSpace(mesh_new, space_old.fem, name=space_old.name)
    pts = space_new.dof_coords()
    vals = evaluate_fe(space_old, x_old, pts)
    return space_new, jnp.asarray(vals, x_old.dtype)


def p1_edge_jump_indicator(space, x, f=None):
    """Facet-jump a-posteriori indicator for P1 on simplex meshes (2D
    triangles and 3D tetrahedra):

        eta_K^2 = h_K^2 ||f||_K^2
                  + (1/2) sum_{F in dK, interior} h_F ||[grad u . n]||_F^2

    (the classical residual estimator; reference:
    dune/pdelab/localoperator/convectiondiffusionfem.hh:359 — for P1 the
    volume Laplacian vanishes, leaving the source + jump terms). Returns a
    per-element numpy array eta_K^2.
    """
    import itertools
    from dune_pdelab_tpu.mesh.simplex import SimplexMesh

    mesh = space.mesh
    assert isinstance(mesh, SimplexMesh) and mesh.dim in (2, 3)
    dim = mesh.dim
    xv = np.asarray(x, dtype=np.float64)
    cc = mesh.element_corner_coords()                   # (E, d+1, d)
    uv = xv[np.asarray(space.element_dofs)]             # (E, d+1) P1 nodal
    # constant gradient per cell: solve [p_i - p0]^T g = [u_i - u0]
    Edge = np.stack([cc[:, i] - cc[:, 0] for i in range(1, dim + 1)],
                    axis=1)                             # (E, d, d)
    du = np.stack([uv[:, i] - uv[:, 0] for i in range(1, dim + 1)], axis=1)
    grads = np.linalg.solve(Edge, du[..., None])[..., 0]   # (E, d)

    eta2 = np.zeros(mesh.nelements)
    itf = mesh.interior_faces()
    uniq_f, _, _ = mesh.faces()
    ge = uniq_f[itf["face"]]                            # (NI, d) vertex ids
    if dim == 2:
        tvec = mesh.vertices[ge[:, 1]] - mesh.vertices[ge[:, 0]]
        measure = np.linalg.norm(tvec, axis=1)          # edge length
        n_e = np.stack([tvec[:, 1], -tvec[:, 0]], axis=1) / measure[:, None]
        h_F = measure
    else:
        e1 = mesh.vertices[ge[:, 1]] - mesh.vertices[ge[:, 0]]
        e2 = mesh.vertices[ge[:, 2]] - mesh.vertices[ge[:, 0]]
        nvec = np.cross(e1, e2)
        dbl = np.linalg.norm(nvec, axis=1)
        measure = 0.5 * dbl                             # face area
        n_e = nvec / dbl[:, None]
        h_F = np.sqrt(measure)
    jump = np.einsum("id,id->i",
                     grads[itf["inside"]] - grads[itf["outside"]], n_e)
    contrib = 0.5 * h_F * jump**2 * measure     # ||const||_F^2 = |F| c^2
    np.add.at(eta2, itf["inside"], contrib)
    np.add.at(eta2, itf["outside"], contrib)
    if f is not None:
        centers = mesh.element_centers()
        vol = (np.abs(np.linalg.det(Edge))
               / (2.0 if dim == 2 else 6.0))
        hK2 = np.max([np.linalg.norm(cc[:, a] - cc[:, b], axis=1)
                      for a, b in itertools.combinations(range(dim + 1), 2)],
                     axis=0) ** 2
        fc = np.asarray(f(centers), dtype=np.float64)
        eta2 += hK2 * fc**2 * vol
    return eta2


def adapt_local_simplex(space_old, x_old, marks):
    """Bisect marked triangles (conforming closure) and transfer the
    solution by interpolation. P1 uses the exact nodal shortcut (new vertex
    = edge midpoint -> mean of endpoints); Pk evaluates the old FE function
    at the new nodal points via the recorded parent cells (children are
    geometrically nested, so the parent's inverse affine map locates every
    new node). The simplex counterpart of `adapt_local`; returns
    (space_new, x_new)."""
    from dune_pdelab_tpu.mesh.simplex import SimplexMesh

    mesh = space_old.mesh
    assert isinstance(mesh, SimplexMesh)
    mesh_new, (nv_old, mids, ends) = mesh.refine_bisection(marks)
    space_new = FunctionSpace(mesh_new, space_old.fem, name=space_old.name)
    xv = np.asarray(x_old, dtype=np.float64)
    if space_old.fem.degree == 1:
        xnew = np.zeros(space_new.ndofs)
        xnew[:nv_old] = xv
        # endpoints may reference earlier-created midpoints (3D multi-level
        # closure); midpoints are in creation order, so resolve
        # sequentially — vectorized per chain level (depth <= #closure
        # passes, tiny)
        mids = np.asarray(mids)
        if len(mids):
            for _ in range(64):
                upd = 0.5 * (xnew[ends[:, 0]] + xnew[ends[:, 1]])
                if np.array_equal(upd, xnew[mids]):
                    break
                xnew[mids] = upd
        return space_new, jnp.asarray(xnew, jnp.asarray(x_old).dtype)

    # Pk: evaluate old FE at every new nodal point through the parent map
    dim = mesh.dim
    d1 = dim + 1
    ed_new = np.asarray(space_new.element_dofs)
    own = np.empty(space_new.ndofs, dtype=np.int64)
    own[ed_new.reshape(-1)] = np.repeat(
        np.arange(mesh_new.nelements), ed_new.shape[1])
    pts = space_new.dof_coords()                     # (ndofs, dim)
    par = mesh_new.parent_cells[own]                 # old cell per new dof
    cc = mesh.element_corner_coords()[par]           # (ndofs, d1, dim)
    # assembler affine-map convention: xi_i moved by node (d1-1-i)
    J = np.stack([cc[:, d1 - 1 - i] - cc[:, 0] for i in range(dim)], axis=-1)
    xi = np.linalg.solve(J, (pts - cc[:, 0])[..., None])[..., 0]
    vals, _ = space_old.fem.tabulate(xi)             # (ndofs, nb) per-point
    ed_old = np.asarray(space_old.element_dofs)
    xnew = np.einsum("nb,nb->n", vals, xv[ed_old[par]])
    return space_new, jnp.asarray(xnew, jnp.asarray(x_old).dtype)
