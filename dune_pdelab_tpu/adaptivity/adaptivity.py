"""A-posteriori error estimation, marking, and solution transfer.

TPU-native analog of the reference adaptivity stack (reference:
dune/pdelab/adaptivity/adaptivity.hh — error_fraction :863,
element_fraction :915, mark_grid :1029, adapt_grid :632 backup/replay;
residual estimator embedded in the kernel library, reference:
dune/pdelab/localoperator/convectiondiffusionfem.hh:359 and
errorindicatordg.hh).

Structured meshes fight XLA's static shapes on true local refinement, so the
adaptation *act* is re-setup at a new (uniform) resolution with conforming
interpolation transfer (the backup -> adapt -> replay cycle collapses to one
prolongation); the estimator and marking machinery match the reference so
driver loops read the same.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from dune_pdelab_tpu.ops.convectiondiffusion import apply_tensor


def residual_estimator_convectiondiffusion(go, problem, x, time=0.0):
    """Classical residual-type eta^2 per element for -∇·(A∇u) + b·∇u + cu = f.

    eta_K^2 = h_K^2 ||f + ∇·(A∇u_h) - b·∇u_h - c u_h||_K^2
              + 1/2 h_F sum_faces ||[A ∇u_h · n]||_F^2
(reference: convectiondiffusionfem.hh:359 alpha_volume of the estimator).
    Requires a single-leaf Qk space on a uniform mesh.
    """
    space = go.space
    assert space.is_leaf
    mesh = space.mesh
    fem = space.fem
    dim = mesh.dim
    vg = go.vol_geo
    dtype = x.dtype

    # --- volume residual with second derivatives ---------------------------
    qp = vg.qp_ref
    H = fem.tabulate_hessian(qp)                       # (nqp, nb, d, d)
    h = mesh.h
    Hphys = H / (h[None, None, :, None] * h[None, None, None, :])
    u_loc = go.dof_maps[0].gather(x)                   # (E, nloc)
    vctx = go._volume_ctx(time, dtype)
    tab = vctx.tabs[0]
    uq = jnp.einsum("qb,eb->eq", tab.phi, u_loc)
    gu = jnp.einsum("qbd,eb->eqd", tab.grad[0], u_loc) if tab.grad.shape[0] == 1 \
        else jnp.einsum("eqbd,eb->eqd", tab.grad, u_loc)
    Htrace = np.einsum("qbdd->qb", Hphys)              # laplacian of each basis
    lap = jnp.einsum("qb,eb->eq", jnp.asarray(Htrace, dtype), u_loc)
    # note: assumes scalar/constant-per-point A for the ∇·(A∇u) term
    A = jnp.asarray(problem.A(vctx.x))
    Ascal = A if A.ndim <= vctx.x.ndim - 1 else jnp.einsum("...ii", A) / dim
    b = jnp.asarray(problem.b(vctx.x))
    c = jnp.asarray(problem.c(vctx.x))
    f = jnp.asarray(problem.f(vctx.x))
    rvol = f + Ascal * lap - jnp.sum(jnp.broadcast_to(b, vctx.x.shape) * gu,
                                     axis=-1) - c * uq
    hK = float(np.max(h))
    eta2 = hK**2 * jnp.sum(rvol**2 * vctx.factor, axis=-1)
    eta2 = jnp.broadcast_to(eta2, (mesh.nelements,))

    # --- face jumps ---------------------------------------------------------
    itf = mesh.interior_faces()
    from dune_pdelab_tpu.assembly.geometry import FaceGeometry, embed_face_points
    from dune_pdelab_tpu.fe.quadrature import quadrature_rule
    qpf, wf = quadrature_rule("cube", dim - 1, go.qorder)
    dofs = np.asarray(space.element_dofs, np.int64)
    for a in range(dim):
        sel = np.nonzero(itf["axis"] == a)[0]
        if len(sel) == 0:
            continue
        ins = itf["inside"][sel]
        outs = itf["outside"][sel]
        fgeo = FaceGeometry(mesh, a, qpf, wf)
        pts_in = embed_face_points(qpf, a, 1, dim)
        pts_out = embed_face_points(qpf, a, 0, dim)
        _, gin = fem.tabulate(pts_in)
        _, gout = fem.tabulate(pts_out)
        gin = jnp.asarray(gin / h, dtype)              # physical grads
        gout = jnp.asarray(gout / h, dtype)
        ui = x[jnp.asarray(dofs[ins], jnp.int32)]
        uo = x[jnp.asarray(dofs[outs], jnp.int32)]
        gui = jnp.einsum("qbd,eb->eqd", gin, ui)
        guo = jnp.einsum("qbd,eb->eqd", gout, uo)
        n = np.zeros(dim)
        n[a] = 1.0
        # [A grad u . n] with the volume-coefficient A evaluated at face pts
        origins = (mesh.lower + mesh.element_multi_index() * mesh.h)[ins]
        xf = jnp.asarray(origins[:, None, :] + (pts_in * mesh.h)[None], dtype)
        Af = jnp.asarray(problem.A(xf))
        flux_i = apply_tensor(Af, gui)
        flux_o = apply_tensor(Af, guo)
        jump = jnp.einsum("eqd,d->eq", flux_i - flux_o, jnp.asarray(n, dtype))
        face_eta = 0.5 * float(h[a]) * jnp.sum(
            jump**2 * jnp.asarray(fgeo.factor, dtype), axis=-1)
        eta2 = eta2.at[jnp.asarray(ins, jnp.int32)].add(face_eta)
        eta2 = eta2.at[jnp.asarray(outs, jnp.int32)].add(face_eta)
    return eta2


def error_fraction(eta2, alpha: float):
    """Refinement threshold capturing fraction `alpha` of the total error
    (Doerfler marking; reference: adaptivity.hh:863 error_fraction)."""
    e = np.sort(np.asarray(eta2))[::-1]
    cum = np.cumsum(e)
    total = cum[-1]
    if total <= 0:
        return np.inf
    idx = int(np.searchsorted(cum, alpha * total))
    return float(e[min(idx, len(e) - 1)])


def element_fraction(eta2, alpha: float):
    """Threshold marking the largest-eta `alpha` fraction of elements
    (reference: adaptivity.hh:915)."""
    e = np.sort(np.asarray(eta2))[::-1]
    idx = max(0, min(len(e) - 1, int(alpha * len(e)) - 1))
    return float(e[idx])


def mark_elements(eta2, refine_threshold, coarsen_threshold=0.0):
    """(refine_mask, coarsen_mask) per element (mark_grid analog :1029)."""
    e = np.asarray(eta2)
    return e >= refine_threshold, e <= coarsen_threshold


def adapt_uniform(space_old, x_old, factor: int = 2):
    """Refine the mesh uniformly and transfer the solution by conforming
    interpolation (the backup -> adapt -> replay cycle, reference:
    adaptivity.hh:523-710 GridAdaptor, collapsed to one prolongation).
    Returns (space_new, x_new)."""
    from dune_pdelab_tpu.linalg.multigrid import build_prolongation
    from dune_pdelab_tpu.space.space import FunctionSpace

    mesh_new = space_old.mesh.refine(factor)
    space_new = FunctionSpace(mesh_new, space_old.fem, name=space_old.name)
    if factor == 2:
        idx, w = build_prolongation(space_old, space_new)
        x_new = (jnp.asarray(w, x_old.dtype) * x_old[jnp.asarray(idx)]).sum(1)
    else:
        x_new = space_new.interpolate(
            lambda pts: _evaluate_on(space_old, x_old, pts), dtype=x_old.dtype)
    return space_new, x_new


def _evaluate_on(space, x, pts):
    """Pointwise evaluation of a discrete function at arbitrary points
    (uniform mesh): locate elements + reference coords, evaluate basis."""
    mesh = space.mesh
    pts = np.atleast_2d(pts)
    rel = (pts - mesh.lower) / mesh.h
    e_mi = np.clip(np.floor(rel).astype(np.int64), 0,
                   np.array(mesh.cells) - 1)
    xi = rel - e_mi
    strides = np.ones(mesh.dim, dtype=np.int64)
    for d in range(1, mesh.dim):
        strides[d] = strides[d - 1] * mesh.cells[d - 1]
    eidx = e_mi @ strides
    out = np.empty(len(pts))
    xv = np.asarray(x)
    dofs = np.asarray(space.element_dofs)
    # group by unique reference coordinate patterns is overkill: evaluate
    # per point (setup-time only)
    for i in range(len(pts)):
        vals, _ = space.fem.tabulate(xi[i:i + 1])
        out[i] = vals[0] @ xv[dofs[eidx[i]]]
    return out
