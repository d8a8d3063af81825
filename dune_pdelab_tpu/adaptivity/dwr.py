"""Goal-oriented (dual-weighted-residual) error estimation.

The reference's adaptivity stack drives refinement with energy-norm
residual estimators (dune/pdelab/adaptivity/adaptivity.hh,
localoperator/errorindicatordg.hh); it has no goal-oriented machinery.
Here the adjoint infrastructure (solvers/differentiable.py) makes DWR
natural: for a goal functional J,

    J(u) - J(u_h)  ~  - r(u_h)(z)  =  - sum_K r_K(u_h)(w),
    w = z - I_h z,

with z the adjoint solution in an ENRICHED space (same mesh, higher
order — the standard computable substitute for the exact dual) and
I_h the interpolation onto the primal space. Per-element contributions
come from `GridOperator.weighted_element_residuals`; the adjoint solve
is one Krylov solve of the transposed linearization (jax.vjp of the
residual — exact, no hand-derived adjoint PDE).

`space_transfer` builds the nodal inter-space transfer u -> u_rich for
two leaf spaces on the SAME mesh via each element's interpolation
functionals (fe/basis.py `interpolation_points`/`interpolation_matrix`).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..linalg import krylov


def space_transfer(space_from, space_to):
    """Nodal transfer between two leaf spaces on the same mesh.

    Returns apply(u_from) -> u_to with
    u_to|_K = M_to @ (u_from evaluated at the target element's
    interpolation points) — exact embedding for nested spaces
    (e.g. Q_p into Q_{p+1}), nodal interpolation otherwise. Shared-DOF
    writes collide with equal values (continuous inputs), so .at[].set
    is well-defined up to roundoff.
    """
    vals, _ = space_from.fem.tabulate(space_to.fem.interpolation_points)
    T = np.asarray(space_to.fem.interpolation_matrix) @ vals   # (nb_to, nb_from)
    Tj = jnp.asarray(T)
    dofs_from = jnp.asarray(np.asarray(space_from.element_dofs), jnp.int32)
    dofs_to = jnp.asarray(np.asarray(space_to.element_dofs), jnp.int32)
    n_to = space_to.ndofs

    def apply(u):
        loc = jnp.einsum("ib,eb->ei", Tj.astype(u.dtype), u[dofs_from],
                         precision="highest")
        return jnp.zeros(n_to, u.dtype).at[dofs_to.reshape(-1)].set(
            loc.reshape(-1))
    return apply


def dwr_indicators(go, go_rich, x, goal, *, solver="cg", tol=1e-12,
                   maxiter=10_000, time=0.0):
    """Goal-oriented error indicators for the primal solution x of `go`.

    go_rich discretizes the SAME problem on an enriched leaf space (same
    mesh; e.g. Q_{p+1}) with its own constraints; goal(u_rich) -> scalar
    is any traceable functional. Returns (eta, estimate):
      eta      (nelements,) nonnegative refinement indicators |eta_K|
      estimate signed scalar sum_K eta_K ~ J(u) - J(u_h)
    One adjoint Krylov solve in the rich space per call ("cg" for
    symmetric operators, else "bicgstab"/"gmres").
    """
    krysolve = {"cg": krylov.cg, "bicgstab": krylov.bicgstab,
                "minres": krylov.minres,
                "gmres": krylov.restarted_gmres}[solver]
    embed = space_transfer(go.space, go_rich.space)
    proj = space_transfer(go_rich.space, go.space)
    xr = embed(x)

    gbar = jax.grad(goal)(xr)
    _, vjp_x = jax.vjp(lambda u: go_rich.residual(u, time), xr)
    vjpR = lambda lam: vjp_x(lam)[0]
    if go_rich.cg is not None:
        m = go_rich.cg.mask
        free = lambda v: jnp.where(m, 0.0, v)

        def At(l):
            return free(vjpR(free(l))) + jnp.where(m, l, 0.0)

        z, _stats = krysolve(At, free(gbar), tol=tol, maxiter=maxiter)
        z = free(z)
    else:
        z, _stats = krysolve(vjpR, gbar, tol=tol, maxiter=maxiter)

    w = z - embed(proj(z))
    eta_signed = go_rich.weighted_element_residuals(xr, w, time)
    # J(u) - J(u_h) ~ -r(u_h)(z): the residual convention here is
    # r(u)(v) = a(u, v) - l(v), adjoint a(v, z) = J'(v)
    return jnp.abs(eta_signed), -float(jnp.sum(eta_signed))
