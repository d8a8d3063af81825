"""Differentiable PDE solves: adjoint gradients through stationary solves.

Beyond the C++ reference: PDELab has no sensitivity/adjoint machinery —
PDE-constrained optimization there means hand-deriving the adjoint PDE and
assembling it as another LocalOperator. Here the solve itself is a JAX
transformation target: `implicit_solve` wraps any "solve R(x, theta) = 0
for x" routine with a `jax.custom_vjp` implementing the implicit function
theorem (adjoint method), so `jax.grad` of any functional of the solution
works, at the cost of ONE adjoint linear solve per gradient:

    dJ/dtheta = -lambda^T dR/dtheta,   (dR/dx)^T lambda = dJ/dx

The residual's theta-dependence enters through a LocalOperator *factory*
(`parametric_residual`): problem coefficients close over a traced theta
pytree and flow through assembly by ordinary JAX tracing (exact AD — the
same mechanism that replaces the reference's numericaljacobian*.hh FD
mixins, localoperator/numericaljacobian.hh:31).

Forward solvers:
  * traceable solvers (this package's lax.while_loop Krylov loops,
    linalg/krylov.py) can be differentiated-through directly — but the
    whole point of the adjoint method is NOT to backprop through solver
    iterations: `implicit_solve` treats the forward solve as a black box
    and never differentiates its internals.
  * Python-driver solvers (NewtonMethod, StationaryLinearProblemSolver —
    host loops with data-dependent control flow) are not traceable; wrap
    them with `opaque_forward`, which runs them host-side via
    jax.pure_callback under any amount of jit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..assembly.gridoperator import GridOperator
from ..linalg import krylov


def parametric_residual(space, lop_factory, constraints=None, **go_kwargs):
    """Build R(x, theta[, time]) from a LocalOperator factory.

    lop_factory(theta) -> LocalOperator; theta may be any pytree of arrays
    and is traced through assembly (coefficient callables that close over
    theta produce exact derivatives). The GridOperator is reconstructed
    per call — its index maps are theta-independent numpy built from the
    space/mesh, so under jit/vjp this costs one rebuild per trace, not
    per evaluation.
    """
    def R(x, theta, time=0.0):
        go = GridOperator(space, lop_factory(theta),
                          constraints=constraints, **go_kwargs)
        return go.residual(x, time)
    return R


def opaque_forward(solve_py, example_x):
    """Wrap a host-side Python solver as a traceable forward solve.

    solve_py(theta) -> x* may contain arbitrary Python control flow
    (NewtonMethod, StationaryLinearProblemSolver drivers). Returns a
    function usable as `implicit_solve`'s forward under jit/grad; the
    callback runs with concrete values on the host. example_x fixes the
    result shape/dtype.
    """
    spec = jax.ShapeDtypeStruct(jnp.shape(example_x),
                                jnp.result_type(example_x))

    def forward(theta):
        return jax.pure_callback(solve_py, spec, theta, vmap_method=None)
    return forward


def implicit_solve(R, forward, *, constraints=None, x0_fn=None,
                   adjoint_solver="cg", adjoint_tol=1e-12,
                   adjoint_maxiter=10_000, adjoint_precond=None):
    """Differentiable x(theta) with R(x(theta), theta) = 0.

    R(x, theta) -> residual vector (same size as x); `forward(theta) -> x*`
    performs the actual solve and is NEVER differentiated — gradients come
    from the implicit function theorem:

        xbar -> thetabar = -(dR/dtheta)^T lambda,
        with (dR/dx)^T lambda = xbar  solved by `adjoint_solver`
        ("cg" for symmetric operators, "bicgstab"/"gmres" otherwise)
        on the exact transposed linearization (jax.vjp of R in x).

    Constrained residuals: this framework's constrained residual ZEROES
    Dirichlet rows (the solution's constrained entries come from the
    start vector, not from R), so dR/dx alone is singular. Pass the
    `constraints` (DirichletConstraints) used by the assembly and,
    if the Dirichlet data depends on theta, `x0_fn(theta) -> x0`. The
    effective residual is then Rt = R + mask_c * (x - x0(theta)), whose
    Jacobian [[I, 0], [A_fc, A_ff]] is block-triangular: the adjoint
    system Rt_x^T lam = xbar is solved as a Krylov solve of
    A_ff^T lam_f = xbar_f on the free subspace (still CG-able when A_ff
    is symmetric) plus the explicit back-substitution
    lam_c = xbar_c - (A_fc^T lam_f)_c.

    Returns f(theta) -> x*, compatible with jax.grad / jax.jit /
    jax.value_and_grad compositions.
    """
    solver = {"cg": krylov.cg, "bicgstab": krylov.bicgstab,
              "minres": krylov.minres,
              "gmres": krylov.restarted_gmres}[adjoint_solver]

    @jax.custom_vjp
    def f(theta):
        return forward(theta)

    def fwd(theta):
        x = forward(theta)
        return x, (x, theta)

    def bwd(saved, xbar):
        x, theta = saved
        _, vjp_x = jax.vjp(lambda xx: R(xx, theta), x)
        vjpR = lambda lam: vjp_x(lam)[0]
        kw = {} if adjoint_precond is None else {"M": adjoint_precond}
        if constraints is None:
            lam, _stats = solver(vjpR, xbar, tol=adjoint_tol,
                                 maxiter=adjoint_maxiter, **kw)
        else:
            m = constraints.mask
            free = lambda v: jnp.where(m, 0.0, v)

            def At(l):
                # SPD on the free subspace, identity on constrained DOFs
                # (R's constrained rows are zero, so vjpR only sees lam_f)
                return free(vjpR(free(l))) + jnp.where(m, l, 0.0)

            sol, _stats = solver(At, free(xbar), tol=adjoint_tol,
                                 maxiter=adjoint_maxiter, **kw)
            lam_f = free(sol)
            lam = lam_f + jnp.where(m, xbar - vjpR(lam_f), 0.0)
        _, vjp_t = jax.vjp(lambda tt: R(x, tt), theta)
        tbar = jax.tree_util.tree_map(lambda v: -v, vjp_t(lam)[0])
        if constraints is not None and x0_fn is not None:
            # the Dirichlet rows x_c - x0_c(theta) contribute
            # +(dx0/dtheta)^T lam_c (theta-dependent boundary data)
            _, vjp_x0 = jax.vjp(x0_fn, theta)
            extra = vjp_x0(jnp.where(constraints.mask, lam, 0.0))[0]
            tbar = jax.tree_util.tree_map(lambda a, b: a + b, tbar, extra)
        return (tbar,)

    f.defvjp(fwd, bwd)
    return f


def differentiable_stationary_solve(space, lop_factory, constraints=None,
                                    x0_fn=None, solver="cg", tol=1e-12,
                                    maxiter=10_000, precond=None,
                                    adjoint_solver=None, **go_kwargs):
    """Convenience: differentiable linear stationary solve.

    Forward = the StationaryLinearProblemSolver scheme (one Jacobian
    apply-based Krylov solve in residual-correction form: J z = r(x0),
    x = x0 - z; stationary/linearproblem.hh:182) built entirely from
    traceable pieces, so it works under jit directly. x0_fn(theta) -> x0
    supplies the Dirichlet-interpolated start vector (theta-dependent
    boundary data differentiates too); defaults to zeros.

    Returns f(theta) -> x, differentiable via `implicit_solve`.
    """
    R = parametric_residual(space, lop_factory, constraints=constraints,
                            **go_kwargs)
    fwd_solver = {"cg": krylov.cg, "bicgstab": krylov.bicgstab,
                  "minres": krylov.minres,
                  "gmres": krylov.restarted_gmres}[solver]

    def forward(theta):
        go = GridOperator(space, lop_factory(theta),
                          constraints=constraints, **go_kwargs)
        x0 = (jnp.zeros(space.ndofs, jnp.result_type(float))
              if x0_fn is None else x0_fn(theta))
        r = go.residual(x0)
        kw = {} if precond is None else {"M": precond}
        z, _stats = fwd_solver(lambda p: go.jacobian_apply(x0, p), r,
                               tol=tol, maxiter=maxiter, **kw)
        return x0 - z

    return implicit_solve(R, forward, constraints=constraints,
                          x0_fn=x0_fn,
                          adjoint_solver=adjoint_solver or solver,
                          adjoint_tol=tol, adjoint_maxiter=maxiter,
                          adjoint_precond=precond)
