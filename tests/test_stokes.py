"""Stokes / Navier-Stokes Taylor-Hood tests (reference analogs:
dune/pdelab/test with taylorhoodnavierstokes.hh, config 5 of BASELINE):
manufactured polynomial Stokes solution, divergence check, lid-driven
cavity Newton solve."""
import numpy as np
import jax.numpy as jnp
import pytest

from dune_pdelab_tpu import StructuredMesh, GridOperator
from dune_pdelab_tpu.ops.stokes import (
    NavierStokesParameters, TaylorHoodNavierStokes,
)
from dune_pdelab_tpu.solvers import (
    StationaryLinearProblemSolver, NewtonMethod, LinearSolverBackend,
)
from dune_pdelab_tpu.solvers.stokes import (
    taylor_hood_space, stokes_constraints, StokesBlockJacobi,
    velocity_pressure_masks,
)
from dune_pdelab_tpu.space.functions import l2_difference


# manufactured solution: psi = a(x) b(y), u = (a b', -a' b), p = x^3+y^3-1/2
def _a(x):
    return x**2 * (1 - x) ** 2

def _da(x):
    return 2 * x * (1 - x) * (1 - 2 * x)

def _dda(x):
    return 12 * x**2 - 12 * x + 2

def _ddda(x):
    return 24 * x - 12


def u_exact(p):
    x, y = p[:, 0], p[:, 1]
    return np.stack([_a(x) * _da(y), -_da(x) * _a(y)], axis=-1)


def p_exact(p):
    return p[:, 0] ** 3 + p[:, 1] ** 3 - 0.5


class ManufacturedStokes(NavierStokesParameters):
    def __init__(self, mu=1.0):
        super().__init__(mu=mu, rho=0.0)

    def f(self, x):
        xx, yy = x[..., 0], x[..., 1]
        mu = self.mu
        f1 = -mu * (_dda(xx) * _da(yy) + _a(xx) * _ddda(yy)) + 3 * xx**2
        f2 = mu * (_ddda(xx) * _a(yy) + _da(xx) * _dda(yy)) + 3 * yy**2
        return jnp.stack([f1, f2], axis=-1)


def _solve_stokes(n, reduction=1e-10):
    mesh = StructuredMesh([0, 0], [1, 1], (n, n))
    W = taylor_hood_space(mesh, degree=2)
    prm = ManufacturedStokes()
    cg_ = stokes_constraints(W, bctype=True, pin_pressure=True)
    lop = TaylorHoodNavierStokes(prm)
    go = GridOperator(W, lop, constraints=cg_)
    ls = LinearSolverBackend(solver="gmres", precond=StokesBlockJacobi(W),
                             restart=100, maxiter=20000)
    slp = StationaryLinearProblemSolver(go, ls, reduction=reduction, verbose=0)
    # no-slip: exact velocity is zero on the whole boundary, pin p(0)=p_exact
    x0 = W.zero()
    p0 = float(p_exact(W.children[1].dof_coords()[:1])[0])
    idx_pin = int(W.child_global(1, np.array([0]))[0])
    x0 = x0.at[idx_pin].set(p0)
    x = slp.apply(x0)
    return W, x, slp


def _velocity_error(W, x):
    Vv = W.children[0].children[0]
    err2 = 0.0
    for c in range(2):
        xc = W.children[0].restrict(W.restrict(x, 0), c)
        err2 += float(l2_difference(Vv, xc, lambda p, c=c: u_exact(p)[:, c])) ** 2
    return np.sqrt(err2)


def test_stokes_manufactured_convergence():
    errs = []
    for n in (4, 8):
        W, x, slp = _solve_stokes(n)
        assert slp.result.converged, (n, slp.result.__dict__)
        errs.append(_velocity_error(W, x))
    order = np.log2(errs[0] / errs[1])
    assert order > 2.5, (errs, order)   # Q2 velocity: O(h^3)


def test_stokes_divergence_free():
    W, x, slp = _solve_stokes(8)
    # discrete divergence: pressure-block residual of the solution is ~0
    # (it IS part of the residual system); check global mass conservation
    from dune_pdelab_tpu.space.functions import evaluate_at_quadrature
    Vv = W.children[0].children[0]
    div = 0.0
    for c in range(2):
        xc = W.children[0].restrict(W.restrict(x, 0), c)
        _, _, gu, factor = evaluate_at_quadrature(Vv, xc)
        div = div + jnp.sum(factor * gu[..., c])
    assert abs(float(div)) < 1e-10


def test_stokes_pressure_error():
    W, x, _ = _solve_stokes(8)
    Vp = W.children[1]
    xp = W.restrict(x, 1)
    err = float(l2_difference(Vp, xp, p_exact))
    assert err < 0.05, err


def test_navier_stokes_cavity_newton():
    """Lid-driven cavity at Re ~ 100: Newton over the nonlinear kernel."""
    mesh = StructuredMesh([0, 0], [1, 1], (8, 8))
    W = taylor_hood_space(mesh, degree=2)

    class Cavity(NavierStokesParameters):
        def __init__(self):
            super().__init__(mu=0.01, rho=1.0)

    prm = Cavity()
    cg_ = stokes_constraints(W, bctype=True, pin_pressure=True)
    go = GridOperator(W, TaylorHoodNavierStokes(prm), constraints=cg_)
    ls = LinearSolverBackend(solver="gmres", precond=StokesBlockJacobi(W, mu=0.01),
                             restart=150, maxiter=30000)
    newton = NewtonMethod(go, ls, reduction=1e-8, verbose=0,
                          min_linear_reduction=1e-4)
    # initial guess: lid velocity interpolated on the moving wall
    Vv = W.children[0].children[0]
    coords = Vv.dof_coords()
    lid = np.isclose(coords[:, 1], 1.0)
    # regularized lid: u_x = x(1-x)*4 on the lid avoids corner singularity
    ux = np.where(lid, 4 * coords[:, 0] * (1 - coords[:, 0]), 0.0)
    x0 = W.zero()
    x0 = W.embed(x0, 0, W.children[0].embed(
        W.restrict(x0, 0), 0, jnp.asarray(ux)))
    x = newton.apply(x0)
    assert newton.result.converged
    # center velocity magnitude is nonzero and bounded
    xc = W.children[0].restrict(W.restrict(x, 0), 0)
    assert 0.0 < float(jnp.max(jnp.abs(xc))) <= 1.01


def test_stokes_tensor_form():
    """Full stress-tensor form mu (grad v + grad v^T) (the reference's
    full_tensor switch): same manufactured div-free solution (for div-free
    u, -div(mu(grad u + grad u^T)) = -mu lap u, so the same f applies);
    Q2 velocity error stays at the gradient-form level and the velocity
    block remains symmetric (CG-solvable after pinning)."""
    from dune_pdelab_tpu import StructuredMesh
    mesh = StructuredMesh([0, 0], [1, 1], (8, 8))
    W = taylor_hood_space(mesh, degree=2)
    prm = ManufacturedStokes()
    cg_ = stokes_constraints(W, bctype=True, pin_pressure=True)
    lop = TaylorHoodNavierStokes(prm, tensor_form=True)
    go = GridOperator(W, lop, constraints=cg_)
    ls = LinearSolverBackend(solver="gmres", precond=StokesBlockJacobi(W),
                             restart=100, maxiter=20000)
    slp = StationaryLinearProblemSolver(go, ls, reduction=1e-9, verbose=0)
    x0 = W.zero()
    p0 = float(p_exact(W.children[1].dof_coords()[:1])[0])
    idx_pin = int(W.child_global(1, np.array([0]))[0])
    x0 = x0.at[idx_pin].set(p0)
    x = slp.apply(x0)
    assert slp.result.converged
    err_t = _velocity_error(W, x)
    W2, x2, _ = _solve_stokes(8)
    err_g = _velocity_error(W2, x2)
    assert err_t < 2.0 * err_g + 1e-12, (err_t, err_g)
    # operator symmetry in the velocity block: <J z, w> == <z, J w> for
    # velocity-only test vectors (the symmetric gradient keeps symmetry)
    rng = np.random.default_rng(0)
    nv = W.children[0].ndofs
    z = jnp.asarray(np.concatenate([rng.standard_normal(nv),
                                    np.zeros(W.ndofs - nv)]))
    w = jnp.asarray(np.concatenate([rng.standard_normal(nv),
                                    np.zeros(W.ndofs - nv)]))
    Jz = go.jacobian_apply(W.zero(), z)
    Jw = go.jacobian_apply(W.zero(), w)
    a = float(jnp.vdot(w, Jz))
    b = float(jnp.vdot(z, Jw))
    assert abs(a - b) < 1e-9 * max(1.0, abs(a)), (a, b)
