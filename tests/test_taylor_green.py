"""Taylor-Green vortex: full nonlinear instationary Navier-Stokes with
per-stage Newton (reference chain: taylorhoodnavierstokes.hh +
navierstokesmass.hh + implicitonestep.hh BC-reinterpolating variant).

Exact solution on [0, 2pi]^2 with f = 0, rho = 1:
    u = ( sin x cos y, -cos x sin y) e^{-2 nu t}
    p = 1/4 (cos 2x + cos 2y)        e^{-4 nu t}
The convection term is exactly balanced by the pressure gradient, so any
error is discretization error — a sharp oracle for the nonlinear kernel,
the mass operator, the DIRK stepping, and time-dependent Dirichlet data.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from dune_pdelab_tpu import StructuredMesh, GridOperator
from dune_pdelab_tpu.instationary import OneStepMethod, alexander2
from dune_pdelab_tpu.ops.stokes import (
    NavierStokesParameters, TaylorHoodNavierStokes, NavierStokesMass,
)
from dune_pdelab_tpu.solvers import LinearSolverBackend
from dune_pdelab_tpu.solvers.stokes import (
    taylor_hood_space, stokes_constraints, StokesBlockJacobi,
)
from dune_pdelab_tpu.space.functions import l2_difference

NU = 0.1
TWO_PI = 2 * np.pi


def u_exact(p, t):
    F = np.exp(-2 * NU * t)
    return np.stack([np.sin(p[:, 0]) * np.cos(p[:, 1]),
                     -np.cos(p[:, 0]) * np.sin(p[:, 1])], axis=-1) * F


def p_exact(p, t):
    return 0.25 * (np.cos(2 * p[:, 0]) + np.cos(2 * p[:, 1])) \
        * np.exp(-4 * NU * t)


@pytest.mark.slow
def test_taylor_green_vortex_decay():
    n = 10
    mesh = StructuredMesh([0, 0], [TWO_PI, TWO_PI], (n, n))
    W = taylor_hood_space(mesh, degree=2)
    prm = NavierStokesParameters(mu=NU, rho=1.0)   # f = 0
    lop = TaylorHoodNavierStokes(prm, navier=True)
    cg_ = stokes_constraints(W, bctype=True, pin_pressure=True)
    go0 = GridOperator(W, lop, constraints=cg_)
    go1 = GridOperator(W, NavierStokesMass(rho=1.0), constraints=cg_)
    ls = LinearSolverBackend(solver="gmres", precond=StokesBlockJacobi(W, NU),
                             restart=150, maxiter=40000)

    def bvals(t):
        return W.interpolate((lambda p: u_exact(p, t),
                              lambda p: p_exact(p, t)))

    osm = OneStepMethod(alexander2(), go0, go1, ls, pdesolver="newton",
                        boundary_values=bvals, reduction=1e-9, verbose=0)
    t, dt, T = 0.0, 0.1, 0.5
    x = bvals(0.0)
    while t < T - 1e-12:
        x = osm.apply(t, dt, x)
        t += dt

    Vv = W.children[0].children[0]
    verr = 0.0
    for c in range(2):
        xc = W.children[0].restrict(W.restrict(x, 0), c)
        verr += float(l2_difference(
            Vv, xc, lambda p, c=c: u_exact(p, T)[:, c])) ** 2
    verr = np.sqrt(verr)
    # exact velocity L2 norm at T is pi e^{-2 nu T} ~ 2.84; spatial Q2
    # error at h = 2pi/10 dominates (measured 0.054 = 1.9% relative),
    # dt^2 DIRK error is smaller
    assert verr < 0.08, verr
    # the vortex must actually DECAY at the viscous rate: kinetic energy
    # ratio e^{-4 nu T} (checks the mass/viscous balance, not just BCs)
    def ke(xv, tt):
        tot = 0.0
        for c in range(2):
            xc = W.children[0].restrict(W.restrict(xv, 0), c)
            from dune_pdelab_tpu.space.functions import l2_norm
            tot += float(l2_norm(Vv, xc)) ** 2
        return tot
    ratio = ke(x, T) / ke(bvals(0.0), 0.0)
    assert abs(ratio - np.exp(-4 * NU * T)) < 0.01, ratio
    assert osm.result.total_newton_iterations > 0
