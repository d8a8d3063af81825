"""Instationary Stokes with the velocity-only mass operator (reference:
dune/pdelab/localoperator/navierstokesmass.hh + implicitonestep.hh).

Manufactured decaying flow u(x,t) = e^{-t} u0(x) with u0 the divergence-free
stream-function field of the stationary Stokes tests (zero boundary
velocity), p(x,t) = e^{-t} p0(x); the body force supplies the defect
f = e^{-t} (f_stokes - u0)."""
import numpy as np
import jax.numpy as jnp
import pytest

from dune_pdelab_tpu import StructuredMesh, GridOperator
from dune_pdelab_tpu.instationary import OneStepMethod, crank_nicolson
from dune_pdelab_tpu.ops.stokes import (
    NavierStokesParameters, TaylorHoodNavierStokes, NavierStokesMass,
)
from dune_pdelab_tpu.solvers import LinearSolverBackend
from dune_pdelab_tpu.solvers.stokes import (
    taylor_hood_space, stokes_constraints, StokesBlockJacobi,
)
from dune_pdelab_tpu.space.functions import l2_difference

pytestmark = pytest.mark.fast


def _a(x):
    return x**2 * (1 - x) ** 2

def _da(x):
    return 2 * x * (1 - x) * (1 - 2 * x)

def _dda(x):
    return 12 * x**2 - 12 * x + 2

def _ddda(x):
    return 24 * x - 12


def u0(p):
    x, y = p[:, 0], p[:, 1]
    return np.stack([_a(x) * _da(y), -_da(x) * _a(y)], axis=-1)


class DecayingStokes(NavierStokesParameters):
    """f = e^{-t} (f_stokes - u0) so that u = e^{-t} u0 solves the
    unsteady Stokes system with p = e^{-t} p0, p0 = x^3 + y^3 - 1/2."""

    def __init__(self):
        super().__init__(mu=1.0, rho=1.0)

    def f(self, x):
        xx, yy = x[..., 0], x[..., 1]
        mu = self.mu
        f1 = -mu * (_dda(xx) * _da(yy) + _a(xx) * _ddda(yy)) + 3 * xx**2
        f2 = mu * (_ddda(xx) * _a(yy) + _da(xx) * _dda(yy)) + 3 * yy**2
        u1 = _a(xx) * _da(yy)
        u2 = -_da(xx) * _a(yy)
        decay = jnp.exp(-self.time)
        return decay * jnp.stack([f1 - u1, f2 - u2], axis=-1)


def test_instationary_stokes_decay():
    n = 8
    mesh = StructuredMesh([0, 0], [1, 1], (n, n))
    W = taylor_hood_space(mesh, degree=2)
    prm = DecayingStokes()
    cg_ = stokes_constraints(W, bctype=True, pin_pressure=True)
    go_s = GridOperator(W, TaylorHoodNavierStokes(prm), constraints=cg_)
    go_t = GridOperator(W, NavierStokesMass(rho=1.0), constraints=cg_)
    ls = LinearSolverBackend(solver="gmres", precond=StokesBlockJacobi(W),
                             restart=100, maxiter=20000)
    osm = OneStepMethod(crank_nicolson(), go_s, go_t, ls,
                        pdesolver="linear", reduction=1e-10)

    Vv = W.children[0].children[0]
    x = W.interpolate((
        lambda p: u0(np.atleast_2d(p)),
        lambda p: np.atleast_2d(p)[:, 0]**3 + np.atleast_2d(p)[:, 1]**3 - 0.5,
    ))
    t, dt, T = 0.0, 0.02, 0.2
    while t < T - 1e-12:
        x = osm.apply(t, dt, x)
        t += dt

    # velocity L2 error vs the exact decayed field
    decay = np.exp(-t)
    err2 = 0.0
    for c in range(2):
        xc = W.children[0].restrict(W.restrict(x, 0), c)
        err2 += float(l2_difference(
            Vv, xc, lambda p, c=c: decay * u0(p)[:, c])) ** 2
    err = np.sqrt(err2)
    unorm = 0.006 * decay                    # ~ ||u0||_L2 scale
    assert err < 0.05 * unorm + 1e-6, (err, unorm)

    # the decay rate itself: max|u(T)| / max|u(0)| within 2% of e^{-T}
    u_T = np.asarray(W.restrict(x, 0))
    u_0 = np.asarray(W.interpolate((
        lambda p: u0(np.atleast_2d(p)), lambda p: 0 * np.atleast_2d(p)[:, 0])))
    ratio = np.abs(u_T).max() / np.abs(np.asarray(
        W.restrict(jnp.asarray(u_0), 0))).max()
    assert abs(ratio - decay) < 0.02 * decay, (ratio, decay)
