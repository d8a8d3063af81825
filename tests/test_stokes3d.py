"""3D Taylor-Hood Stokes through StokesGMGSchur and instationary NSE
stages through CahouetChabardSchur.

3D manufactured divergence-free solution: u = curl(0, 0, psi) with
psi = a(x) a(y) a(z), a = x^2(1-x)^2, i.e.
    u = (a(x) da(y) a(z), -da(x) a(y) a(z), 0)
which vanishes on ALL faces of the unit cube (a and da vanish at 0/1),
p = x^3 + y^3 + z^3 - 3/4.

reference: the 3D Taylor-Hood systems of
dune/pdelab/localoperator/taylorhoodnavierstokes.hh:52 and
dgnavierstokes.hh:32 (the reference solves 3D NSE with this operator
class); the Cahouet-Chabard split is the classical instationary Schur
approximation for navierstokesmass.hh + implicitonestep.hh stages.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from dune_pdelab_tpu import StationaryLinearProblemSolver, StructuredMesh, GridOperator
from dune_pdelab_tpu.instationary import OneStepMethod, one_step_theta
from dune_pdelab_tpu.ops.stokes import (
    NavierStokesParameters, TaylorHoodNavierStokes, NavierStokesMass,
)
from dune_pdelab_tpu.solvers import LinearSolverBackend
from dune_pdelab_tpu.solvers.stokes import (
    taylor_hood_space, stokes_constraints, StokesGMGSchur,
    CahouetChabardSchur,
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


def u3(p):
    x, y, z = p[:, 0], p[:, 1], p[:, 2]
    return np.stack([_a(x) * _da(y) * _a(z),
                     -_da(x) * _a(y) * _a(z),
                     np.zeros_like(x)], axis=-1)


def _f_stokes(x):
    """-mu lap u + grad p for mu=1 and the solution above."""
    xx, yy, zz = x[..., 0], x[..., 1], x[..., 2]
    lap1 = (_dda(xx) * _da(yy) * _a(zz) + _a(xx) * _ddda(yy) * _a(zz)
            + _a(xx) * _da(yy) * _dda(zz))
    lap2 = -(_ddda(xx) * _a(yy) * _a(zz) + _da(xx) * _dda(yy) * _a(zz)
             + _da(xx) * _a(yy) * _dda(zz))
    f1 = -lap1 + 3 * xx**2
    f2 = -lap2 + 3 * yy**2
    f3 = 3 * zz**2 + jnp.zeros_like(xx)
    return jnp.stack([f1, f2, f3], axis=-1)


class MS3(NavierStokesParameters):
    def __init__(self):
        super().__init__(mu=1.0, rho=0.0)

    def f(self, x):
        return _f_stokes(x)


def _solve3d(cells, reduction=1e-8):
    mesh = StructuredMesh([0, 0, 0], [1, 1, 1], (cells,) * 3)
    W = taylor_hood_space(mesh, 2)
    # pin_pressure=False: GMRES solves the consistent singular system
    # (hydrostatic mode never excited). A single pinned pressure DOF
    # produces an h-DEPENDENT outlier in the 3D Schur complement (point
    # constraint ~ 1/r Green's function, vs the mild log in 2D): measured
    # 54/88/111 its pinned vs 36/58/66 unpinned on 4/8/16^3.
    cg_ = stokes_constraints(W, pin_pressure=False)
    go = GridOperator(W, TaylorHoodNavierStokes(MS3()), constraints=cg_)
    pre = StokesGMGSchur(W, mu=1.0, triangular=True)
    ls = LinearSolverBackend(solver="gmres", precond=pre, restart=100,
                             maxiter=2000)
    slp = StationaryLinearProblemSolver(go, ls, reduction=reduction,
                                        verbose=0)
    x = slp.apply(W.zero())
    err2 = 0.0
    for c in range(3):
        xc = W.children[0].restrict(W.restrict(x, 0), c)
        err2 += float(l2_difference(
            W.children[0].children[0], xc,
            lambda p, c=c: u3(p)[:, c])) ** 2
    return (slp.result.linear_solver_iterations, slp.result.converged,
            float(np.sqrt(err2)), pre)


def test_stokes3d_gmgschur_iterations_bounded():
    """3D Taylor-Hood: GMRES iterations bounded and plateauing across
    three refinements; velocity error converges at the Q2 rate."""
    its, errs = [], []
    for cells in (4, 8, 16):
        it, conv, err, pre = _solve3d(cells)
        assert conv
        assert pre._vgmg is not None       # real GMG, not the fallback
        its.append(it)
        errs.append(err)
    assert max(its) <= 80, its
    assert its[2] - its[1] <= 12, its      # plateauing, not 1/h growth
    assert errs[2] < 0.25 * errs[1], errs  # ~h^3 (coarsest is preasymptotic)


def test_stokes_fallback_warns():
    """Odd cell counts have no lattice hierarchy: the fallback must warn."""
    mesh = StructuredMesh([0, 0], [1, 1], (9, 9))
    W = taylor_hood_space(mesh, 2)
    with pytest.warns(UserWarning, match="diagonal Jacobi"):
        pre = StokesGMGSchur(W)
    assert pre._vgmg is None


# ---------------------------------------------------------------------------
# Cahouet-Chabard instationary stages (2D for runtime; the operator stack
# is dimension-generic and the 3D stationary path is covered above)
# ---------------------------------------------------------------------------

def _u0_2d(p):
    x, y = p[:, 0], p[:, 1]
    return np.stack([_a(x) * _da(y), -_da(x) * _a(y)], axis=-1)


class Decaying2D(NavierStokesParameters):
    """u = e^{-t} u0, p = e^{-t} p0 solves unsteady Stokes with
    f = e^{-t} (f_stokes - u0) (rho = mu = 1)."""

    def __init__(self):
        super().__init__(mu=1.0, rho=1.0)

    def f(self, x):
        xx, yy = x[..., 0], x[..., 1]
        f1 = -(_dda(xx) * _da(yy) + _a(xx) * _ddda(yy)) + 3 * xx**2
        f2 = (_ddda(xx) * _a(yy) + _da(xx) * _dda(yy)) + 3 * yy**2
        u1 = _a(xx) * _da(yy)
        u2 = -_da(xx) * _a(yy)
        return jnp.exp(-self.time) * jnp.stack([f1 - u1, f2 - u2], axis=-1)


def _run_cc(n=8, dt=0.02, T=0.1, precond_factory=None):
    mesh = StructuredMesh([0, 0], [1, 1], (n, n))
    W = taylor_hood_space(mesh, degree=2)
    prm = Decaying2D()
    cg_ = stokes_constraints(W, bctype=True, pin_pressure=True)
    go_s = GridOperator(W, TaylorHoodNavierStokes(prm), constraints=cg_)
    go_t = GridOperator(W, NavierStokesMass(rho=1.0), constraints=cg_)
    factory = precond_factory or (
        lambda W_: CahouetChabardSchur(W_, mu=1.0, rho=1.0))
    pre = factory(W)
    ls = LinearSolverBackend(solver="gmres", precond=pre, restart=150,
                             maxiter=20000)
    osm = OneStepMethod(one_step_theta(1.0), go_s, go_t, ls,
                        pdesolver="linear", reduction=1e-9)
    x = W.interpolate((
        lambda p: _u0_2d(np.atleast_2d(p)),
        lambda p: np.atleast_2d(p)[:, 0]**3 + np.atleast_2d(p)[:, 1]**3 - 0.5,
    ))
    t, steps = 0.0, 0
    while t < T - 1e-12:
        x = osm.apply(t, dt, x)
        t += dt
        steps += 1
    err2 = 0.0
    decay = np.exp(-t)
    for c in range(2):
        xc = W.children[0].restrict(W.restrict(x, 0), c)
        err2 += float(l2_difference(
            W.children[0].children[0], xc,
            lambda p, c=c: decay * _u0_2d(p)[:, c])) ** 2
    its_per_step = osm.result.total_linear_iterations / max(
        1, osm.result.total_newton_iterations + steps)
    return float(np.sqrt(err2)), its_per_step, osm


def test_cahouet_chabard_instationary():
    """Implicit-Euler unsteady Stokes stages through the Cahouet-Chabard
    Schur preconditioner: correct decay + bounded per-step GMRES counts."""
    err, its_per_step, osm = _run_cc()
    # first-order-in-time + spatial error: loose absolute bound on the
    # ~6e-3-scale velocity field
    assert err < 5e-4, err
    assert its_per_step <= 80, its_per_step


def test_cahouet_chabard_beats_mass_only():
    """At a mass-dominated timestep the CC Laplacian term must pay off:
    fewer GMRES iterations than the pressure-mass-only Schur (lp_iters=0
    disables exactly the L_p term — the dt -> 0 failure mode CC fixes —
    while keeping the identical velocity stage block)."""
    _, its_cc, _ = _run_cc(
        n=8, dt=0.005, T=0.02,
        precond_factory=lambda W: CahouetChabardSchur(W, mu=1.0, rho=1.0))
    _, its_mass, _ = _run_cc(
        n=8, dt=0.005, T=0.02,
        precond_factory=lambda W: CahouetChabardSchur(W, mu=1.0, rho=1.0,
                                                      lp_iters=0))
    assert its_cc < its_mass, (its_cc, its_mass)
