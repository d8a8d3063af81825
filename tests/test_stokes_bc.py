"""Stokes boundary-condition protocol: do-nothing outflow and prescribed
stress-Neumann traction (reference: stokesparameter.hh:32 codes,
taylorhoodnavierstokes.hh:300-364 lambda_boundary), plus variable
viscosity. Oracle: Poiseuille channel flow is EXACTLY representable in
Taylor-Hood Q2/Q1, so the discrete solution must match to solver
tolerance — including the pressure level set by the outflow condition."""
import numpy as np
import jax.numpy as jnp
import pytest

from dune_pdelab_tpu import StructuredMesh, GridOperator, constraints
from dune_pdelab_tpu.ops import (
    NavierStokesParameters, TaylorHoodNavierStokes, StokesBC,
)
from dune_pdelab_tpu.solvers import (
    StationaryLinearProblemSolver, LinearSolverBackend,
)
from dune_pdelab_tpu.solvers.stokes import taylor_hood_space, StokesBlockJacobi
from dune_pdelab_tpu.space.functions import l2_difference

pytestmark = pytest.mark.fast

L = 2.0          # channel length
MU = 0.7
P0 = 1.3         # outflow pressure level for the Neumann case


class Poiseuille(NavierStokesParameters):
    """u = (y(1-y), 0), p = 2 mu (L - x) + p_out; gradient-form
    do-nothing at x=L is exact for p_out = 0."""

    def __init__(self, p_out=0.0):
        super().__init__(mu=MU, rho=0.0)
        self.p_out = p_out

    def u_exact(self, p):
        return np.stack([p[:, 1] * (1 - p[:, 1]), np.zeros(len(p))], axis=-1)

    def p_exact(self, p):
        return 2 * MU * (L - p[:, 0]) + self.p_out

    def g(self, x):
        return jnp.stack([x[..., 1] * (1 - x[..., 1]),
                          jnp.zeros(x.shape[:-1])], axis=-1)

    def bctype(self, x):
        # walls win at the outflow-plane corners (the reference evaluates
        # bctype per intersection, so corner DOFs are constrained through
        # their wall face; pointwise that means walls take precedence)
        on_wall = (x[..., 1] < 1e-10) | (x[..., 1] > 1 - 1e-10)
        on_out = x[..., 0] > L - 1e-10
        code = StokesBC.STRESS_NEUMANN if self.p_out != 0.0 \
            else StokesBC.DO_NOTHING
        return jnp.where(on_wall, StokesBC.VELOCITY_DIRICHLET,
                         jnp.where(on_out, code,
                                   StokesBC.VELOCITY_DIRICHLET))

    def j(self, x, normal):
        # j = -(mu dv/dn - p n) = p_out * n on the outflow plane
        return self.p_out * normal


def _solve(prm, n=6):
    mesh = StructuredMesh([0, 0], [L, 1], (2 * n, n))
    W = taylor_hood_space(mesh, degree=2)
    cg_ = constraints((prm.velocity_bctype(), None), W)
    go = GridOperator(W, TaylorHoodNavierStokes(prm), constraints=cg_)
    ls = LinearSolverBackend(solver="gmres", precond=StokesBlockJacobi(W, MU),
                             restart=150, maxiter=40000)
    # initial guess: Dirichlet data on constrained velocity DOFs
    gv = np.asarray(prm.g(jnp.asarray(W.children[0].children[0].dof_coords())))
    x0 = np.zeros(W.ndofs)
    for c in range(2):
        gidx = W.child_global(0, W.children[0].child_global(
            c, np.arange(len(gv), dtype=np.int64)))
        x0[gidx] = gv[:, c]
    x0 = jnp.asarray(x0) * jnp.asarray(cg_.mask_np)
    slp = StationaryLinearProblemSolver(go, ls, reduction=1e-11, verbose=0)
    return W, slp.apply(x0), slp


def _errors(W, x, prm):
    Vv = W.children[0].children[0]
    verr = 0.0
    for c in range(2):
        xc = W.children[0].restrict(W.restrict(x, 0), c)
        verr += float(l2_difference(
            Vv, xc, lambda p, c=c: prm.u_exact(p)[:, c])) ** 2
    Vp = W.children[1]
    perr = float(l2_difference(Vp, W.restrict(x, 1), prm.p_exact))
    return np.sqrt(verr), perr


def test_poiseuille_do_nothing_outflow_exact():
    prm = Poiseuille(p_out=0.0)
    W, x, slp = _solve(prm)
    assert slp.result.converged
    verr, perr = _errors(W, x, prm)
    assert verr < 1e-8, verr     # quadratic velocity is in the space
    assert perr < 1e-7, perr     # linear pressure is in the space


def test_poiseuille_stress_neumann_sets_pressure_level():
    prm = Poiseuille(p_out=P0)
    W, x, slp = _solve(prm)
    assert slp.result.converged
    verr, perr = _errors(W, x, prm)
    assert verr < 1e-8, verr
    assert perr < 1e-7, perr     # includes the +P0 level from j = P0 n


def test_dg_poiseuille_stress_neumann_exact():
    """DG NSE with the same BC protocol (reference: dgnavierstokes.hh:879
    Dirichlet-only alpha terms, :1346 StressNeumann +j.phi): Poiseuille is
    exact in Q2dg/Q1dg, pressure level set by the outflow traction —
    no pressure pinning needed."""
    from dune_pdelab_tpu import FunctionSpace, CompositeSpace
    from dune_pdelab_tpu.fe import QkDGFEM
    from dune_pdelab_tpu.space.space import PowerSpace
    from dune_pdelab_tpu.ops.dgnavierstokes import DGNavierStokes

    prm = Poiseuille(p_out=P0)
    mesh = StructuredMesh([0, 0], [L, 1], (8, 4))
    Vv = FunctionSpace(mesh, QkDGFEM(2, 2))
    Vp = FunctionSpace(mesh, QkDGFEM(1, 2))
    W = CompositeSpace(PowerSpace(Vv, 2), Vp)
    go = GridOperator(W, DGNavierStokes(prm))
    ls = LinearSolverBackend(solver="gmres", precond="block_jacobi",
                             restart=200, maxiter=60000)
    slp = StationaryLinearProblemSolver(go, ls, reduction=1e-11, verbose=0)
    x = slp.apply(W.zero())
    assert slp.result.converged
    verr = 0.0
    for c in range(2):
        xc = W.children[0].restrict(W.restrict(x, 0), c)
        verr += float(l2_difference(
            Vv, xc, lambda p, c=c: prm.u_exact(p)[:, c])) ** 2
    perr = float(l2_difference(Vp, W.restrict(x, 1), prm.p_exact))
    assert np.sqrt(verr) < 1e-7, verr
    assert perr < 1e-6, perr


@pytest.mark.parametrize("tensor_form", [False, True])
def test_dg_slip_walls_plug_flow_exact(tensor_form):
    """SLIP_VELOCITY walls (reference: dgnavierstokes.hh:870-949, Nitsche
    on the normal trace only): plug flow u=(1,0), p=0 is exact with slip
    walls + Dirichlet inflow + do-nothing outflow. No-slip walls would
    shear it — exactness proves the tangential trace is genuinely free
    while u.n is constrained."""
    from dune_pdelab_tpu import FunctionSpace, CompositeSpace
    from dune_pdelab_tpu.fe import QkDGFEM
    from dune_pdelab_tpu.space.space import PowerSpace
    from dune_pdelab_tpu.ops.dgnavierstokes import DGNavierStokes

    class Plug(NavierStokesParameters):
        def __init__(self):
            super().__init__(mu=MU, rho=0.0)

        def g(self, x):
            return jnp.stack([jnp.ones(x.shape[:-1]),
                              jnp.zeros(x.shape[:-1])], axis=-1)

        def bctype(self, x):
            on_wall = (x[..., 1] < 1e-10) | (x[..., 1] > 1 - 1e-10)
            on_out = x[..., 0] > L - 1e-10
            return jnp.where(on_wall, StokesBC.SLIP_VELOCITY,
                             jnp.where(on_out, StokesBC.DO_NOTHING,
                                       StokesBC.VELOCITY_DIRICHLET))

    prm = Plug()
    mesh = StructuredMesh([0, 0], [L, 1], (6, 3))
    Vv = FunctionSpace(mesh, QkDGFEM(2, 2))
    Vp = FunctionSpace(mesh, QkDGFEM(1, 2))
    W = CompositeSpace(PowerSpace(Vv, 2), Vp)
    go = GridOperator(W, DGNavierStokes(prm, tensor_form=tensor_form))
    ls = LinearSolverBackend(solver="gmres", precond="block_jacobi",
                             restart=200, maxiter=60000)
    slp = StationaryLinearProblemSolver(go, ls, reduction=1e-11, verbose=0)
    x = slp.apply(W.zero())
    assert slp.result.converged
    verr = 0.0
    for c in range(2):
        xc = W.children[0].restrict(W.restrict(x, 0), c)
        verr += float(l2_difference(
            Vv, xc, lambda p, c=c: np.full(len(p), 1.0 - c))) ** 2
    perr = float(l2_difference(Vp, W.restrict(x, 1),
                               lambda p: np.zeros(len(p))))
    assert np.sqrt(verr) < 1e-8, verr
    assert perr < 1e-7, perr


@pytest.mark.slow
def test_poiseuille_3d_do_nothing_outflow_exact():
    """3D plane-Poiseuille in a duct, invariant in z: u = (y(1-y), 0, 0),
    p = 2 mu (L - x); exact in Q2/Q1 Taylor-Hood, do-nothing outflow sets
    the pressure level. First 3D composite-space Stokes oracle."""
    class P3(NavierStokesParameters):
        def __init__(self):
            super().__init__(mu=MU, rho=0.0)

        def u_exact(self, p):
            return np.stack([p[:, 1] * (1 - p[:, 1]),
                             np.zeros(len(p)), np.zeros(len(p))], axis=-1)

        def p_exact(self, p):
            return 2 * MU * (L - p[:, 0])

        def g(self, x):
            return jnp.stack([x[..., 1] * (1 - x[..., 1]),
                              jnp.zeros(x.shape[:-1]),
                              jnp.zeros(x.shape[:-1])], axis=-1)

        def bctype(self, x):
            on_wall = ((x[..., 1] < 1e-10) | (x[..., 1] > 1 - 1e-10)
                       | (x[..., 2] < 1e-10) | (x[..., 2] > 1 - 1e-10))
            on_out = x[..., 0] > L - 1e-10
            return jnp.where(on_wall, StokesBC.VELOCITY_DIRICHLET,
                             jnp.where(on_out, StokesBC.DO_NOTHING,
                                       StokesBC.VELOCITY_DIRICHLET))

    prm = P3()
    mesh = StructuredMesh([0, 0, 0], [L, 1, 1], (6, 3, 3))
    W = taylor_hood_space(mesh, degree=2)
    cg_ = constraints((prm.velocity_bctype(), None), W)
    go = GridOperator(W, TaylorHoodNavierStokes(prm), constraints=cg_)
    ls = LinearSolverBackend(solver="gmres", precond=StokesBlockJacobi(W, MU),
                             restart=200, maxiter=60000)
    gv = np.asarray(prm.g(jnp.asarray(W.children[0].children[0].dof_coords())))
    x0 = np.zeros(W.ndofs)
    for c in range(3):
        gidx = W.child_global(0, W.children[0].child_global(
            c, np.arange(len(gv), dtype=np.int64)))
        x0[gidx] = gv[:, c]
    x0 = jnp.asarray(x0) * jnp.asarray(cg_.mask_np)
    slp = StationaryLinearProblemSolver(go, ls, reduction=1e-11, verbose=0)
    x = slp.apply(x0)
    assert slp.result.converged
    Vv = W.children[0].children[0]
    verr = 0.0
    for c in range(3):
        xc = W.children[0].restrict(W.restrict(x, 0), c)
        verr += float(l2_difference(
            Vv, xc, lambda p, c=c: prm.u_exact(p)[:, c])) ** 2
    perr = float(l2_difference(Vp := W.children[1], W.restrict(x, 1),
                               prm.p_exact))
    assert np.sqrt(verr) < 1e-7, verr
    assert perr < 1e-6, perr


def test_variable_viscosity_callable_mu():
    """mu(x) callable reduces to the constant case when constant-valued,
    and assembles position-dependent viscosity without error."""
    prm_const = Poiseuille()
    prm_call = Poiseuille()
    prm_call.mu = lambda x: jnp.full(x.shape[:-1], MU)
    mesh = StructuredMesh([0, 0], [L, 1], (6, 3))
    W = taylor_hood_space(mesh, degree=2)
    cg_ = constraints((prm_const.velocity_bctype(), None), W)
    rng = np.random.default_rng(5)
    xr = jnp.asarray(rng.standard_normal(W.ndofs))
    r1 = GridOperator(W, TaylorHoodNavierStokes(prm_const),
                      constraints=cg_).residual(xr)
    r2 = GridOperator(W, TaylorHoodNavierStokes(prm_call),
                      constraints=cg_).residual(xr)
    assert np.allclose(np.asarray(r1), np.asarray(r2), atol=1e-13)
    # genuinely variable viscosity still assembles and stays finite
    prm_var = Poiseuille()
    prm_var.mu = lambda x: MU * (1.0 + 0.5 * x[..., 1])
    r3 = GridOperator(W, TaylorHoodNavierStokes(prm_var),
                      constraints=cg_).residual(xr)
    assert np.all(np.isfinite(np.asarray(r3)))
    assert not np.allclose(np.asarray(r3), np.asarray(r1))
