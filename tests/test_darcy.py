"""Darcy velocity post-processing + nonlinear convection-diffusion kernel.

Oracles: exact reconstruction of linear heads, local conservation of the
CCFV RT0 reconstruction against the solver's own source term (reference:
darcyccfv.hh two-point fluxes), residual parity of the nonlinear kernel
with the linear kernel in its linear limit
(nonlinearconvectiondiffusionfem.hh :247-328), and a manufactured
-Laplace(u^2) = f Newton solve at second-order accuracy."""
import numpy as np
import jax.numpy as jnp
import pytest

from dune_pdelab_tpu import (
    StructuredMesh, FunctionSpace, QkFEM, GridOperator, constraints,
    interpolate_dirichlet, NewtonMethod, StationaryLinearProblemSolver,
)
from dune_pdelab_tpu.fe import P0FEM
from dune_pdelab_tpu.ops import (
    BCType, ConvectionDiffusionProblem, ConvectionDiffusionFEM,
    ConvectionDiffusionCCFV,
    DarcyVelocityFromHeadFEM, DarcyVelocityFromHeadCCFV,
    permeability_field, diagonal_permeability_field,
    NonlinearConvectionDiffusionProblem, NonlinearConvectionDiffusionFEM,
)
from dune_pdelab_tpu.solvers import SEQ_CG_Jacobi
from dune_pdelab_tpu.space.functions import l2_difference

pytestmark = pytest.mark.fast


class _TensorHead(ConvectionDiffusionProblem):
    """u = 2x + 3y with anisotropic K: Darcy velocity (-4, -1.5)."""

    def A(self, x):
        d = x.shape[-1]
        A = jnp.zeros(x.shape[:-1] + (d, d))
        A = A.at[..., 0, 0].set(2.0).at[..., 1, 1].set(0.5)
        return A

    def g(self, x):
        return 2 * x[..., 0] + 3 * x[..., 1]


def test_darcy_fem_exact_on_linear_head():
    p = _TensorHead()
    mesh = StructuredMesh([0, 0], [1, 1], (6, 5))
    V = FunctionSpace(mesh, QkFEM(1, 2))
    x = V.interpolate(lambda pts: 2 * pts[:, 0] + 3 * pts[:, 1])
    dv = DarcyVelocityFromHeadFEM(p, V, x)
    vc = np.asarray(dv.at_centers())
    assert np.allclose(vc, [-4.0, -1.5], atol=1e-12)
    err = float(dv.l2_difference(
        lambda pts: np.broadcast_to([-4.0, -1.5], pts.shape)))
    assert err < 1e-12


def test_darcy_ccfv_exact_on_linear_head():
    class P(ConvectionDiffusionProblem):
        def g(self, x):
            return x[..., 0]

    mesh = StructuredMesh([0, 0], [1, 1], (8, 4))
    u = mesh.element_centers()[:, 0]            # exact P0 head u = x
    dv = DarcyVelocityFromHeadCCFV(mesh, P(), u)
    vx, vy = dv.face_normal_velocities()
    assert np.allclose(vx, -1.0, atol=1e-13)
    assert np.allclose(vy, 0.0, atol=1e-13)
    assert np.allclose(dv.at_centers(), [-1.0, 0.0], atol=1e-13)
    assert np.allclose(dv.cell_divergence(), 0.0, atol=1e-11)


def test_darcy_ccfv_local_conservation():
    """div(v_RT0) of a converged TPFA solve equals the midpoint source."""
    class Diff(ConvectionDiffusionProblem):
        def f(self, x):
            return 2 * np.pi**2 * jnp.sin(np.pi * x[..., 0]) * jnp.sin(
                np.pi * x[..., 1])

    p = Diff()
    mesh = StructuredMesh([0, 0], [1, 1], (16, 16))
    V = FunctionSpace(mesh, P0FEM(2))
    go = GridOperator(V, ConvectionDiffusionCCFV(p))
    slp = StationaryLinearProblemSolver(go, SEQ_CG_Jacobi(),
                                        reduction=1e-13, verbose=0)
    x = slp.apply(V.zero())
    assert slp.result.converged
    dv = DarcyVelocityFromHeadCCFV(mesh, p, x)
    div = dv.cell_divergence()
    fmid = np.asarray(p.f(jnp.asarray(mesh.element_centers())))
    assert np.max(np.abs(div - fmid)) < 1e-8 * np.max(np.abs(fmid))


def test_darcy_ccfv_3d_conservation():
    """3D TPFA solve + RT0 reconstruction: exact linear-head velocities
    and cell-by-cell conservation."""
    class P(ConvectionDiffusionProblem):
        def A(self, x):
            return 2.0

        def g(self, x):
            return x[..., 2]

    mesh = StructuredMesh([0, 0, 0], [1, 1, 1], (4, 5, 6))
    u = mesh.element_centers()[:, 2]
    dv = DarcyVelocityFromHeadCCFV(mesh, P(), u)
    vx, vy, vz = dv.face_normal_velocities()
    assert np.allclose(vx, 0.0, atol=1e-13)
    assert np.allclose(vy, 0.0, atol=1e-13)
    assert np.allclose(vz, -2.0, atol=1e-12)
    assert np.allclose(dv.at_centers(), [0.0, 0.0, -2.0], atol=1e-12)
    assert np.allclose(dv.cell_divergence(), 0.0, atol=1e-10)


def test_permeability_adapters():
    p = _TensorHead()
    mesh = StructuredMesh([0, 0], [1, 1], (4, 4))
    k = permeability_field(mesh, p)
    assert k.shape == (16,) and np.allclose(k, np.log10(2.0))
    kd = diagonal_permeability_field(mesh, p)
    assert kd.shape == (16, 2)
    assert np.allclose(kd[:, 0], np.log10(2.0))
    assert np.allclose(kd[:, 1], np.log10(0.5))


# ---------------------------------------------------------------------------
# nonlinear convection-diffusion kernel
# ---------------------------------------------------------------------------

def test_nlcd_linear_limit_matches_linear_kernel():
    """With w(u)=u, v=1, q=u*b the kernel must reproduce the linear
    ConvectionDiffusionFEM residual exactly."""
    beta = np.array([0.7, -0.4])

    class Lin(ConvectionDiffusionProblem):
        def b(self, x):
            return jnp.broadcast_to(jnp.asarray(beta), x.shape)

        def f(self, x):
            return jnp.sin(3 * x[..., 0]) + x[..., 1]

    class NL(NonlinearConvectionDiffusionProblem):
        def q(self, x, u):
            return u[..., None] * jnp.broadcast_to(jnp.asarray(beta), x.shape)

        def f(self, x, u):
            return jnp.sin(3 * x[..., 0]) + x[..., 1]

    mesh = StructuredMesh([0, 0], [1, 1], (7, 6))
    V = FunctionSpace(mesh, QkFEM(1, 2))
    cg_ = constraints(True, V)
    go_lin = GridOperator(V, ConvectionDiffusionFEM(Lin()), constraints=cg_)
    go_nl = GridOperator(V, NonlinearConvectionDiffusionFEM(
        NL(), quadrature_add=0), constraints=cg_)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(V.ndofs))
    r1 = np.asarray(go_lin.residual(x))
    r2 = np.asarray(go_nl.residual(x))
    assert np.allclose(r1, r2, atol=1e-12)


class _Porous(NonlinearConvectionDiffusionProblem):
    """-Laplace(u^2) = f with u = sin(pi x) sin(pi y) + 1.2 (porous-medium
    type nonlinearity under the gradient)."""

    C = 1.2

    def exact(self, p):
        return np.sin(np.pi * p[:, 0]) * np.sin(np.pi * p[:, 1]) + self.C

    def w(self, x, u):
        return u * u

    def f(self, x, u):
        a = np.pi
        s0, c0 = jnp.sin(a * x[..., 0]), jnp.cos(a * x[..., 0])
        s1, c1 = jnp.sin(a * x[..., 1]), jnp.cos(a * x[..., 1])
        ue = s0 * s1 + self.C
        grad2 = a**2 * (c0**2 * s1**2 + s0**2 * c1**2)
        return -2 * grad2 + 4 * a**2 * ue * (ue - self.C)

    def g(self, x):
        return jnp.sin(np.pi * x[..., 0]) * jnp.sin(np.pi * x[..., 1]) + self.C


def test_nlcd_newton_manufactured_convergence():
    errs = []
    for n in (8, 16):
        p = _Porous()
        mesh = StructuredMesh([0, 0], [1, 1], (n, n))
        V = FunctionSpace(mesh, QkFEM(1, 2))
        cg_ = constraints(p.dirichlet_bctype(), V)
        go = GridOperator(V, NonlinearConvectionDiffusionFEM(p),
                          constraints=cg_)
        # interior guess must avoid the w'(0)=0 degeneracy of u^2
        xc = V.interpolate(lambda pts: np.full(len(pts), p.C))
        x0 = interpolate_dirichlet(p.g, V, cg_, xc)
        newton = NewtonMethod(go, SEQ_CG_Jacobi(), reduction=1e-11, verbose=0)
        x = newton.apply(x0)
        assert newton.result.converged
        errs.append(float(l2_difference(V, x, p.exact)))
    order = np.log2(errs[0] / errs[1])
    assert order > 1.8, (errs, order)
    assert errs[-1] < 5e-3
