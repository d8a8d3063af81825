"""End-to-end stationary solves with analytic solutions (testpoisson /
testanalytic analogs, reference: dune/pdelab/test/testpoisson.cc:230-266,
l2difference.hh oracles). Checks L2 errors, convergence orders, exact
reproduction of in-space solutions, Neumann BCs, and Newton on a
nonlinear problem."""
import numpy as np
import jax.numpy as jnp
import pytest

from dune_pdelab_tpu import (
    StructuredMesh, FunctionSpace, QkFEM, GridOperator, constraints,
    interpolate_dirichlet, NewtonMethod, StationaryLinearProblemSolver,
)
from dune_pdelab_tpu.ops import (
    ConvectionDiffusionProblem, ConvectionDiffusionFEM, BCType, LocalOperator,
)
from dune_pdelab_tpu.solvers import SEQ_CG_Jacobi, SEQ_BCGS_Jacobi
from dune_pdelab_tpu.space.functions import l2_difference


class SinCos2D(ConvectionDiffusionProblem):
    """-Δu = f with u = sin(πx) cos(2πy) + x, Dirichlet everywhere."""

    def exact(self, p):
        return np.sin(np.pi * p[:, 0]) * np.cos(2 * np.pi * p[:, 1]) + p[:, 0]

    def f(self, x):
        return 5 * np.pi**2 * jnp.sin(np.pi * x[..., 0]) * jnp.cos(
            2 * np.pi * x[..., 1])

    def g(self, x):
        return jnp.sin(np.pi * x[..., 0]) * jnp.cos(2 * np.pi * x[..., 1]) \
            + x[..., 0]


def _solve(problem, mesh, k, reduction=1e-12):
    V = FunctionSpace(mesh, QkFEM(k, mesh.dim))
    cg_ = constraints(problem.dirichlet_bctype(), V)
    go = GridOperator(V, ConvectionDiffusionFEM(problem), constraints=cg_)
    x0 = interpolate_dirichlet(
        lambda p: np.asarray(problem.g(jnp.asarray(p))), V, cg_, V.zero())
    slp = StationaryLinearProblemSolver(go, SEQ_CG_Jacobi(), reduction=reduction,
                                        verbose=0)
    return V, slp.apply(x0), slp


@pytest.mark.parametrize("k,expected_order", [(1, 2.0), (2, 3.0)])
def test_convergence_order_2d(k, expected_order):
    p = SinCos2D()
    errs = []
    for n in (8, 16, 32):
        mesh = StructuredMesh([0, 0], [1, 1], (n, n))
        V, x, _ = _solve(p, mesh, k)
        errs.append(float(l2_difference(V, x, p.exact)))
    orders = [np.log2(errs[i] / errs[i + 1]) for i in range(len(errs) - 1)]
    assert orders[-1] > expected_order - 0.15, (errs, orders)


def test_3d_poisson():
    class P3(ConvectionDiffusionProblem):
        def exact(self, p):
            return p[:, 0] ** 2 + p[:, 1] ** 2 - 2 * p[:, 2] ** 2

        def f(self, x):
            return jnp.zeros(x.shape[:-1])

        def g(self, x):
            return x[..., 0] ** 2 + x[..., 1] ** 2 - 2 * x[..., 2] ** 2

    p = P3()
    mesh = StructuredMesh([0, 0, 0], [1, 1, 1], (6, 6, 6))
    V, x, _ = _solve(p, mesh, 2)
    # harmonic polynomial of degree 2 is in the Q2 space -> exact
    assert float(l2_difference(V, x, p.exact)) < 1e-9


def test_exact_reproduction_q2():
    """Solution in the ansatz space is reproduced to solver tolerance."""
    class P(ConvectionDiffusionProblem):
        def exact(self, p):
            return p[:, 0] ** 2 + 3 * p[:, 1] ** 2

        def f(self, x):
            return -8.0 * jnp.ones(x.shape[:-1])

        def g(self, x):
            return x[..., 0] ** 2 + 3 * x[..., 1] ** 2

    p = P()
    mesh = StructuredMesh([0, 0], [1, 1], (5, 5))
    V, x, _ = _solve(p, mesh, 2)
    assert float(l2_difference(V, x, p.exact)) < 1e-9


def test_neumann_bc():
    """u = x^2 on (0,1)^2; Dirichlet at x=0, Neumann j=-2 at x=1,
    homogeneous Neumann on y-faces."""
    class P(ConvectionDiffusionProblem):
        def exact(self, p):
            return p[:, 0] ** 2

        def f(self, x):
            return -2.0 * jnp.ones(x.shape[:-1])

        def g(self, x):
            return x[..., 0] ** 2

        def bctype(self, x):
            return jnp.where(x[..., 0] < 1e-12, BCType.DIRICHLET, BCType.NEUMANN)

        def j(self, x):
            # j = -grad u . n = -2x * n_x; nonzero only on x=1 where n=(1,0)
            return jnp.where(x[..., 0] > 1 - 1e-12, -2.0, 0.0)

    p = P()
    mesh = StructuredMesh([0, 0], [1, 1], (6, 6))
    V, x, _ = _solve(p, mesh, 2)
    assert float(l2_difference(V, x, p.exact)) < 1e-9


def test_iteration_count_scaling():
    """Unpreconditioned-ish CG iterations grow ~linearly with 1/h (sanity of
    solver semantics; parity oracle analog of iteration-count checks)."""
    p = SinCos2D()
    its = []
    for n in (8, 16):
        mesh = StructuredMesh([0, 0], [1, 1], (n, n))
        _, _, slp = _solve(p, mesh, 1, reduction=1e-8)
        its.append(slp.result.linear_solver_iterations)
    assert its[1] > 1.4 * its[0]
    assert its[1] < 4 * its[0]


class NonlinearProblem(LocalOperator):
    """-Δu + u^3 = f, manufactured u = sin(πx)sin(πy)."""

    def exact(self, p):
        return np.sin(np.pi * p[:, 0]) * np.sin(np.pi * p[:, 1])

    def _u(self, x):
        return jnp.sin(np.pi * x[..., 0]) * jnp.sin(np.pi * x[..., 1])

    def alpha_volume(self, ctx, u):
        tab = ctx.tab
        gu = self.gradient_at_qp(tab, u)
        uq = self.value_at_qp(tab, u)
        return (self.accumulate_gradient(tab, ctx.factor, gu)
                + self.accumulate_value(tab, ctx.factor, uq**3))

    def lambda_volume(self, ctx):
        ue = self._u(ctx.x)
        f = 2 * np.pi**2 * ue + ue**3
        return self.accumulate_value(ctx.tab, ctx.factor, -f)


def test_newton_nonlinear():
    lop = NonlinearProblem()
    mesh = StructuredMesh([0, 0], [1, 1], (16, 16))
    V = FunctionSpace(mesh, QkFEM(1, 2))
    cg_ = constraints(True, V)
    go = GridOperator(V, lop, constraints=cg_)
    newton = NewtonMethod(go, SEQ_CG_Jacobi(), reduction=1e-10, verbose=0)
    x = newton.apply(V.zero())
    assert newton.result.converged
    assert newton.result.iterations <= 10
    err = float(l2_difference(V, x, lop.exact))
    assert err < 5e-3
    # quadratic-ish convergence: last defect far below first
    assert newton.result.defect < 1e-9 * max(newton.result.first_defect, 1.0)


def test_convection_dominated_bicgstab():
    """Convection-diffusion with BiCGStab (nonsymmetric system)."""
    class P(ConvectionDiffusionProblem):
        def A(self, x):
            return 0.05

        def b(self, x):
            return jnp.broadcast_to(jnp.array([1.0, 0.5]), x.shape)

        def f(self, x):
            return jnp.ones(x.shape[:-1])

    p = P()
    mesh = StructuredMesh([0, 0], [1, 1], (16, 16))
    V = FunctionSpace(mesh, QkFEM(1, 2))
    cg_ = constraints(p.dirichlet_bctype(), V)
    go = GridOperator(V, ConvectionDiffusionFEM(p), constraints=cg_)
    slp = StationaryLinearProblemSolver(go, SEQ_BCGS_Jacobi(), reduction=1e-10,
                                        verbose=0)
    x = slp.apply(V.zero())
    assert slp.result.converged
    r = go.residual(x)
    assert float(jnp.linalg.norm(r)) < 1e-8 * max(1.0, slp.result.first_defect)
