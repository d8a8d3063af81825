"""Geometric multigrid tests (AMG-replacement oracle: mesh-independent CG
iteration counts; reference analog: dune-istl AMG backends + test-dg-amg)."""
import numpy as np
import jax.numpy as jnp
import pytest

from dune_pdelab_tpu import (
    StructuredMesh, FunctionSpace, QkFEM, GridOperator, constraints,
    StationaryLinearProblemSolver,
)
from dune_pdelab_tpu.ops import ConvectionDiffusionProblem, ConvectionDiffusionFEM
from dune_pdelab_tpu.linalg.multigrid import GeometricMultigrid, build_prolongation
from dune_pdelab_tpu.solvers import LinearSolverBackend
from dune_pdelab_tpu.space.functions import l2_difference


class P(ConvectionDiffusionProblem):
    def exact(self, p):
        return np.sin(np.pi * p[:, 0]) * np.cos(2 * np.pi * p[:, 1]) + p[:, 0]

    def f(self, x):
        return 5 * np.pi**2 * jnp.sin(np.pi * x[..., 0]) * jnp.cos(
            2 * np.pi * x[..., 1])

    def g(self, x):
        return jnp.sin(np.pi * x[..., 0]) * jnp.cos(2 * np.pi * x[..., 1]) \
            + x[..., 0]


def test_prolongation_reproduces_polynomials():
    """P interpolates exactly: prolongating a degree-k nodal field matches
    direct interpolation on the fine space."""
    for k in (1, 2):
        mc = StructuredMesh([0, 0], [1, 1], (4, 4))
        mf = mc.refine()
        Vc = FunctionSpace(mc, QkFEM(k, 2))
        Vf = FunctionSpace(mf, QkFEM(k, 2))
        idx, w = build_prolongation(Vc, Vf)
        f = lambda p: (p[:, 0] + 0.3) ** k + (p[:, 1] - 0.2) ** k
        xc = np.asarray(Vc.interpolate(f))
        xf = (w * xc[idx]).sum(axis=1)
        assert np.allclose(xf, np.asarray(Vf.interpolate(f)), atol=1e-12)


def _solve_gmg(n, k=1, dim=2, reduction=1e-10):
    p = P() if dim == 2 else P3()
    mesh = StructuredMesh([0] * dim, [1] * dim, (n,) * dim)
    fem = QkFEM(k, dim)
    V = FunctionSpace(mesh, fem)
    bctype = p.dirichlet_bctype()
    cg_ = constraints(bctype, V)
    go = GridOperator(V, ConvectionDiffusionFEM(p), constraints=cg_)
    gmg = GeometricMultigrid(ConvectionDiffusionFEM(p), mesh, fem, bctype=bctype)
    ls = LinearSolverBackend(solver="cg", precond=gmg)
    slp = StationaryLinearProblemSolver(go, ls, reduction=reduction, verbose=0)
    from dune_pdelab_tpu import interpolate_dirichlet
    x0 = interpolate_dirichlet(
        lambda q: np.asarray(p.g(jnp.asarray(q))), V, cg_, V.zero())
    x = slp.apply(x0)
    return V, x, slp, p


class P3(ConvectionDiffusionProblem):
    def exact(self, p):
        return p[:, 0] ** 2 + p[:, 1] ** 2 - 2 * p[:, 2] ** 2

    def f(self, x):
        return jnp.zeros(x.shape[:-1])

    def g(self, x):
        return x[..., 0] ** 2 + x[..., 1] ** 2 - 2 * x[..., 2] ** 2


def test_gmg_mesh_independent_iterations():
    """CG+GMG iteration count stays bounded as the mesh refines (the AMG
    scalability oracle)."""
    its = []
    for n in (16, 32, 64):
        V, x, slp, p = _solve_gmg(n)
        assert slp.result.converged
        its.append(slp.result.linear_solver_iterations)
        err = float(l2_difference(V, x, p.exact))
        assert err < 10.0 / n**2
    assert its[-1] <= its[0] + 3, its
    assert its[-1] <= 15, its


def test_gmg_q2():
    V, x, slp, p = _solve_gmg(16, k=2)
    assert slp.result.converged
    assert slp.result.linear_solver_iterations <= 20
    assert float(l2_difference(V, x, p.exact)) < 5e-4


def test_gmg_3d_q2_exact():
    """Config-2 shape: 3D Poisson Q2, CG + GMG; harmonic quadratic is
    reproduced exactly."""
    V, x, slp, p = _solve_gmg(8, k=2, dim=3)
    assert slp.result.converged
    assert slp.result.linear_solver_iterations <= 25
    assert float(l2_difference(V, x, p.exact)) < 1e-8


@pytest.mark.fast
def test_gmg_chebyshev_smoother():
    """Chebyshev polynomial smoothing (the TPU-friendly strong smoother):
    fewer preconditioned-CG iterations than damped Jacobi, still
    mesh-independent."""
    from dune_pdelab_tpu.solvers import LinearSolverBackend
    from dune_pdelab_tpu.solvers.stationary import StationaryLinearProblemSolver

    p = P()
    its = {}
    for n in (32, 64):
        mesh = StructuredMesh([0, 0], [1, 1], (n, n))
        V = FunctionSpace(mesh, QkFEM(1, 2))
        cg_ = constraints(p.dirichlet_bctype(), V)
        go = GridOperator(V, ConvectionDiffusionFEM(p), constraints=cg_)
        for sm in ("jacobi", "chebyshev"):
            gmg = GeometricMultigrid(ConvectionDiffusionFEM(p), mesh,
                                     QkFEM(1, 2),
                                     bctype=p.dirichlet_bctype(), smoother=sm)
            ls = LinearSolverBackend(solver="cg", precond=gmg,
                                     use_stencil=False)
            s = StationaryLinearProblemSolver(go, ls, reduction=1e-10)
            s.apply(V.zero())
            assert s.result.converged
            its[(sm, n)] = s.result.linear_solver_iterations
    assert its[("chebyshev", 32)] < its[("jacobi", 32)]
    # mesh independence of the chebyshev variant
    assert its[("chebyshev", 64)] <= its[("chebyshev", 32)] + 1
