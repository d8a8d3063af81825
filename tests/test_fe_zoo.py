"""New element families: monomial DG, OPB (L2-orthonormal) DG, RT1 cube
(reference: dune/pdelab/finiteelementmap/{monomfem.hh,opbfem.hh,
rt1cube2dfem.hh}, finiteelement/l2orthonormal.hh). Oracles: orthonormality,
projection exactness, DG convergence orders with modal bases, RT1 dof
duality + mixed-Darcy convergence."""
import numpy as np
import jax.numpy as jnp
import pytest

from dune_pdelab_tpu import (
    StructuredMesh, FunctionSpace, GridOperator, CompositeSpace,
)
from dune_pdelab_tpu.fe import MonomialDGFEM, OPBFEM, QkDGFEM
from dune_pdelab_tpu.fe.quadrature import quadrature_rule
from dune_pdelab_tpu.fe.hdiv import RT1Cube2D
from dune_pdelab_tpu.ops import ConvectionDiffusionProblem
from dune_pdelab_tpu.ops.convectiondiffusiondg import (
    ConvectionDiffusionDG, DGMethod,
)
from dune_pdelab_tpu.solvers import (
    LinearSolverBackend, SEQ_BCGS_Jacobi, StationaryLinearProblemSolver,
)
from dune_pdelab_tpu.space.functions import l2_difference


@pytest.mark.fast
@pytest.mark.parametrize("geometry", ["cube", "simplex"])
@pytest.mark.parametrize("k", [1, 2, 3])
def test_opb_orthonormal(geometry, k):
    fem = OPBFEM(k, 2, geometry)
    qp, qw = quadrature_rule(geometry, 2, 2 * k + 2)
    V, _ = fem.tabulate(qp)
    G = V.T @ (V * qw[:, None])
    assert np.allclose(G, np.eye(fem.nbasis), atol=1e-10)


@pytest.mark.fast
@pytest.mark.parametrize("cls", [MonomialDGFEM, OPBFEM])
def test_modal_projection_reproduces_polynomials(cls):
    """interpolation_matrix is an L2 projection: exact on the span."""
    k = 2
    fem = cls(k, 2, "cube")
    f = lambda p: 1.0 + 2 * p[:, 0] - p[:, 1] + 0.5 * p[:, 0] * p[:, 1] \
        + p[:, 0] ** 2
    coeffs = fem.interpolation_matrix @ f(fem.interpolation_points)
    qp, _ = quadrature_rule("cube", 2, 2 * k)
    V, _ = fem.tabulate(qp)
    assert np.allclose(V @ coeffs, f(qp), atol=1e-10)


class SinCos(ConvectionDiffusionProblem):
    def exact(self, p):
        return np.sin(np.pi * p[:, 0]) * np.cos(2 * np.pi * p[:, 1]) + p[:, 0]

    def f(self, x):
        return 5 * np.pi**2 * jnp.sin(np.pi * x[..., 0]) * jnp.cos(
            2 * np.pi * x[..., 1])

    def g(self, x):
        return jnp.sin(np.pi * x[..., 0]) * jnp.cos(2 * np.pi * x[..., 1]) \
            + x[..., 0]


@pytest.mark.parametrize("cls", [MonomialDGFEM, OPBFEM])
def test_sipg_with_modal_basis_converges(cls):
    """SIPG Poisson on modal total-degree bases: order k+1 in L2
    (testconvectiondiffusiondg.cc analog with OPB/monomial FEMs)."""
    p = SinCos()
    errs = []
    for n in (8, 16):
        mesh = StructuredMesh([0, 0], [1, 1], (n, n))
        V = FunctionSpace(mesh, cls(2, 2, "cube"))
        go = GridOperator(V, ConvectionDiffusionDG(p, method=DGMethod.SIPG))
        slp = StationaryLinearProblemSolver(
            go, SEQ_BCGS_Jacobi(maxiter=20000), reduction=1e-11, verbose=0)
        x = slp.apply(V.zero())
        assert slp.result.converged
        errs.append(float(l2_difference(V, x, p.exact)))
    order = np.log2(errs[0] / errs[1])
    assert order > 2.5, (errs, order)


@pytest.mark.fast
def test_rt1_dof_duality():
    """RT1 basis is unisolvent: dof_i(basis_b) = delta_ib for all 12 dofs
    (face moments {1, 2t-1} + interior moments)."""
    fem = RT1Cube2D()
    M = fem._dofs_of_raw() @ fem._C
    assert np.allclose(M, np.eye(12), atol=1e-10)


@pytest.mark.fast
def test_rt1_div_space():
    """div(RT1) spans Q1: divergence of any member is bilinear."""
    fem = RT1Cube2D()
    rng = np.random.default_rng(0)
    pts = rng.random((20, 2))
    d = fem.tabulate_div(pts)               # (20, 12)
    # fit bilinear 1, x, y, xy on 4 points then check prediction on rest
    A = np.stack([np.ones(20), pts[:, 0], pts[:, 1],
                  pts[:, 0] * pts[:, 1]], axis=1)
    coef, res, *_ = np.linalg.lstsq(A, d, rcond=None)
    assert np.allclose(A @ coef, d, atol=1e-9)


def test_rt1_mixed_darcy_beats_rt0():
    """RT1/Q1DG mixed Darcy: pressure L2 error converges at order 2
    (vs order 1 fields for RT0/P0)."""
    from dune_pdelab_tpu.ops.diffusionmixed import DiffusionMixed

    class P(ConvectionDiffusionProblem):
        def p_exact(self, q):
            return np.sin(np.pi * q[:, 0]) * np.sin(np.pi * q[:, 1])

        def f(self, x):
            return 2 * np.pi**2 * jnp.sin(np.pi * x[..., 0]) * jnp.sin(
                np.pi * x[..., 1])

        def g(self, x):
            return jnp.zeros(x.shape[:-1])

    p = P()
    errs = []
    for n in (8, 16):
        mesh = StructuredMesh([0, 0], [1, 1], (n, n))
        Vu = FunctionSpace(mesh, RT1Cube2D(), name="u")
        Vp = FunctionSpace(mesh, QkDGFEM(1, 2), name="p")
        W = CompositeSpace(Vu, Vp)
        go = GridOperator(W, DiffusionMixed(p))
        ls = LinearSolverBackend(solver="minres", precond="none",
                                 maxiter=40000)
        slp = StationaryLinearProblemSolver(go, ls, reduction=1e-11,
                                            verbose=0)
        x = slp.apply(W.zero())
        assert slp.result.converged
        errs.append(float(l2_difference(Vp, W.restrict(x, 1), p.p_exact)))
    order = np.log2(errs[0] / errs[1])
    assert order > 1.6, (errs, order)
