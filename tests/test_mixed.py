"""Mixed Darcy (RT0/P0, BDM1/P0) tests: local conservation, convergence,
H(div) basis sanity (reference analogs: diffusionmixed.hh usage +
rt0 finite element maps)."""
import numpy as np
import jax.numpy as jnp
import pytest

from dune_pdelab_tpu import StructuredMesh, FunctionSpace, GridOperator, CompositeSpace
from dune_pdelab_tpu.fe import P0FEM
from dune_pdelab_tpu.fe.hdiv import RT0Cube, BDM1Cube
from dune_pdelab_tpu.ops import ConvectionDiffusionProblem
from dune_pdelab_tpu.ops.diffusionmixed import DiffusionMixed
from dune_pdelab_tpu.solvers import LinearSolverBackend
from dune_pdelab_tpu.solvers.stationary import StationaryLinearProblemSolver


def test_rt0_basis_flux_duality():
    fem = RT0Cube(2)
    # unit outward.. +axis flux on own face, zero on others
    from dune_pdelab_tpu.fe.quadrature import gauss_legendre
    xq, wq = gauss_legendre(3)
    for a in range(2):
        for s in (0, 1):
            pts = np.zeros((len(xq), 2))
            pts[:, a] = s
            pts[:, 1 - a] = xq
            v = fem.tabulate_vector(pts)      # (q, nb, 2)
            flux = np.einsum("q,qb->b", wq, v[:, :, a])
            expect = np.zeros(4)
            expect[2 * a + s] = 1.0
            assert np.allclose(flux, expect, atol=1e-12)


def test_bdm1_dof_duality():
    fem = BDM1Cube(2)
    V = fem.tabulate_vector(np.array([[0.3, 0.7]]))
    assert V.shape == (1, 8, 2)
    # divergence of the curl-enriched functions is linear at most
    d = fem.tabulate_div(np.random.default_rng(0).random((5, 2)))
    assert d.shape == (5, 8)


class P(ConvectionDiffusionProblem):
    """-div grad p = f, p = sin(pi x) sin(pi y), full Dirichlet."""

    def p_exact(self, q):
        return np.sin(np.pi * q[:, 0]) * np.sin(np.pi * q[:, 1])

    def f(self, x):
        return 2 * np.pi**2 * jnp.sin(np.pi * x[..., 0]) * jnp.sin(
            np.pi * x[..., 1])

    def g(self, x):
        return jnp.zeros(x.shape[:-1])


def _solve_mixed(n, uel=None):
    mesh = StructuredMesh([0, 0], [1, 1], (n, n))
    Vu = FunctionSpace(mesh, uel or RT0Cube(2), name="u")
    Vp = FunctionSpace(mesh, P0FEM(2), name="p")
    W = CompositeSpace(Vu, Vp)
    p = P()
    go = GridOperator(W, DiffusionMixed(p))
    ls = LinearSolverBackend(solver="minres", precond="none", maxiter=20000)
    slp = StationaryLinearProblemSolver(go, ls, reduction=1e-11, verbose=0)
    x = slp.apply(W.zero())
    return mesh, W, Vu, Vp, x, slp, p


def test_mixed_darcy_convergence():
    errs = []
    for n in (8, 16):
        mesh, W, Vu, Vp, x, slp, p = _solve_mixed(n)
        assert slp.result.converged
        xp = np.asarray(W.restrict(x, 1))
        centers = mesh.element_centers()
        errs.append(np.sqrt(np.mean((xp - p.p_exact(centers)) ** 2)))
    order = np.log2(errs[0] / errs[1])
    assert order > 1.5, (errs, order)  # cell-center superconvergence of RT0


def test_mixed_darcy_local_conservation():
    """div u = f elementwise (the point of mixed methods): the p-block
    residual rows vanish at the solution => per-element flux balance."""
    mesh, W, Vu, Vp, x, slp, p = _solve_mixed(8)
    go = GridOperator(W, DiffusionMixed(p))
    r = go.residual(x)
    rp = np.asarray(W.restrict(r, 1))
    assert np.max(np.abs(rp)) < 1e-9


def test_mixed_rt0_interface_continuity():
    """Normal flux DOFs are shared between neighbors: assembled operator is
    symmetric and the u-u block is a mass matrix (SPD on its block)."""
    mesh, W, Vu, Vp, x, slp, p = _solve_mixed(4)
    go = GridOperator(W, DiffusionMixed(p))
    A = np.asarray(go.jacobian(W.zero()).todense())
    assert np.allclose(A, A.T, atol=1e-11)
    nu = Vu.ndofs
    eig = np.linalg.eigvalsh(A[:nu, :nu])
    assert eig.min() > 0
