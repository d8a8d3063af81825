"""RT0/BDM1 on simplices + mixed Darcy on triangulated meshes (reference:
dune/pdelab/finiteelementmap/{rt0simplex2dfem.hh,bdm1simplex2dfem.hh},
constraints/raviartthomas0.hh orientation). Oracles: reference-element
unisolvence, global H(div) conformity (symmetric assembled operator, SPD
mass block), local conservation, and convergence."""
import numpy as np
import jax.numpy as jnp
import pytest

from dune_pdelab_tpu import (
    StructuredMesh, FunctionSpace, GridOperator, CompositeSpace,
)
from dune_pdelab_tpu.mesh import SimplexMesh
from dune_pdelab_tpu.fe import P0FEM
from dune_pdelab_tpu.fe.hdiv import RT0Simplex2D, BDM1Simplex2D
from dune_pdelab_tpu.ops import ConvectionDiffusionProblem
from dune_pdelab_tpu.ops.diffusionmixed import DiffusionMixed
from dune_pdelab_tpu.solvers import LinearSolverBackend
from dune_pdelab_tpu.solvers.stationary import StationaryLinearProblemSolver


@pytest.mark.fast
def test_rt0_simplex_unisolvence():
    """Total outward flux of psi_l through edge m == delta_lm."""
    fem = RT0Simplex2D()
    from dune_pdelab_tpu.fe.quadrature import gauss_legendre
    xq, wq = gauss_legendre(4)
    verts = fem._verts
    edges = [(1, 2), (0, 2), (0, 1)]
    normals = np.array([[1, 1] / np.sqrt(2), [0, -1], [-1, 0]], float)
    M = np.zeros((3, 3))
    for l, (a, b) in enumerate(edges):
        va, vb = verts[a], verts[b]
        elen = np.linalg.norm(vb - va)
        pts = va[None] + xq[:, None] * (vb - va)[None]
        v = fem.tabulate_vector(pts)
        M[l] = (wq * elen) @ np.einsum("qbd,d->qb", v, normals[l])
    assert np.allclose(M, np.eye(3), atol=1e-12)
    # div psi = 2 everywhere (constant)
    assert np.allclose(fem.tabulate_div(np.array([[0.3, 0.2]])), 2.0)


@pytest.mark.fast
def test_bdm1_simplex_unisolvence():
    fem = BDM1Simplex2D()
    M = fem._dof_matrix() @ fem._C
    assert np.allclose(M, np.eye(6), atol=1e-10)


class P(ConvectionDiffusionProblem):
    """-div grad p = f, p = sin(pi x) sin(pi y), full Dirichlet."""

    def p_exact(self, q):
        return np.sin(np.pi * q[:, 0]) * np.sin(np.pi * q[:, 1])

    def f(self, x):
        return 2 * np.pi**2 * jnp.sin(np.pi * x[..., 0]) * jnp.sin(
            np.pi * x[..., 1])

    def g(self, x):
        return jnp.zeros(x.shape[:-1])


def _solve_mixed_simplex(n, uel):
    sm = SimplexMesh.from_structured(StructuredMesh([0, 0], [1, 1], (n, n)))
    Vu = FunctionSpace(sm, uel, name="u")
    Vp = FunctionSpace(sm, P0FEM(2, geometry="simplex"), name="p")
    W = CompositeSpace(Vu, Vp)
    p = P()
    go = GridOperator(W, DiffusionMixed(p))
    ls = LinearSolverBackend(solver="minres", precond="none", maxiter=40000)
    slp = StationaryLinearProblemSolver(go, ls, reduction=1e-11, verbose=0)
    x = slp.apply(W.zero())
    return sm, W, Vu, Vp, x, slp, p, go


@pytest.mark.parametrize("uel", [RT0Simplex2D, BDM1Simplex2D])
def test_mixed_simplex_operator_symmetric(uel):
    """Orientation signs produce a globally H(div)-conforming space: the
    assembled saddle operator is symmetric, u-u block SPD."""
    sm, W, Vu, Vp, x, slp, p, go = _solve_mixed_simplex(3, uel())
    A = np.asarray(go.jacobian(W.zero()).todense())
    assert np.allclose(A, A.T, atol=1e-10)
    nu = Vu.ndofs
    eig = np.linalg.eigvalsh(A[:nu, :nu])
    assert eig.min() > 0


@pytest.mark.parametrize("uel", [RT0Simplex2D, BDM1Simplex2D])
def test_mixed_simplex_local_conservation(uel):
    sm, W, Vu, Vp, x, slp, p, go = _solve_mixed_simplex(6, uel())
    assert slp.result.converged
    r = go.residual(x)
    rp = np.asarray(W.restrict(r, 1))
    assert np.max(np.abs(rp)) < 1e-8


def test_mixed_simplex_rt0_convergence():
    errs = []
    for n in (4, 8):
        sm, W, Vu, Vp, x, slp, p, go = _solve_mixed_simplex(n, RT0Simplex2D())
        assert slp.result.converged
        xp = np.asarray(W.restrict(x, 1))
        centers = sm.element_centers()
        errs.append(np.sqrt(np.mean((xp - p.p_exact(centers)) ** 2)))
    order = np.log2(errs[0] / errs[1])
    assert order > 0.9, (errs, order)


@pytest.mark.fast
def test_rt0_simplex3d_unisolvence():
    """Tet RT0: total outward flux of psi_l through face m == delta_lm."""
    from dune_pdelab_tpu.fe.hdiv import RT0Simplex3D
    from dune_pdelab_tpu.fe.quadrature import quadrature_rule

    fem = RT0Simplex3D()
    verts = fem._verts
    qp, qw = quadrature_rule("simplex", 2, 4)      # rule on ref triangle
    lam = np.concatenate([1 - qp.sum(axis=1, keepdims=True), qp], axis=1)
    M = np.zeros((4, 4))
    for l in range(4):
        fverts = verts[[v for v in range(4) if v != l]]      # (3, 3)
        pts = lam @ fverts
        e1, e2 = fverts[1] - fverts[0], fverts[2] - fverts[0]
        n = np.cross(e1, e2)
        area2 = np.linalg.norm(n)                  # = 2 * |face|
        n = n / area2
        if np.dot(n, fverts[0] - verts[l]) < 0:
            n = -n
        dens = area2                                # |d x / d ref-face|
        v = fem.tabulate_vector(pts)               # (q, 4, 3)
        M[l] = (qw * dens) @ np.einsum("qbd,d->qb", v, n)
    assert np.allclose(M, np.eye(4), atol=1e-12)


def test_mixed_simplex3d_rt0():
    """3D tet mixed Darcy: symmetric operator, local conservation."""
    from dune_pdelab_tpu.fe.hdiv import RT0Simplex3D

    class P3(ConvectionDiffusionProblem):
        def f(self, x):
            return jnp.ones(x.shape[:-1], x.dtype)

        def g(self, x):
            return jnp.zeros(x.shape[:-1])

    sm = SimplexMesh.from_structured(StructuredMesh([0, 0, 0], [1, 1, 1],
                                                    (2, 2, 2)))
    Vu = FunctionSpace(sm, RT0Simplex3D(), name="u")
    Vp = FunctionSpace(sm, P0FEM(3, geometry="simplex"), name="p")
    W = CompositeSpace(Vu, Vp)
    go = GridOperator(W, DiffusionMixed(P3()))
    A = np.asarray(go.jacobian(W.zero()).todense())
    assert np.allclose(A, A.T, atol=1e-10)
    nu = Vu.ndofs
    eig = np.linalg.eigvalsh(A[:nu, :nu])
    assert eig.min() > 0
    ls = LinearSolverBackend(solver="minres", precond="none", maxiter=40000)
    slp = StationaryLinearProblemSolver(go, ls, reduction=1e-10, verbose=0)
    x = slp.apply(W.zero())
    assert slp.result.converged
    r = go.residual(x)
    rp = np.asarray(W.restrict(r, 1))
    assert np.max(np.abs(rp)) < 1e-8
