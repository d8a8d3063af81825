"""Higher-order Raviart-Thomas: RT2 on cubes (rt2cube2dfem.hh analog,
general RTk construction) and RT1 on simplices (rt1simplex2dfem.hh analog).
Oracles: unisolvency, divergence-space exactness, and mixed-Darcy pressure
convergence at order k+1 (reference: dune/pdelab/finiteelementmap/
raviartthomasfem.hh family)."""
import numpy as np
import jax.numpy as jnp
import pytest

from dune_pdelab_tpu import (
    StructuredMesh, FunctionSpace, CompositeSpace, GridOperator,
    StationaryLinearProblemSolver,
)
from dune_pdelab_tpu.fe.basis import QkDGFEM, PkDGFEM
from dune_pdelab_tpu.fe.hdiv import RTkCube2D, RT2Cube2D, RT1Simplex2D
from dune_pdelab_tpu.mesh.simplex import SimplexMesh
from dune_pdelab_tpu.ops import ConvectionDiffusionProblem
from dune_pdelab_tpu.ops.diffusionmixed import DiffusionMixed
from dune_pdelab_tpu.solvers import LinearSolverBackend
from dune_pdelab_tpu.space.functions import l2_difference

pytestmark = pytest.mark.fast


class P(ConvectionDiffusionProblem):
    def p_exact(self, q):
        return np.sin(np.pi * q[:, 0]) * np.sin(np.pi * q[:, 1])

    def f(self, x):
        return 2 * np.pi**2 * jnp.sin(np.pi * x[..., 0]) * jnp.sin(
            np.pi * x[..., 1])

    def g(self, x):
        return jnp.zeros(x.shape[:-1])


@pytest.mark.parametrize("k", [1, 2, 3])
def test_rtk_cube_unisolvent(k):
    el = RTkCube2D(k)
    M = el._dof_matrix() @ el._C
    assert np.abs(M - np.eye(el.nbasis)).max() < 1e-9


def test_rt2_div_is_q2():
    """div(RT2) = Q2: divergence of every basis member fits a biquadratic."""
    el = RT2Cube2D()
    rng = np.random.default_rng(5)
    pts = rng.uniform(0, 1, (30, 2))
    d = el.tabulate_div(pts)
    A = np.stack([pts[:, 0]**i * pts[:, 1]**j
                  for i in range(3) for j in range(3)], axis=1)
    coef, *_ = np.linalg.lstsq(A, d, rcond=None)
    assert np.allclose(A @ coef, d, atol=1e-8)


def test_rt1_simplex_unisolvent():
    el = RT1Simplex2D()
    M = el._dof_matrix() @ el._C
    assert np.abs(M - np.eye(8)).max() < 1e-10


def test_rt1_simplex_normal_trace_linear():
    """Normal trace of RT1 on each edge is a full P1(t): both edge moments
    of every basis function are reproduced and interior functions have zero
    normal trace."""
    el = RT1Simplex2D()
    # edge 2 (opposite vertex 2) from (0,0) to (0,1): normal (-1, 0)
    t = np.linspace(0.05, 0.95, 7)
    pts = np.stack([np.zeros_like(t), t], axis=1)
    v = el.tabulate_vector(pts)
    vn = -v[:, :, 0]
    # interior basis functions (#6, #7) have zero normal trace on edges
    assert np.abs(vn[:, 6:]).max() < 1e-10
    # basis 4 (edge-2 even moment) integrates to 1, basis 5 odd to 0
    w = np.polynomial.legendre.leggauss(7)
    xq = 0.5 * (w[0] + 1.0)
    wq = 0.5 * w[1]
    pq = np.stack([np.zeros_like(xq), xq], axis=1)
    vq = -el.tabulate_vector(pq)[:, :, 0]
    m0 = wq @ vq
    m1 = (wq * (2 * xq - 1)) @ vq
    assert abs(m0[4] - 1) < 1e-10 and abs(m1[4]) < 1e-10
    assert abs(m0[5]) < 1e-10 and abs(m1[5] - 1) < 1e-10


def test_rt2_mixed_darcy_order3():
    """RT2/Q2DG mixed Darcy: pressure converges at order 3."""
    p = P()
    errs = []
    for n in (4, 8):
        mesh = StructuredMesh([0, 0], [1, 1], (n, n))
        Vu = FunctionSpace(mesh, RT2Cube2D(), name="u")
        Vp = FunctionSpace(mesh, QkDGFEM(2, 2), name="p")
        W = CompositeSpace(Vu, Vp)
        go = GridOperator(W, DiffusionMixed(p))
        ls = LinearSolverBackend(solver="minres", precond="none",
                                 maxiter=60000)
        slp = StationaryLinearProblemSolver(go, ls, reduction=1e-12,
                                            verbose=0)
        x = slp.apply(W.zero())
        assert slp.result.converged
        errs.append(float(l2_difference(Vp, W.restrict(x, 1), p.p_exact)))
    order = np.log2(errs[0] / errs[1])
    assert order > 2.5, (errs, order)


def test_rt1_simplex_mixed_darcy_order2():
    """RT1/P1DG on triangles: pressure converges at order 2 (vs order 1
    for RT0/P0) — the rt1simplex2dfem.hh value proposition."""
    p = P()
    errs = []
    for n in (4, 8):
        sm = SimplexMesh.from_structured(
            StructuredMesh([0, 0], [1, 1], (n, n)))
        Vu = FunctionSpace(sm, RT1Simplex2D(), name="u")
        Vp = FunctionSpace(sm, PkDGFEM(1, 2), name="p")
        W = CompositeSpace(Vu, Vp)
        go = GridOperator(W, DiffusionMixed(p))
        ls = LinearSolverBackend(solver="minres", precond="none",
                                 maxiter=60000)
        slp = StationaryLinearProblemSolver(go, ls, reduction=1e-12,
                                            verbose=0)
        x = slp.apply(W.zero())
        assert slp.result.converged
        errs.append(float(l2_difference(Vp, W.restrict(x, 1), p.p_exact)))
    order = np.log2(errs[0] / errs[1])
    assert order > 1.6, (errs, order)


def test_rt1_simplex_saddle_symmetric():
    sm = SimplexMesh.from_structured(StructuredMesh([0, 0], [1, 1], (3, 3)))
    Vu = FunctionSpace(sm, RT1Simplex2D(), name="u")
    Vp = FunctionSpace(sm, PkDGFEM(1, 2), name="p")
    W = CompositeSpace(Vu, Vp)
    go = GridOperator(W, DiffusionMixed(P()))
    A = np.asarray(go.jacobian(W.zero()).todense())
    assert np.allclose(A, A.T, atol=1e-9)
    nu = Vu.ndofs
    eig = np.linalg.eigvalsh(A[:nu, :nu])
    assert eig.min() > 0
