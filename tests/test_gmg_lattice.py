"""Stencil-resident lattice GMG: mesh-independent preconditioned-CG
iteration counts at O(1) setup memory — the north-star solve path.

Reference analog: ISTL AMG-preconditioned CG as PDELab's scalable backend
(dune/pdelab/backend/istl/seqistlsolverbackend.hh:983 ISTLBackend_SEQ_CG_AMG_SSOR)
driven by StationaryLinearProblemSolver (stationary/linearproblem.hh:182-278).
The oracle is the same as tests/test_multigrid.py: iteration counts must be
flat under refinement and the solution must meet the discretization error.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from dune_pdelab_tpu import (
    StructuredMesh, FunctionSpace, QkFEM, GridOperator, constraints,
    interpolate_dirichlet,
)
from dune_pdelab_tpu.ops import ConvectionDiffusionProblem, ConvectionDiffusionFEM
from dune_pdelab_tpu.assembly.stencil import compile_stencil
from dune_pdelab_tpu.linalg.gmg_lattice import LatticeGMG
from dune_pdelab_tpu.space.functions import l2_difference


class P2(ConvectionDiffusionProblem):
    def exact(self, p):
        return np.sin(np.pi * p[:, 0]) * np.cos(2 * np.pi * p[:, 1]) + p[:, 0]

    def f(self, x):
        return 5 * np.pi**2 * jnp.sin(np.pi * x[..., 0]) * jnp.cos(
            2 * np.pi * x[..., 1])

    def g(self, x):
        return jnp.sin(np.pi * x[..., 0]) * jnp.cos(2 * np.pi * x[..., 1]) \
            + x[..., 0]


class P3(ConvectionDiffusionProblem):
    def exact(self, p):
        return (np.sin(np.pi * p[:, 0]) * np.sin(np.pi * p[:, 1])
                * np.sin(np.pi * p[:, 2]))

    def f(self, x):
        return 3 * np.pi**2 * (jnp.sin(np.pi * x[..., 0])
                               * jnp.sin(np.pi * x[..., 1])
                               * jnp.sin(np.pi * x[..., 2]))

    def g(self, x):
        return jnp.zeros(x.shape[:-1])


def _solve(n, k, dim, problem, tol=1e-10, smoother="chebyshev"):
    p = problem()
    mesh = StructuredMesh([0] * dim, [1] * dim, (n,) * dim)
    fem = QkFEM(k, dim)
    V = FunctionSpace(mesh, fem)
    cg_ = constraints(p.dirichlet_bctype(), V)
    lop = ConvectionDiffusionFEM(p)
    go = GridOperator(V, lop, constraints=cg_)
    st = compile_stencil(go)
    assert st is not None
    gmg = LatticeGMG(V, lop, fine_stencil=st, smoother=smoother)
    solve = gmg.make_solver(tol=tol)
    x0 = interpolate_dirichlet(
        lambda q: np.asarray(p.g(jnp.asarray(q))), V, cg_, V.zero())
    b = -go.residual(x0, 0.0)
    z, stats = solve(b)
    x = x0 + z
    err = float(l2_difference(V, x, lambda q: p.exact(q)))
    return int(stats.iterations), bool(stats.converged), err, gmg


@pytest.mark.fast
def test_lattice_gmg_2d_q1_mesh_independent():
    """CG+LatticeGMG iterations flat under refinement; L2 error O(h^2)."""
    its, errs = [], []
    for n in (16, 32, 64):
        it, conv, err, _ = _solve(n, 1, 2, P2)
        assert conv
        its.append(it)
        errs.append(err)
    assert max(its) <= 9
    assert max(its) - min(its) <= 2
    # O(h^2): each refinement divides the error by ~4
    assert errs[1] < 0.3 * errs[0] and errs[2] < 0.3 * errs[1]


@pytest.mark.fast
def test_lattice_gmg_2d_q2():
    """Residue-class (Q2) stencils through the same V-cycle; O(h^3) error."""
    it16, conv16, err16, _ = _solve(16, 2, 2, P2)
    it32, conv32, err32, _ = _solve(32, 2, 2, P2)
    assert conv16 and conv32
    assert abs(it16 - it32) <= 2 and max(it16, it32) <= 10
    assert err32 < 0.2 * err16


@pytest.mark.fast
def test_lattice_gmg_3d_q1():
    it16, conv16, err16, gmg = _solve(16, 1, 3, P3)
    it32, conv32, err32, _ = _solve(32, 1, 3, P3)
    assert conv16 and conv32
    assert abs(it16 - it32) <= 2 and max(it16, it32) <= 8
    assert err32 < 0.3 * err16
    assert gmg.nlevels >= 3


@pytest.mark.fast
def test_lattice_gmg_jacobi_smoother():
    it, conv, err, _ = _solve(32, 1, 2, P2, smoother="jacobi")
    assert conv and it <= 14


@pytest.mark.fast
def test_lattice_gmg_vcycle_contracts():
    """A single V-cycle contracts an arbitrary error by >= 5x in the
    A-induced sense measured via residual reduction."""
    p = P3()
    mesh = StructuredMesh([0, 0, 0], [1, 1, 1], (16,) * 3)
    V = FunctionSpace(mesh, QkFEM(1, 3))
    cg_ = constraints(p.dirichlet_bctype(), V)
    lop = ConvectionDiffusionFEM(p)
    go = GridOperator(V, lop, constraints=cg_)
    st = compile_stencil(go)
    gmg = LatticeGMG(V, lop, fine_stencil=st)
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal(V.ndofs))
    b = jnp.where(st.mask, 0.0, b)
    z = gmg.apply(b)
    r1 = b - st(z)
    assert float(jnp.linalg.norm(r1)) < 0.2 * float(jnp.linalg.norm(b))


@pytest.mark.fast
def test_lattice_gmg_matches_gridoperator_solution():
    """The stencil solve equals a general-path assembled solve on the same
    system (iteration parity with the generic GMG path not required; the
    SOLUTION must agree to solver tolerance)."""
    from dune_pdelab_tpu import StationaryLinearProblemSolver
    from dune_pdelab_tpu.solvers import LinearSolverBackend
    p = P2()
    mesh = StructuredMesh([0, 0], [1, 1], (24, 24))
    V = FunctionSpace(mesh, QkFEM(1, 2))
    cg_ = constraints(p.dirichlet_bctype(), V)
    lop = ConvectionDiffusionFEM(p)
    go = GridOperator(V, lop, constraints=cg_)
    x0 = interpolate_dirichlet(
        lambda q: np.asarray(p.g(jnp.asarray(q))), V, cg_, V.zero())
    # general path
    ls = LinearSolverBackend(solver="cg", precond="jacobi", maxiter=4000)
    slp = StationaryLinearProblemSolver(go, ls, reduction=1e-12, verbose=0)
    x_ref = slp.apply(x0)
    # lattice path
    st = compile_stencil(go)
    gmg = LatticeGMG(V, lop, fine_stencil=st)
    z, stats = gmg.make_solver(tol=1e-12)(-go.residual(x0, 0.0))
    assert bool(stats.converged)
    assert float(jnp.max(jnp.abs((x0 + z) - x_ref))) < 1e-8
