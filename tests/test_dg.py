"""SIPG/NIPG DG tests (testconvectiondiffusiondg analog, reference:
dune/pdelab/test/testconvectiondiffusiondg.cc): convergence orders,
SIPG symmetry, upwinded convection solve with BiCGStab."""
import numpy as np
import jax.numpy as jnp
import pytest

from dune_pdelab_tpu import StructuredMesh, FunctionSpace, GridOperator
from dune_pdelab_tpu.fe import QkDGFEM
from dune_pdelab_tpu.ops import ConvectionDiffusionProblem
from dune_pdelab_tpu.ops.convectiondiffusiondg import (
    ConvectionDiffusionDG, DGMethod,
)
from dune_pdelab_tpu.solvers import (
    StationaryLinearProblemSolver, SEQ_BCGS_Jacobi, SEQ_CG_BlockJacobi,
)
from dune_pdelab_tpu.space.functions import l2_difference


class SinCos(ConvectionDiffusionProblem):
    def exact(self, p):
        return np.sin(np.pi * p[:, 0]) * np.cos(2 * np.pi * p[:, 1]) + p[:, 0]

    def f(self, x):
        return 5 * np.pi**2 * jnp.sin(np.pi * x[..., 0]) * jnp.cos(
            2 * np.pi * x[..., 1])

    def g(self, x):
        return jnp.sin(np.pi * x[..., 0]) * jnp.cos(2 * np.pi * x[..., 1]) \
            + x[..., 0]


def _solve_dg(p, n, k, method=DGMethod.SIPG, solver=None):
    mesh = StructuredMesh([0, 0], [1, 1], (n, n))
    V = FunctionSpace(mesh, QkDGFEM(k, 2))
    lop = ConvectionDiffusionDG(p, method=method)
    go = GridOperator(V, lop)
    ls = solver or SEQ_BCGS_Jacobi()
    slp = StationaryLinearProblemSolver(go, ls, reduction=1e-11, verbose=0)
    return V, slp.apply(V.zero()), slp


@pytest.mark.parametrize("k,min_order", [(1, 1.8), (2, 2.8)])
def test_sipg_convergence(k, min_order):
    p = SinCos()
    errs = []
    for n in (8, 16, 32):
        V, x, _ = _solve_dg(p, n, k)
        errs.append(float(l2_difference(V, x, p.exact)))
    orders = [np.log2(errs[i] / errs[i + 1]) for i in range(len(errs) - 1)]
    assert orders[-1] > min_order, (errs, orders)


def test_sipg_linear_patch():
    """Linear exact solution lies in the Q1DG space -> reproduced exactly
    (consistency of all face terms)."""
    class P(ConvectionDiffusionProblem):
        def exact(self, p):
            return 2 * p[:, 0] - 3 * p[:, 1] + 1

        def f(self, x):
            return jnp.zeros(x.shape[:-1])

        def g(self, x):
            return 2 * x[..., 0] - 3 * x[..., 1] + 1

    p = P()
    V, x, _ = _solve_dg(p, 5, 1)
    assert float(l2_difference(V, x, p.exact)) < 1e-9


def test_sipg_symmetric_nipg_not():
    p = SinCos()
    mesh = StructuredMesh([0, 0], [1, 1], (4, 4))
    V = FunctionSpace(mesh, QkDGFEM(1, 2))
    for method, sym in ((DGMethod.SIPG, True), (DGMethod.NIPG, False)):
        go = GridOperator(V, ConvectionDiffusionDG(p, method=method))
        A = np.asarray(go.jacobian(V.zero()).todense())
        is_sym = np.allclose(A, A.T, atol=1e-10)
        assert is_sym == sym, method


def test_dg_block_jacobi_preconditioner():
    """Element-block Jacobi is exact block inverse for DG -> fewer CG
    iterations than point Jacobi (matrix-free block preconditioner analog,
    reference: dune/pdelab/backend/istl/matrixfree/)."""
    p = SinCos()
    _, _, slp_pt = _solve_dg(p, 16, 2, solver=SEQ_BCGS_Jacobi())
    _, _, slp_bj = _solve_dg(p, 16, 2,
                             solver=SEQ_CG_BlockJacobi(solver="bicgstab"))
    assert slp_bj.result.converged and slp_pt.result.converged
    assert (slp_bj.result.linear_solver_iterations
            < slp_pt.result.linear_solver_iterations)


def test_dg_upwind_convection():
    """Convection-dominated problem solves stably with upwinding."""
    class P(ConvectionDiffusionProblem):
        def A(self, x):
            return 0.01

        def b(self, x):
            return jnp.broadcast_to(jnp.array([1.0, 0.0]), x.shape)

        def f(self, x):
            return jnp.ones(x.shape[:-1])

    p = P()
    V, x, slp = _solve_dg(p, 16, 1)
    assert slp.result.converged
    # solution bounded (no oscillation blowup)
    assert float(jnp.max(jnp.abs(x))) < 10.0


def test_dg_colored_block_gs_beats_block_jacobi():
    """Colored multiplicative block sweeps beat additive block Jacobi
    (blocksorpreconditioner.hh + colored.hh analog)."""
    from dune_pdelab_tpu.solvers import LinearSolverBackend
    p = SinCos()
    _, _, slp_bj = _solve_dg(p, 16, 2, solver=LinearSolverBackend(
        solver="bicgstab", precond="block_jacobi"))
    _, _, slp_gs = _solve_dg(p, 16, 2, solver=LinearSolverBackend(
        solver="bicgstab", precond="block_gs"))
    assert slp_gs.result.converged
    assert (slp_gs.result.linear_solver_iterations
            < slp_bj.result.linear_solver_iterations), (
        slp_bj.result.linear_solver_iterations,
        slp_gs.result.linear_solver_iterations)


def test_face_slab_transfer_matches_index_path():
    """Slab-slice DG face transfers == index-array transfers, including the
    periodic roll case."""
    import jax.numpy as jnp
    from dune_pdelab_tpu.ops.convectiondiffusion import ConvectionDiffusionProblem

    class P(ConvectionDiffusionProblem):
        def b(self, x):
            return jnp.broadcast_to(jnp.array([1.0, -0.5]), x.shape)

        def f(self, x):
            return jnp.sin(3 * x[..., 0]) + x[..., 1]

    for periodic in ((False, False), (True, True), (True, False)):
        mesh = StructuredMesh([0, 0], [1, 1], (5, 4), periodic=periodic)
        V = FunctionSpace(mesh, QkDGFEM(1, 2))
        go_fast = GridOperator(V, ConvectionDiffusionDG(P()))
        go_idx = GridOperator(V, ConvectionDiffusionDG(P()),
                              face_transfer="index")
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal(V.ndofs))
        r1 = go_fast.residual(x)
        r2 = go_idx.residual(x)
        assert float(jnp.linalg.norm(r1 - r2)) < 1e-12, periodic


def test_sipg_full_tensor_adjoint_consistency():
    """Full (non-diagonal) diffusion tensor A: SIPG stays adjoint-consistent
    only with the EXACT {A grad v}·n symmetrization term
    (convectiondiffusiondg.hh:319-331); the n·An projection loses an order.
    Oracle: L2 order ~ k+1 for k=2."""
    class Aniso(ConvectionDiffusionProblem):
        def A(self, x):
            A = jnp.array([[2.0, 0.5], [0.5, 1.0]])
            return jnp.broadcast_to(A, x.shape[:-1] + (2, 2))

        def exact(self, p):
            return np.sin(np.pi * p[:, 0]) * np.cos(2 * np.pi * p[:, 1]) \
                + p[:, 0]

        def f(self, x):
            s = jnp.sin(np.pi * x[..., 0]) * jnp.cos(2 * np.pi * x[..., 1])
            c = jnp.cos(np.pi * x[..., 0]) * jnp.sin(2 * np.pi * x[..., 1])
            return 6 * np.pi**2 * s + 2 * np.pi**2 * c

        def g(self, x):
            return jnp.sin(np.pi * x[..., 0]) * jnp.cos(2 * np.pi * x[..., 1]) \
                + x[..., 0]

    p = Aniso()
    errs = []
    for n in (8, 16, 32):
        V, x, slp = _solve_dg(p, n, 2)
        assert slp.result.converged
        errs.append(float(l2_difference(V, x, p.exact)))
    orders = [np.log2(errs[i] / errs[i + 1]) for i in range(len(errs) - 1)]
    assert orders[-1] > 2.7, (errs, orders)
