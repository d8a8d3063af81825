"""Sparse direct backend (SuperLU analog) — solution parity with Krylov,
Newton integration, and the factorization-reuse contract (reference:
dune/pdelab/backend/istl/seqistlsolverbackend.hh:983 ISTLBackend_SEQ_SuperLU,
dune/pdelab/solver/newton.hh:98-120 reassemble threshold)."""
import numpy as np
import jax.numpy as jnp
import pytest

from dune_pdelab_tpu import (
    StructuredMesh, FunctionSpace, QkFEM, GridOperator, constraints,
    NewtonMethod, StationaryLinearProblemSolver,
)
from dune_pdelab_tpu.ops import (
    ConvectionDiffusionProblem, ConvectionDiffusionFEM,
)
from dune_pdelab_tpu.solvers import (
    SEQ_SuperLU, SEQ_UMFPack, SEQ_CG_Jacobi, SparseLU,
)

pytestmark = pytest.mark.fast


class PoissonProblem(ConvectionDiffusionProblem):
    def f(self, x):
        return jnp.ones(x.shape[:-1], x.dtype)


def _poisson(n=24, k=1):
    mesh = StructuredMesh([0, 0], [1, 1], (n, n))
    V = FunctionSpace(mesh, QkFEM(k, 2))
    prob = PoissonProblem()
    cgm = constraints(prob.dirichlet_bctype(), V)
    return V, GridOperator(V, ConvectionDiffusionFEM(prob), constraints=cgm)


def test_direct_matches_cg():
    V, go = _poisson()
    x_d = StationaryLinearProblemSolver(go, SEQ_SuperLU(),
                                        reduction=1e-12).apply(V.zero())
    x_k = StationaryLinearProblemSolver(go, SEQ_CG_Jacobi(maxiter=5000),
                                        reduction=1e-13).apply(V.zero())
    assert float(jnp.max(jnp.abs(x_d - x_k))) < 1e-9


def test_direct_reports_machine_precision_defect():
    V, go = _poisson()
    backend = SEQ_UMFPack()
    s = StationaryLinearProblemSolver(go, backend, reduction=1e-12)
    s.apply(V.zero())
    stats = backend.stats_history[-1]
    assert bool(stats.converged)
    assert float(stats.defect) < 1e-10 * max(float(stats.defect0), 1.0)


def test_direct_q2_spectral_accuracy():
    # Q2 on a manufactured problem: direct solve reproduces the Galerkin
    # solution to factorization precision (no iteration error at all)
    V, go = _poisson(n=12, k=2)
    x = StationaryLinearProblemSolver(go, SEQ_SuperLU(),
                                      reduction=1e-12).apply(V.zero())
    r = go.residual(x)
    mask = go.cg.mask
    assert float(jnp.max(jnp.abs(jnp.where(mask, 0.0, r)))) < 1e-11


def test_direct_in_newton_with_reuse():
    from dune_pdelab_tpu.ops.base import LocalOperator

    class Nonlin(LocalOperator):
        def alpha_volume(self, ctx, u):
            tab = ctx.tab
            gu = self.gradient_at_qp(tab, u)
            uq = self.value_at_qp(tab, u)
            return (self.accumulate_gradient(tab, ctx.factor, gu)
                    + self.accumulate_value(tab, ctx.factor, uq ** 3 - 1.0))

    mesh = StructuredMesh([0, 0], [1, 1], (10, 10))
    V = FunctionSpace(mesh, QkFEM(1, 2))
    cgm = constraints(True, V)
    go = GridOperator(V, Nonlin(), constraints=cgm)
    backend = SEQ_SuperLU()
    newton = NewtonMethod(go, backend, reduction=1e-10,
                          reassemble_threshold=0.0)
    x = newton.apply(V.zero())
    assert newton.result.converged
    r = go.residual(x)
    assert float(jnp.max(jnp.abs(jnp.where(go.cg.mask, 0.0, r)))) < 1e-9

    # chord-method reuse: one factorization, still converges
    backend2 = SEQ_SuperLU()
    newton2 = NewtonMethod(go, backend2, reduction=1e-10,
                           reassemble_threshold=1.0, max_iterations=60,
                           line_search="none")
    newton2.apply(V.zero())
    assert newton2.result.converged
    assert len(backend2._cache) == 1


def test_sparse_lu_on_dense_and_bcoo():
    rng = np.random.default_rng(3)
    n = 40
    a = np.eye(n) * 4.0 + rng.standard_normal((n, n)) * 0.1
    b = rng.standard_normal(n)
    lu = SparseLU(jnp.asarray(a))
    z = np.asarray(lu.solve(jnp.asarray(b)))
    assert np.linalg.norm(a @ z - b) < 1e-10 * np.linalg.norm(b)
