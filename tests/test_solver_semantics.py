"""Solver-driver semantics: Jacobian reuse, failed-step handling, GMG setup
caching (reference: dune/pdelab/solver/newton.hh:98-120 prepareStep,
instationary/implicitonestep.hh:210-233 failed-step accounting)."""
import numpy as np
import jax.numpy as jnp
import pytest

from dune_pdelab_tpu import (
    StructuredMesh, FunctionSpace, QkFEM, GridOperator, constraints,
    NewtonMethod,
)
from dune_pdelab_tpu.ops.base import LocalOperator
from dune_pdelab_tpu.solvers import SEQ_CG_Jacobi
from dune_pdelab_tpu.solvers.newton import NewtonError
from dune_pdelab_tpu.space.functions import l2_difference


class NonlinearProblem(LocalOperator):
    """-lap u + u^3 = f, manufactured u = sin(pi x) sin(pi y)."""

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


def _setup():
    lop = NonlinearProblem()
    mesh = StructuredMesh([0, 0], [1, 1], (12, 12))
    V = FunctionSpace(mesh, QkFEM(1, 2))
    cg_ = constraints(True, V)
    return V, GridOperator(V, lop, constraints=cg_)


def test_reassemble_threshold_counts_assemblies():
    V, go = _setup()
    # threshold 0: re-linearize every step
    n0 = NewtonMethod(go, SEQ_CG_Jacobi(), reduction=1e-9, verbose=0,
                      reassemble_threshold=0.0)
    x0 = n0.apply(V.zero())
    assert n0.result.converged
    assert n0.result.assemblies == n0.result.iterations

    # threshold 1.0: never re-linearize after the first (chord method)
    n1 = NewtonMethod(go, SEQ_CG_Jacobi(), reduction=1e-9, verbose=0,
                      reassemble_threshold=1.0, max_iterations=60,
                      line_search="none")
    x1 = n1.apply(V.zero())
    assert n1.result.converged
    assert n1.result.assemblies == 1
    # chord method converges linearly -> more iterations than full Newton
    assert n1.result.iterations >= n0.result.iterations
    # both reach the same solution
    assert float(jnp.linalg.norm(x1 - x0)) < 1e-6 * float(
        jnp.linalg.norm(x0))


def test_failed_step_handling_books_and_retries():
    """Driver semantics (deterministic, synthetic failures): a failing
    stage solve books failed_steps, halves dt, and retries from the
    pre-step state; with retries exhausted the error propagates
    (reference: implicitonestep.hh:210-233)."""
    from dune_pdelab_tpu.instationary import OneStepMethod
    from dune_pdelab_tpu.instationary.tableaux import implicit_euler
    from dune_pdelab_tpu.ops import (
        ConvectionDiffusionProblem, ConvectionDiffusionFEM,
    )
    from dune_pdelab_tpu.ops.l2 import L2

    class Heat(ConvectionDiffusionProblem):
        pass

    mesh = StructuredMesh([0, 0], [1, 1], (8, 8))
    V = FunctionSpace(mesh, QkFEM(1, 2))
    p = Heat()
    cg_ = constraints(p.dirichlet_bctype(), V)
    go0 = GridOperator(V, ConvectionDiffusionFEM(p), constraints=cg_)
    go1 = GridOperator(V, L2(), constraints=cg_)
    x0 = V.interpolate(lambda q: np.sin(np.pi * q[:, 0])
                       * np.sin(np.pi * q[:, 1]))

    def make(fail_first_n):
        osm = OneStepMethod(implicit_euler(), go0, go1, SEQ_CG_Jacobi(),
                            pdesolver="newton", verbose=0, reduction=1e-10)
        calls = {"n": 0}
        orig = osm.pdesolver.apply

        def flaky(x, time=0.0):
            calls["n"] += 1
            if calls["n"] <= fail_first_n:
                raise NewtonError("synthetic stage failure")
            return orig(x, time=time)

        osm.pdesolver.apply = flaky
        return osm, calls

    osm, calls = make(fail_first_n=2)
    t, x = osm.solve(0.0, 0.4, 0.4, x0, max_step_retries=3)
    # two failures booked; the surviving first step ran at dt/4 = 0.1,
    # then the march continues to tend
    assert osm.result.failed_steps == 2
    assert t >= 0.4 - 1e-12
    assert np.isfinite(float(jnp.linalg.norm(x)))

    # retries exhausted -> the error propagates, failures still booked
    osm2, _ = make(fail_first_n=10)
    with pytest.raises(NewtonError):
        osm2.solve(0.0, 0.4, 0.4, x0, max_step_retries=2)
    assert osm2.result.failed_steps == 3  # initial try + 2 retries

    # default: no retry, immediate propagation
    osm3, _ = make(fail_first_n=1)
    with pytest.raises(NewtonError):
        osm3.solve(0.0, 0.4, 0.4, x0)
    assert osm3.result.failed_steps == 1


def test_gmg_setup_cached_for_linear():
    from dune_pdelab_tpu.linalg.multigrid import GeometricMultigrid
    from dune_pdelab_tpu.ops import (
        ConvectionDiffusionProblem, ConvectionDiffusionFEM,
    )
    from dune_pdelab_tpu.solvers import LinearSolverBackend
    from dune_pdelab_tpu.solvers.stationary import (
        StationaryLinearProblemSolver,
    )

    class P(ConvectionDiffusionProblem):
        def f(self, x):
            return jnp.ones(x.shape[:-1])

    p = P()
    mesh = StructuredMesh([0, 0], [1, 1], (16, 16))
    V = FunctionSpace(mesh, QkFEM(1, 2))
    cg_ = constraints(p.dirichlet_bctype(), V)
    go = GridOperator(V, ConvectionDiffusionFEM(p), constraints=cg_)
    gmg = GeometricMultigrid(ConvectionDiffusionFEM(p), mesh, QkFEM(1, 2),
                             bctype=p.dirichlet_bctype())
    calls = {"n": 0}
    orig = gmg.setup

    def counting_setup(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    gmg.setup = counting_setup
    ls = LinearSolverBackend(solver="cg", precond=gmg, use_stencil=False)
    s = StationaryLinearProblemSolver(go, ls, reduction=1e-10, verbose=0)
    x = s.apply(V.zero())
    x2 = s.apply(x)  # second solve: same linear operator
    assert calls["n"] == 1, calls
