"""Mixed-precision iterative refinement: fp64-grade solutions from fp32
inner solves (the TPU-native fp64 parity path).

Oracle: refine_solve with an fp32 GMG-CG inner solver must reach the same
solution as a pure-fp64 solve to ~1e-13, in a handful of outer sweeps.
reference: BASELINE.json fp64 parity tolerance; ISTL solves in double
(dune/pdelab/backend/istl/seqistlsolverbackend.hh)."""
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
from dune_pdelab_tpu.solvers.refinement import (
    refine_solve, MixedPrecisionStationarySolver,
)
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


def _setup(n=64):
    p = P()
    mesh = StructuredMesh([0, 0], [1, 1], (n, n))
    V = FunctionSpace(mesh, QkFEM(1, 2))
    cg_ = constraints(p.dirichlet_bctype(), V)
    lop = ConvectionDiffusionFEM(p)
    go = GridOperator(V, lop, constraints=cg_)
    st = compile_stencil(go)
    gmg = LatticeGMG(V, lop, fine_stencil=st)
    x0 = interpolate_dirichlet(
        lambda q: np.asarray(p.g(jnp.asarray(q))), V, cg_, V.zero())
    return p, V, go, st, gmg, x0


@pytest.mark.fast
def test_refine_reaches_fp64_floor_with_fp32_inner():
    p, V, go, st, gmg, x0 = _setup()
    b = -go.residual(x0, 0.0)
    assert b.dtype == jnp.float64
    inner = gmg.make_solver(tol=1e-4, maxiter=50)
    x, stats = refine_solve(st, inner, b, tol=1e-13)
    assert stats.converged and stats.outer_iterations <= 5
    # each sweep must contract the defect by >= 1e3
    h = stats.history
    for a, bb in zip(h[:-1], h[1:]):
        assert bb < 1e-3 * a
    # matches the pure-fp64 solve
    x64, s64 = gmg.make_solver(tol=1e-13)(b)
    assert float(jnp.max(jnp.abs(x - x64))) < 1e-11
    # true final defect really is fp64-grade
    assert float(jnp.linalg.norm(b - st(x))) < 1e-13 * float(
        jnp.linalg.norm(b))


@pytest.mark.fast
def test_refine_inner_precision_actually_fp32():
    """Guard: the inner solver must SEE fp32 (no silent promotion)."""
    p, V, go, st, gmg, x0 = _setup(32)
    b = -go.residual(x0, 0.0)
    seen = []

    inner64 = gmg.make_solver(tol=1e-4, maxiter=50)

    def inner(r32):
        seen.append(r32.dtype)
        z, s = inner64(r32)
        seen.append(z.dtype)
        return z, s

    x, stats = refine_solve(st, inner, b, tol=1e-12)
    assert stats.converged
    assert all(d == jnp.float32 for d in seen)


@pytest.mark.fast
def test_refine_vcycle_inner():
    """A single V-cycle (no inner Krylov) also refines to the floor —
    the cheapest production configuration."""
    p, V, go, st, gmg, x0 = _setup(32)
    b = -go.residual(x0, 0.0)
    x, stats = refine_solve(st, gmg.apply, b, tol=1e-12, max_outer=30)
    assert stats.converged and stats.outer_iterations <= 25


@pytest.mark.fast
def test_mixed_precision_stationary_solver_hits_golden_l2():
    p, V, go, st, gmg, x0 = _setup()
    mps = MixedPrecisionStationarySolver(go, gmg, reduction=1e-12)
    x = mps.apply(x0)
    assert mps.stats.converged
    err = float(l2_difference(V, x, lambda q: p.exact(q)))
    # pure-fp64 reference solve
    z64, _ = gmg.make_solver(tol=1e-12)(-go.residual(x0, 0.0))
    err64 = float(l2_difference(V, x0 + z64, lambda q: p.exact(q)))
    assert abs(err - err64) < 1e-9 * max(err64, 1.0)
