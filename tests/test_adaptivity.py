"""Adaptivity tests (testadaptivity analog, reference:
dune/pdelab/test/testadaptivity.cc): estimator efficiency (eta ~ true error
rate), marking fractions, refine-with-transfer."""
import numpy as np
import jax.numpy as jnp
import pytest

from dune_pdelab_tpu import (
    StructuredMesh, FunctionSpace, QkFEM, GridOperator, constraints,
    StationaryLinearProblemSolver,
)
from dune_pdelab_tpu.ops import ConvectionDiffusionProblem, ConvectionDiffusionFEM
from dune_pdelab_tpu.solvers import SEQ_CG_Jacobi
from dune_pdelab_tpu.adaptivity import (
    residual_estimator_convectiondiffusion, error_fraction, element_fraction,
    mark_elements, adapt_uniform,
)
from dune_pdelab_tpu.space.functions import l2_difference


class P(ConvectionDiffusionProblem):
    def exact(self, p):
        return np.sin(np.pi * p[:, 0]) * np.sin(np.pi * p[:, 1])

    def f(self, x):
        return 2 * np.pi**2 * jnp.sin(np.pi * x[..., 0]) * jnp.sin(
            np.pi * x[..., 1])


def _solve(n):
    p = P()
    mesh = StructuredMesh([0, 0], [1, 1], (n, n))
    V = FunctionSpace(mesh, QkFEM(1, 2))
    cg_ = constraints(True, V)
    go = GridOperator(V, ConvectionDiffusionFEM(p), constraints=cg_)
    x = StationaryLinearProblemSolver(go, SEQ_CG_Jacobi(), reduction=1e-12,
                                      verbose=0).apply(V.zero())
    return p, V, go, x


def test_estimator_converges_at_error_rate():
    etas = []
    for n in (8, 16, 32):
        p, V, go, x = _solve(n)
        eta2 = residual_estimator_convectiondiffusion(go, p, x)
        etas.append(float(jnp.sqrt(jnp.sum(eta2))))
    orders = [np.log2(etas[i] / etas[i + 1]) for i in range(2)]
    # residual estimator for Q1 converges O(h) in the energy norm
    assert orders[-1] > 0.8, (etas, orders)


def test_estimator_localizes():
    """Error indicator peaks where the solution varies most (center)."""
    p, V, go, x = _solve(16)
    eta2 = np.asarray(residual_estimator_convectiondiffusion(go, p, x))
    centers = go.mesh.element_centers()
    top = np.argsort(eta2)[-16:]
    d = np.linalg.norm(centers[top] - 0.5, axis=1)
    assert np.mean(d) < 0.45   # concentrated toward interior features


def test_marking_fractions():
    eta2 = np.array([4.0, 1.0, 0.5, 0.3, 0.2, 0.1])
    thr = error_fraction(eta2, 0.65)
    refine, _ = mark_elements(eta2, thr)
    assert refine.sum() == 1      # the top element carries ~2/3 of the error
    thr2 = element_fraction(eta2, 0.5)
    refine2, _ = mark_elements(eta2, thr2)
    assert refine2.sum() == 3


def test_adapt_uniform_transfer_exact():
    mesh = StructuredMesh([0, 0], [1, 1], (4, 4))
    V = FunctionSpace(mesh, QkFEM(2, 2))
    f = lambda q: (q[:, 0] + 0.2) ** 2 - q[:, 1]
    x = V.interpolate(f)
    V2, x2 = adapt_uniform(V, x)
    assert V2.mesh.cells == (8, 8)
    assert float(l2_difference(V2, x2, f)) < 1e-12


def test_adaptive_solve_loop():
    """estimate -> refine -> re-solve loop reaches the target eta and shows
    the expected O(h) estimator decay (testadaptivity driver analog)."""
    from dune_pdelab_tpu.models.boilerplate import adaptive_solve

    def factory():
        p = P()
        return p, ConvectionDiffusionFEM(p)

    mesh0 = StructuredMesh([0, 0], [1, 1], (8, 8))
    space, x, hist = adaptive_solve(
        factory, mesh0, QkFEM(1, 2), bctype=True, tol=0.4, max_levels=4)
    etas = [e for _, e in hist]
    assert etas[-1] <= 0.4
    assert len(hist) >= 2
    # eta halves per refinement (O(h) estimator for Q1)
    assert etas[1] < 0.65 * etas[0]
    # final solution accurate
    err = float(l2_difference(space, x, P().exact))
    assert err < 5e-3
