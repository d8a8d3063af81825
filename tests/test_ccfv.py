"""CCFV tests (test-transport-ccfv analog, reference:
dune/pdelab/test/test-transport-ccfv.cc): diffusion convergence (O(h) on
cell centers... O(h^2) superconvergence on uniform grids), upwind transport
monotonicity."""
import numpy as np
import jax.numpy as jnp
import pytest

from dune_pdelab_tpu import StructuredMesh, FunctionSpace, GridOperator
from dune_pdelab_tpu.fe import P0FEM
from dune_pdelab_tpu.ops import ConvectionDiffusionProblem
from dune_pdelab_tpu.ops.ccfv import ConvectionDiffusionCCFV
from dune_pdelab_tpu.solvers import (
    StationaryLinearProblemSolver, SEQ_CG_Jacobi, SEQ_BCGS_Jacobi,
)


class Diff(ConvectionDiffusionProblem):
    def exact(self, p):
        return np.sin(np.pi * p[:, 0]) * np.sin(np.pi * p[:, 1])

    def f(self, x):
        return 2 * np.pi**2 * jnp.sin(np.pi * x[..., 0]) * jnp.sin(
            np.pi * x[..., 1])


def _solve(problem, n, solver=None):
    mesh = StructuredMesh([0, 0], [1, 1], (n, n))
    V = FunctionSpace(mesh, P0FEM(2))
    go = GridOperator(V, ConvectionDiffusionCCFV(problem))
    slp = StationaryLinearProblemSolver(
        go, solver or SEQ_CG_Jacobi(), reduction=1e-12, verbose=0)
    return mesh, V, slp.apply(V.zero()), slp


def test_ccfv_diffusion_convergence():
    p = Diff()
    errs = []
    for n in (8, 16, 32):
        mesh, V, x, slp = _solve(p, n)
        assert slp.result.converged
        centers = mesh.element_centers()
        errs.append(float(np.sqrt(np.mean(
            (np.asarray(x) - p.exact(centers)) ** 2))))
    order = np.log2(errs[-2] / errs[-1])
    assert order > 1.7, (errs, order)   # cell-center superconvergence


def test_ccfv_upwind_transport_monotone():
    """Pure upwinded advection: solution stays within inflow bounds."""
    class T(ConvectionDiffusionProblem):
        def A(self, x):
            return 1e-8

        def b(self, x):
            return jnp.broadcast_to(jnp.array([1.0, 0.3]), x.shape)

        def g(self, x):
            return jnp.where(x[..., 0] < 1e-12, 1.0, 0.0)

    mesh, V, x, slp = _solve(T(), 16, solver=SEQ_BCGS_Jacobi())
    assert slp.result.converged
    assert float(jnp.min(x)) > -1e-6
    assert float(jnp.max(x)) < 1.0 + 1e-6


def test_ccfv_heterogeneous_tpfa_exact():
    """Two-layer diffusion: K=k1 (x<0.5), K=k2 (x>=0.5). Harmonic-average
    TPFA with A evaluated at CELL CENTERS (reference:
    convectiondiffusionccfv.hh:152-160) is exact at cell centers when the
    interface is a face."""
    k1, k2 = 1.0, 10.0

    class TwoLayer(ConvectionDiffusionProblem):
        def A(self, x):
            return jnp.where(x[..., 0] < 0.5, k1, k2)

        def bctype(self, x):
            on_x = (x[..., 0] < 1e-12) | (x[..., 0] > 1 - 1e-12)
            return jnp.where(on_x, 1, 0)    # Dirichlet on x-faces only

        def g(self, x):
            return jnp.where(x[..., 0] > 0.5, 1.0, 0.0)

    mesh, V, x, slp = _solve(TwoLayer(), 16)
    assert slp.result.converged
    q = 1.0 / (0.5 / k1 + 0.5 / k2)      # exact interface flux
    c = mesh.element_centers()
    xe = np.where(c[:, 0] < 0.5, q * c[:, 0] / k1,
                  0.5 * q / k1 + q * (c[:, 0] - 0.5) / k2)
    assert np.max(np.abs(np.asarray(x) - xe)) < 1e-9, \
        np.max(np.abs(np.asarray(x) - xe))


def test_ccfv_max_speed_cfl_hook():
    class T(ConvectionDiffusionProblem):
        def b(self, x):
            return jnp.broadcast_to(jnp.array([2.0, -0.5]), x.shape)

    assert abs(ConvectionDiffusionCCFV(T()).max_speed() - 2.0) < 1e-12
