"""StokesGMGSchur: velocity-block lattice GMG + pressure-mass Schur
block-triangular preconditioning — GMRES iterations must stay bounded
under refinement (Silvester-Wathen theory), unlike diagonal-grade
preconditioning whose counts grow ~1/h.

reference: the Taylor-Hood systems of
dune/pdelab/localoperator/taylorhoodnavierstokes.hh:52 solved through
assembled ISTL backends; measured here against the manufactured divergence-
free solution of golden config5.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from dune_pdelab_tpu import StationaryLinearProblemSolver
from dune_pdelab_tpu.mesh.structured import StructuredMesh
from dune_pdelab_tpu.assembly.gridoperator import GridOperator
from dune_pdelab_tpu.solvers import LinearSolverBackend
from dune_pdelab_tpu.solvers.stokes import (
    taylor_hood_space, stokes_constraints, StokesGMGSchur,
)
from dune_pdelab_tpu.ops.stokes import (
    TaylorHoodNavierStokes, NavierStokesParameters,
)
from dune_pdelab_tpu.space.functions import l2_difference


def _a(x):
    return x**2 * (1 - x) ** 2


def _da(x):
    return 2 * x * (1 - x) * (1 - 2 * x)


def _dda(x):
    return 12 * x**2 - 12 * x + 2


def _ddda(x):
    return 24 * x - 12


class MS(NavierStokesParameters):
    """Divergence-free manufactured solution (golden config5's)."""

    def __init__(self):
        super().__init__(mu=1.0, rho=0.0)

    def f(self, x):
        xx, yy = x[..., 0], x[..., 1]
        f1 = -(_dda(xx) * _da(yy) + _a(xx) * _ddda(yy)) + 3 * xx**2
        f2 = (_ddda(xx) * _a(yy) + _da(xx) * _dda(yy)) + 3 * yy**2
        return jnp.stack([f1, f2], axis=-1)


def _solve(cells, triangular=True, reduction=1e-9):
    mesh = StructuredMesh([0, 0], [1, 1], (cells,) * 2)
    W = taylor_hood_space(mesh, 2)
    cg_ = stokes_constraints(W)
    go = GridOperator(W, TaylorHoodNavierStokes(MS()), constraints=cg_)
    pre = StokesGMGSchur(W, mu=1.0, triangular=triangular)
    ls = LinearSolverBackend(solver="gmres", precond=pre, restart=100,
                             maxiter=2000)
    slp = StationaryLinearProblemSolver(go, ls, reduction=reduction,
                                        verbose=0)
    x = slp.apply(W.zero())
    err2 = 0.0
    for c in range(2):
        xc = W.children[0].restrict(W.restrict(x, 0), c)
        ue = (lambda p, c=c: np.stack(
            [_a(p[:, 0]) * _da(p[:, 1]), -_da(p[:, 0]) * _a(p[:, 1])],
            axis=-1)[:, c])
        err2 += float(l2_difference(W.children[0].children[0], xc, ue)) ** 2
    return (slp.result.linear_solver_iterations, slp.result.converged,
            float(np.sqrt(err2)), pre)


@pytest.mark.fast
def test_stokes_gmgschur_iterations_bounded():
    """GMRES iterations bounded (<=70) and essentially flat 8^2 -> 32^2;
    velocity error converges at the Q2 rate."""
    its, errs = [], []
    for cells in (8, 16, 32):
        it, conv, err, pre = _solve(cells)
        assert conv
        assert pre._vgmg is not None       # real GMG, not the fallback
        its.append(it)
        errs.append(err)
    assert max(its) <= 70
    assert its[2] - its[1] <= 10           # plateauing, not 1/h growth
    assert errs[1] < 0.2 * errs[0] and errs[2] < 0.2 * errs[1]  # ~h^3


@pytest.mark.fast
def test_stokes_gmgschur_triangular_beats_diagonal():
    it_tri, conv_t, _, _ = _solve(16, triangular=True)
    it_diag, conv_d, _, _ = _solve(16, triangular=False)
    assert conv_t and conv_d
    assert it_tri < it_diag


@pytest.mark.fast
def test_stokes_gmgschur_odd_mesh_fallback():
    """Odd cell counts have no lattice hierarchy: the preconditioner must
    still work (diagonal velocity fallback) and converge."""
    it, conv, err, pre = _solve(9, reduction=1e-8)
    assert pre._vgmg is None
    assert conv and err < 1e-3
