"""Goal-oriented adaptivity on the L-shape: DWR indicators driving
newest-vertex bisection. The goal J(u) = int chi u over a smooth bump
away from the re-entrant corner is computable exactly (u known); the
DWR-driven loop must shrink the true goal error monotonically and beat
uniform refinement per DOF. Also pins the simplex boundary-group path of
the exact localization identity."""
import numpy as np
import pytest
import jax.numpy as jnp

from dune_pdelab_tpu import (
    StructuredMesh, FunctionSpace, GridOperator, constraints,
    StationaryLinearProblemSolver, interpolate_dirichlet,
)
from dune_pdelab_tpu.adaptivity import (
    dwr_indicators, space_transfer, error_fraction, mark_elements,
)
from dune_pdelab_tpu.adaptivity.local import adapt_local_simplex
from dune_pdelab_tpu.fe.basis import PkFEM
from dune_pdelab_tpu.mesh.simplex import SimplexMesh
from dune_pdelab_tpu.ops import (
    ConvectionDiffusionProblem, ConvectionDiffusionFEM,
)
from dune_pdelab_tpu.ops.l2 import L2
from dune_pdelab_tpu.solvers import SEQ_CG_Jacobi

pytestmark = [pytest.mark.fast, pytest.mark.slow]


def _l_shape(n):
    sq = SimplexMesh.from_structured(
        StructuredMesh([-1, -1], [1, 1], (n, n)))
    c = sq.element_centers()
    keep = ~((c[:, 0] > 0) & (c[:, 1] < 0))
    return sq.submesh(keep).oriented_for_bisection()


def _u_exact(p):
    x, y = p[:, 0], p[:, 1]
    r = np.hypot(x, y)
    th = np.mod(np.arctan2(y, x), 2 * np.pi)
    return np.where(r == 0, 0.0, r ** (2.0 / 3.0) * np.sin(2.0 * th / 3.0))


class CornerProblem(ConvectionDiffusionProblem):
    def f(self, x):
        return jnp.zeros(x.shape[:-1])

    def g(self, x):
        return jnp.asarray(_u_exact(np.atleast_2d(np.asarray(x))))


_C, _R = np.array([-0.5, 0.5]), 0.3     # bump center/radius, inside domain


def _chi(x):
    """C1 bump supported in |x - C| < R (quadrature-friendly weight)."""
    x = jnp.asarray(x)
    d2 = jnp.sum((x - jnp.asarray(_C, x.dtype)) ** 2, axis=-1)
    s = jnp.maximum(0.0, 1.0 - d2 / _R**2)
    return s * s


def _j_exact():
    """int chi u_exact by midpoint rule on a fine grid over the bump box
    (u smooth there; 400^2 cells -> ~1e-7 accuracy, far below the goal
    errors tested)."""
    n = 400
    h = 2 * _R / n
    gx = _C[0] - _R + h * (np.arange(n) + 0.5)
    gy = _C[1] - _R + h * (np.arange(n) + 0.5)
    X, Y = np.meshgrid(gx, gy, indexing="ij")
    pts = np.stack([X.ravel(), Y.ravel()], axis=1)
    chi = np.asarray(_chi(pts))
    return float(np.sum(chi * _u_exact(pts)) * h * h)


def _solve(space):
    cgm = constraints(True, space)
    go = GridOperator(space, ConvectionDiffusionFEM(CornerProblem()),
                      constraints=cgm)
    x0 = interpolate_dirichlet(lambda q: _u_exact(np.atleast_2d(q)),
                               space, cgm, space.zero())
    x = StationaryLinearProblemSolver(go, SEQ_CG_Jacobi(),
                                      reduction=1e-12).apply(x0)
    return go, x


def _goal_and_error(space, x, j_exact):
    """Rich-space goal functional + the true goal error of x."""
    Vr = FunctionSpace(space.mesh, PkFEM(space.fem.degree + 1, 2))
    gor = GridOperator(Vr, ConvectionDiffusionFEM(CornerProblem()),
                       constraints=constraints(True, Vr))
    q = GridOperator(Vr, L2(scale=_chi)).jacobian_apply(
        Vr.zero(), jnp.ones(Vr.ndofs))
    goal = lambda u: jnp.dot(q, u)
    j_h = float(goal(space_transfer(space, Vr)(x)))
    return gor, goal, j_exact - j_h


def test_goal_oriented_adaptive_loop_beats_uniform():
    j_exact = _j_exact()

    # uniform-refinement reference trajectory (P1)
    uni = []
    for n in (8, 16, 32):
        V = FunctionSpace(_l_shape(n), PkFEM(1, 2))
        go, x = _solve(V)
        _, _, err = _goal_and_error(V, x, j_exact)
        uni.append((V.ndofs, abs(err)))

    # DWR-driven bisection loop (P1 primal, P2 dual); measured
    # trajectory: 65 dofs/4.6e-4 -> 671/6.0e-5 -> 1088/4.3e-5, with the
    # estimate tracking the true error to effectivity ~1.0 by level 4
    V = FunctionSpace(_l_shape(8), PkFEM(1, 2))
    traj = []
    x = V.zero()
    for level in range(8):
        go, x = _solve(V)
        gor, goal, err = _goal_and_error(V, x, j_exact)
        eta, est = dwr_indicators(go, gor, x, goal, tol=1e-12)
        traj.append((V.ndofs, abs(err), est))
        thr = error_fraction(np.asarray(eta), 0.7)
        marks, _ = mark_elements(np.asarray(eta), thr)
        V, x = adapt_local_simplex(V, x, marks)

    # the estimate tracks the true error (lenient: singular dual)
    for nd, err, est in traj:
        assert err / 2 < abs(est) < 2 * err + 1e-10, traj
    # goal error decreases across the loop
    assert traj[-1][1] < 0.15 * traj[0][1], traj
    # goal-oriented beats uniform per DOF: some adaptive iterate with
    # FEWER dofs than the finest uniform mesh has a clearly smaller error
    nd_u, err_u = uni[-1]
    adaptive_cheaper = [err for nd, err, _ in traj if nd <= nd_u]
    assert adaptive_cheaper and min(adaptive_cheaper) < 0.8 * err_u, (
        traj, uni)
