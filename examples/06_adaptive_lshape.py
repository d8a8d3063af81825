"""Adaptivity tutorial analog: L-shaped-domain corner singularity with
estimate -> mark -> refine -> transfer (reference: dune-pdelab-tutorials
tutorial05 / dune/pdelab/test/testadaptivity.cc).

Uses the simplex newest-vertex-bisection path; the cube hanging-node path
is `dune_pdelab_tpu.adaptivity.local.adapt_local`.

Run: python examples/06_adaptive_lshape.py
"""
import numpy as np
import jax.numpy as jnp

import dune_pdelab_tpu as pt
from dune_pdelab_tpu.adaptivity.adaptivity import error_fraction, mark_elements
from dune_pdelab_tpu.adaptivity.local import (
    adapt_local_simplex, p1_edge_jump_indicator,
)
from dune_pdelab_tpu.fe.basis import PkFEM
from dune_pdelab_tpu.mesh.simplex import SimplexMesh
from dune_pdelab_tpu.ops import (
    ConvectionDiffusionProblem, ConvectionDiffusionFEM,
)
from dune_pdelab_tpu.solvers import SEQ_CG_Jacobi
from dune_pdelab_tpu.space.functions import l2_difference


def u_exact(p):
    r = np.hypot(p[:, 0], p[:, 1])
    th = np.mod(np.arctan2(p[:, 1], p[:, 0]), 2 * np.pi)
    return np.where(r == 0, 0.0, r ** (2 / 3) * np.sin(2 * th / 3))


class Corner(ConvectionDiffusionProblem):
    def f(self, x):
        return jnp.zeros(x.shape[:-1])

    def g(self, x):
        return jnp.asarray(u_exact(np.atleast_2d(np.asarray(x))))


def solve(V):
    cgm = pt.constraints(True, V)
    go = pt.GridOperator(V, ConvectionDiffusionFEM(Corner()), constraints=cgm)
    x0 = pt.interpolate_dirichlet(
        lambda q: u_exact(np.atleast_2d(q)), V, cgm, V.zero())
    return pt.StationaryLinearProblemSolver(
        go, SEQ_CG_Jacobi(maxiter=20000), reduction=1e-12).apply(x0)


def main():
    sq = SimplexMesh.from_structured(
        pt.StructuredMesh([-1, -1], [1, 1], (8, 8)))
    c = sq.element_centers()
    mesh = sq.submesh(~((c[:, 0] > 0) & (c[:, 1] < 0))).oriented_for_bisection()
    V = pt.FunctionSpace(mesh, PkFEM(1, 2))
    x = solve(V)
    for it in range(10):
        err = float(l2_difference(V, x, u_exact))
        print(f"iter {it}: ndofs={V.ndofs:6d}  L2 error={err:.4e}")
        eta2 = p1_edge_jump_indicator(V, x)
        marks, _ = mark_elements(eta2, error_fraction(eta2, 0.5))
        V, x = adapt_local_simplex(V, x, marks)
        x = solve(V)
    print(f"final : ndofs={V.ndofs:6d}  "
          f"L2 error={float(l2_difference(V, x, u_exact)):.4e}")


if __name__ == "__main__":
    main()
