"""North-star solve: lattice-GMG CG + fp64-grade mixed-precision refinement.

Solves -Laplace u = 1 (homogeneous Dirichlet) on an n^3 structured grid
through the production fast path:

  1. compile the operator to a shift-MAC stencil (no index maps),
  2. build the stencil-resident geometric multigrid (LatticeGMG:
     proxy-probed level stencils, separable transfers, Chebyshev
     smoothing) — setup memory is O(1) in the fine-grid size,
  3. solve with host-loop preconditioned CG: 6 iterations, mesh-
     independent (measured flat from 64^3 to 512^3 = 135M DOFs on a
     TPU v5e, 2.46 s warm at the top size),
  4. optionally refine to a TRUE fp64 relative defect of 1e-8
     (fp64 is needed only for the residual and update — a handful of
     sweeps around the fp32 solve; run with JAX_ENABLE_X64=1).

Run: python examples/15_north_star_scaling.py [cells=64]

reference analog: ISTLBackend_SEQ_CG_AMG_SSOR driven by
StationaryLinearProblemSolver (dune/pdelab/backend/istl/
seqistlsolverbackend.hh:983, stationary/linearproblem.hh:182-278).
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
import dune_pdelab_tpu as pt                                  # noqa: E402
from dune_pdelab_tpu.ops import (                             # noqa: E402
    ConvectionDiffusionProblem, ConvectionDiffusionFEM,
)
from dune_pdelab_tpu.assembly.stencil import compile_stencil  # noqa: E402
from dune_pdelab_tpu.linalg.gmg_lattice import LatticeGMG     # noqa: E402


class P(ConvectionDiffusionProblem):
    def f(self, x):
        return jnp.ones(x.shape[:-1], x.dtype)


def main(n=64):
    print(f"backend={jax.default_backend()}, cells={n}^3")
    p = P()
    mesh = pt.StructuredMesh([0, 0, 0], [1, 1, 1], (n, n, n))
    V = pt.FunctionSpace(mesh, pt.QkFEM(1, 3))
    cg_mask = pt.constraints(p.dirichlet_bctype(), V)
    lop = ConvectionDiffusionFEM(p)
    go = pt.GridOperator(V, lop, constraints=cg_mask, skip_boundary=True)
    print(f"N = {V.ndofs:,} DOFs")

    b = -go.residual(jnp.zeros(V.ndofs, jnp.float32))
    t0 = time.time()
    st = compile_stencil(go)
    gmg = LatticeGMG(V, lop, fine_stencil=st)
    _ = float(jnp.sum(gmg.apply(b)))          # warm the V-cycle compile
    print(f"setup + compile: {time.time()-t0:.1f} s "
          f"({gmg.nlevels} levels)")

    x, info = gmg.solve_host(b, tol=1e-8)     # warm-up solve
    t0 = time.time()
    x, info = gmg.solve_host(b, tol=1e-8)
    dt = time.time() - t0
    print(f"solve: {info['iterations']} CG iterations in {dt:.3f} s "
          f"({V.ndofs/dt/1e6:.1f} M solved DOFs/s), "
          f"recurrence defect {info['defect']/info['defect0']:.1e}, "
          f"TRUE fp32 defect {info['true_defect']/info['defect0']:.1e}")

    if jnp.zeros(1).dtype == jnp.float64:     # JAX_ENABLE_X64=1
        from dune_pdelab_tpu.solvers.refinement import refine_solve
        b64 = -go.residual(jnp.zeros(V.ndofs, jnp.float64))
        t0 = time.time()
        x64, stats = refine_solve(
            st, lambda r32: gmg.solve_host(r32, tol=1e-4, maxiter=30)[0],
            b64, tol=1e-8)
        print(f"fp64 refinement: {stats.outer_iterations} sweeps in "
              f"{time.time()-t0:.2f} s, TRUE fp64 defect "
              f"{stats.defect/stats.defect0:.1e}")
    else:
        print("(set JAX_ENABLE_X64=1 for the fp64 refinement stage)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 64)
