"""End-to-end DG solve on real TPU through the production solver path.

Validates that `LinearSolverBackend` picks the mode-major Pallas kernel
(default mode mxu2 after the 2026-08-18 campaign) for a 128^3 Q1 DG SIPG
problem on hardware (the mm lowering requires nx % 128 == 0, so CPU-tier
tests only exercise it in interpret mode) and that the mm-resident CG
solve converges, with per-iteration wall time reported.

The Jacobi diagonal comes from the compiled block stencil
(BlockStencilOperator.diagonal) — the probing go.jacobian_diagonal path
ships element-sized scatter maps in its jit, which exceeds the axon
remote-compile request limit (HTTP 413) at 128^3 (2M elements).

fp32 note: SIPG at h=1/128 with Jacobi-CG has kappa ~ 1e6+, so 400
iterations buy only ~1e-2 relative reduction and the attainable TRUE
residual in fp32 is O(eps*kappa) ~ 1e-2. This script validates the
production PATH (kernel selection, throughput, recurrence/true-residual
consistency), not deep convergence — production runs use the DG
two-level multigrid or ILU backends for that (linalg/dgmultigrid.py).
Measured 2026-08-18: mm selected at 16.8M DOFs, warm solve 1.61 ms/iter
= 10.44 Gdof-iters/s, defect 2.44e-4 -> 2.69e-6 (400 its), true rel
res 1.16e-2 == recurrence reduction 1.1e-2 (consistent).

Reference analog: testconvectiondiffusiondg.cc solved through
ISTLBackend_SEQ_CG_* over an assembled BCRS matrix
(dune/pdelab/backend/istl/seqistlsolverbackend.hh:112).

Usage: python benchmarks/dg_solve_tpu.py [cells=128]
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
import dune_pdelab_tpu as pt                                  # noqa: E402
from dune_pdelab_tpu.fe import QkDGFEM                        # noqa: E402
from dune_pdelab_tpu.ops import ConvectionDiffusionProblem    # noqa: E402
from dune_pdelab_tpu.ops.convectiondiffusiondg import (       # noqa: E402
    ConvectionDiffusionDG,
)
from dune_pdelab_tpu.solvers import LinearSolverBackend       # noqa: E402


class Diff(ConvectionDiffusionProblem):
    def f(self, x):
        return jnp.ones(x.shape[:-1], x.dtype)


def main(cells=128):
    print(f"[dg-solve] backend={jax.default_backend()} cells={cells}")
    mesh = pt.StructuredMesh([0, 0, 0], [1, 1, 1], (cells,) * 3)
    V = pt.FunctionSpace(mesh, QkDGFEM(1, 3))
    go = pt.GridOperator(V, ConvectionDiffusionDG(Diff()))
    print(f"[dg-solve] N={V.ndofs}")

    backend = LinearSolverBackend(solver="cg", precond="jacobi",
                                  maxiter=400)
    x_lin = jnp.zeros(V.ndofs, jnp.float32)
    r = go.residual(x_lin)
    t0 = time.perf_counter()
    z, stats = backend.solve(go, x_lin, -r, 1e-4)
    z.block_until_ready()
    t_solve = time.perf_counter() - t0

    st = backend._setup_cache.get((id(go), "stencil"))
    from dune_pdelab_tpu.assembly.blockstencil_mm import MMBlockStencil
    picked_mm = isinstance(st, MMBlockStencil)
    its = int(stats.iterations)
    print(f"[dg-solve] mm kernel selected: {picked_mm}")
    print(f"[dg-solve] iterations={its} defect {float(stats.defect0):.3e}"
          f" -> {float(stats.defect):.3e} wall={t_solve:.2f}s"
          f" (incl. compile)")

    # warm second solve = production steady state
    t0 = time.perf_counter()
    z2, stats2 = backend.solve(go, x_lin, -r, 1e-4)
    z2.block_until_ready()
    t2 = time.perf_counter() - t0
    it2 = max(int(stats2.iterations), 1)
    print(f"[dg-solve] warm solve: {t2:.2f}s = {t2/it2*1e3:.2f} ms/iter "
          f"({V.ndofs*it2/t2/1e9:.2f} Gdof-iters/s)")

    # true-residual check against a fresh operator apply; fp32 floor is
    # O(eps*kappa) — see module docstring
    true_res = float(jnp.linalg.norm(go.residual(z))
                     / jnp.linalg.norm(r))
    print(f"[dg-solve] true relative residual: {true_res:.3e}")
    reduced = float(stats.defect) <= 0.1 * float(stats.defect0)
    ok = picked_mm and reduced and true_res < 5e-2
    print(f"[dg-solve] OK={bool(ok)}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 128))
