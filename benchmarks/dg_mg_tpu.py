"""Deep-convergence DG solve on TPU: two-level (DG -> Q1 -> GMG) CG.

Complements benchmarks/dg_solve_tpu.py (which validates the Jacobi-CG
production PATH at 128^3 but stops at the fp32 kappa floor): here the
DG two-level multigrid drives a 3D SIPG problem to 1e-8 relative
reduction in mesh-independent iterations — the reference's
seq_amg_dg_backend.hh job (ISTLBackend_SEQ_AMG_4_DG) on hardware.

Usage: python benchmarks/dg_mg_tpu.py [cells=128]

NOTE: the mm-resident smoother/V-cycle fast path requires nx % 128 == 0
(the Pallas lane constraint); at 64^3 the flat XLA path runs instead.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
import dune_pdelab_tpu as pt                                  # noqa: E402
from dune_pdelab_tpu.fe import QkDGFEM                        # noqa: E402
from dune_pdelab_tpu.ops import (                             # noqa: E402
    ConvectionDiffusionProblem, ConvectionDiffusionFEM,
)
from dune_pdelab_tpu.ops.convectiondiffusiondg import (       # noqa: E402
    ConvectionDiffusionDG,
)
from dune_pdelab_tpu.linalg import DGTwoLevel                 # noqa: E402


class Diff(ConvectionDiffusionProblem):
    def f(self, x):
        return jnp.ones(x.shape[:-1], x.dtype)


def main(cells=64):
    print(f"[dg-mg] backend={jax.default_backend()} cells={cells}")
    p = Diff()
    mesh = pt.StructuredMesh([0, 0, 0], [1, 1, 1], (cells,) * 3)
    V = pt.FunctionSpace(mesh, QkDGFEM(1, 3))
    go = pt.GridOperator(V, ConvectionDiffusionDG(p))
    N = V.ndofs
    print(f"[dg-mg] N={N}")

    t0 = time.time()
    x0 = V.zero()
    b = -go.residual(x0)
    # outer operator: the compiled block-stencil/mm apply — what
    # LinearSolverBackend would select — NOT the general jvp apply (the
    # general apply costs ~100x the mm kernel at this size and would
    # dominate the per-iteration figure)
    from dune_pdelab_tpu.assembly.blockstencil import compile_block_stencil
    from dune_pdelab_tpu.assembly.blockstencil_mm import (
        try_mm_block_stencil, MMBlockStencil,
    )
    Aop = compile_block_stencil(go)
    if Aop is not None and jax.default_backend() != "cpu":
        mm = try_mm_block_stencil(Aop, mode="mxu2")
        if mm is not None:
            Aop = MMBlockStencil(mm)
    tl = DGTwoLevel(go, ConvectionDiffusionFEM(p))
    tl.setup(operator=Aop)
    # jit the operator and the preconditioner separately: the whole-CG jit
    # (krylov.cg is a lax.while_loop, compiled as one computation) takes
    # 400+ s at 64^3 over the relay; a host-side PCG loop over the two
    # jitted pieces pays only ~5 dispatches/iteration x ~2.5 ms —
    # negligible at <=10 iterations
    A = (Aop if Aop is not None
         else jax.jit(lambda z: go.jacobian_apply(x0, z)))

    def run(bb, tol=1e-8, maxiter=60):
        x = jnp.zeros_like(bb)
        r = bb
        z0 = tl.apply(r)
        pvec, rz = z0, float(jnp.dot(r, z0))
        nb0 = float(jnp.linalg.norm(bb))
        k = 0
        while k < maxiter:
            Ap = A(pvec)
            alpha = rz / float(jnp.dot(pvec, Ap))
            x = x + alpha * pvec
            r = r - alpha * Ap
            k += 1
            if float(jnp.linalg.norm(r)) <= tol * nb0:
                break
            zv = tl.apply(r)
            rz_new = float(jnp.dot(r, zv))
            pvec = zv + (rz_new / rz) * pvec
            rz = rz_new
        return x, k

    z, it = run(b)
    print(f"[dg-mg] cold solve {time.time()-t0:.1f}s (incl compile), "
          f"iterations={it}")
    t0 = time.time()
    z, it = run(b)
    dt = time.time() - t0
    true_res = float(jnp.linalg.norm(A(z) - b) / jnp.linalg.norm(b))
    print(f"[dg-mg] warm solve {dt:.2f}s = {dt/max(it,1)*1e3:.1f} ms/iter "
          f"({N*it/dt/1e6:.1f} Mdof-iters/s), iterations={it}, "
          f"true rel res {true_res:.2e}")
    # fp32 floor: attainable true residual is O(eps * kappa) ~ 1e-5..1e-4;
    # the contract here is mesh-independent iteration count + true
    # residual at the fp32 floor (fp64 parity lives in benchmarks/fp64_tpu.py)
    ok = true_res < 2e-4 and it <= 60
    print(f"[dg-mg] OK={ok}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 128))
