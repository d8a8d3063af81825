"""Tutorial analog: convection-diffusion with SIPG DG + BiCGStab
(reference: dune-pdelab-tutorials tutorial02 / testconvectiondiffusiondg.cc;
BASELINE config 3).

Run: python examples/02_convectiondiffusion_dg.py
"""
import numpy as np
import jax.numpy as jnp

import dune_pdelab_tpu as pt
from dune_pdelab_tpu.fe import QkDGFEM
from dune_pdelab_tpu.ops import ConvectionDiffusionProblem
from dune_pdelab_tpu.ops.convectiondiffusiondg import ConvectionDiffusionDG
from dune_pdelab_tpu.solvers import LinearSolverBackend
from dune_pdelab_tpu.space.functions import l2_difference


class Problem(ConvectionDiffusionProblem):
    """Convection-diffusion with constant wind, manufactured solution."""

    def exact(self, p):
        return np.sin(np.pi * p[:, 0]) * np.sin(np.pi * p[:, 1])

    def b(self, x):
        return jnp.asarray([1.0, 0.5])

    def f(self, x):
        s = jnp.sin(np.pi * x[..., 0]) * jnp.sin(np.pi * x[..., 1])
        dx = np.pi * jnp.cos(np.pi * x[..., 0]) * jnp.sin(np.pi * x[..., 1])
        dy = np.pi * jnp.sin(np.pi * x[..., 0]) * jnp.cos(np.pi * x[..., 1])
        return 2 * np.pi**2 * s + 1.0 * dx + 0.5 * dy

    def g(self, x):
        return jnp.zeros(x.shape[:-1])


def main():
    prob = Problem()
    errs = []
    for n in (16, 32):
        mesh = pt.StructuredMesh([0, 0], [1, 1], (n, n))
        V = pt.FunctionSpace(mesh, QkDGFEM(1, 2))
        lop = ConvectionDiffusionDG(prob, penalty=2.0)  # SIPG default
        go = pt.GridOperator(V, lop)
        ls = LinearSolverBackend(solver="bicgstab", precond="block_jacobi",
                                 maxiter=2000)
        slp = pt.StationaryLinearProblemSolver(go, ls, reduction=1e-10,
                                               verbose=1)
        x = slp.apply(V.zero())
        errs.append(float(l2_difference(V, x, prob.exact)))
        print(f"n={n}: ndofs={V.ndofs}, L2 error={errs[-1]:.3e}")
    print(f"convergence order: {np.log2(errs[0] / errs[1]):.2f} (expect ~2)")


if __name__ == "__main__":
    main()
