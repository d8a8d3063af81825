"""Tutorial 00/01 analog: Poisson with Dirichlet + Neumann boundary
conditions (reference: dune-pdelab-tutorials tutorial00/01;
dune/pdelab/test/testpoisson.cc).

    -div(grad u) = f   in (0,1)^2
               u = g   on the Dirichlet boundary (x=0 / x=1)
    -grad u . n  = j   on the Neumann boundary  (y=0 / y=1)

Run: python examples/01_poisson.py  (CPU or TPU; ~seconds)
"""
import numpy as np
import jax
import jax.numpy as jnp

import dune_pdelab_tpu as pt
from dune_pdelab_tpu.ops import (
    ConvectionDiffusionProblem, ConvectionDiffusionFEM,
)
from dune_pdelab_tpu.solvers import SEQ_CG_Jacobi
from dune_pdelab_tpu.space.functions import l2_difference


class Problem(ConvectionDiffusionProblem):
    """Manufactured solution u = sin(pi x) cos(pi y) + x."""

    def exact(self, p):
        return np.sin(np.pi * p[:, 0]) * np.cos(np.pi * p[:, 1]) + p[:, 0]

    def f(self, x):
        return (2 * np.pi**2 * jnp.sin(np.pi * x[..., 0])
                * jnp.cos(np.pi * x[..., 1]))

    def g(self, x):                      # Dirichlet values
        return (jnp.sin(np.pi * x[..., 0]) * jnp.cos(np.pi * x[..., 1])
                + x[..., 0])

    def dirichlet_bctype(self):          # True on x-faces only
        return lambda p: (np.isclose(p[:, 0], 0.0)
                          | np.isclose(p[:, 0], 1.0))

    def j(self, x):                      # Neumann flux on y-faces
        # du/dy = -pi sin(pi x) sin(pi y) vanishes at y=0 and y=1, so the
        # exact Neumann flux is zero on both y-faces
        return jnp.zeros(x.shape[:-1])


def main():
    prob = Problem()
    mesh = pt.StructuredMesh([0, 0], [1, 1], (64, 64))
    V = pt.FunctionSpace(mesh, pt.QkFEM(2, 2))
    cg = pt.constraints(prob.dirichlet_bctype(), V)
    go = pt.GridOperator(V, ConvectionDiffusionFEM(prob), constraints=cg)
    x0 = pt.interpolate_dirichlet(
        lambda q: np.asarray(prob.g(jnp.asarray(q))), V, cg, V.zero())
    slp = pt.StationaryLinearProblemSolver(
        go, SEQ_CG_Jacobi(), reduction=1e-10, verbose=1)
    x = slp.apply(x0)
    err = float(l2_difference(V, x, prob.exact))
    print(f"ndofs={V.ndofs}  L2 error={err:.3e}")

    from dune_pdelab_tpu.io import VTKWriter
    VTKWriter(mesh).add_field(V, x, "u").write("/tmp/poisson")
    print("wrote /tmp/poisson.vtu")


if __name__ == "__main__":
    main()
