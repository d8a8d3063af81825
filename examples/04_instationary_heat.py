"""Tutorial 03 analog: the instationary heat equation with a one-step theta
method (reference: dune-pdelab-tutorials tutorial03;
dune/pdelab/test/testinstationary.cc; BASELINE config 4).

    du/dt - lap u = f,  separable exact solution u = e^{-2 pi^2 t} sin(pi x) sin(pi y)

Run: python examples/04_instationary_heat.py
"""
import numpy as np
import jax.numpy as jnp

import dune_pdelab_tpu as pt
from dune_pdelab_tpu.instationary import OneStepMethod, crank_nicolson
from dune_pdelab_tpu.ops import (
    ConvectionDiffusionProblem, ConvectionDiffusionFEM,
)
from dune_pdelab_tpu.ops.l2 import L2
from dune_pdelab_tpu.solvers import SEQ_CG_Jacobi
from dune_pdelab_tpu.space.functions import l2_difference

DECAY = 2 * np.pi ** 2


def u_exact(p, t):
    return np.exp(-DECAY * t) * np.sin(np.pi * p[:, 0]) * np.sin(np.pi * p[:, 1])


class Heat(ConvectionDiffusionProblem):
    def f(self, x):
        return jnp.zeros(x.shape[:-1])

    def g(self, x):
        return jnp.zeros(x.shape[:-1])


def main():
    mesh = pt.StructuredMesh([0, 0], [1, 1], (32, 32))
    V = pt.FunctionSpace(mesh, pt.QkFEM(1, 2))
    prob = Heat()
    cg = pt.constraints(True, V)
    go_s = pt.GridOperator(V, ConvectionDiffusionFEM(prob), constraints=cg)
    go_t = pt.GridOperator(V, L2(), constraints=cg)

    osm = OneStepMethod(crank_nicolson(), go_s, go_t, SEQ_CG_Jacobi(),
                        pdesolver="linear", reduction=1e-11)

    x = V.interpolate(lambda p: u_exact(np.atleast_2d(p), 0.0))
    t, dt, T = 0.0, 1e-3, 0.05
    while t < T - 1e-12:
        x = osm.apply(t, dt, x)
        t += dt
    err = float(l2_difference(V, x, lambda p: u_exact(p, t)))
    decay = float(jnp.max(jnp.abs(x))) / 1.0
    print(f"t={t:.3f}: L2 error {err:.3e}, max|u| {decay:.4f} "
          f"(exact {np.exp(-DECAY * t):.4f})")


if __name__ == "__main__":
    main()
