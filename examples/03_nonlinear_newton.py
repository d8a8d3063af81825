"""Tutorial 01 analog: a nonlinear reaction-diffusion problem solved with
inexact Newton (reference: dune-pdelab-tutorials tutorial01 — nonlinear
Poisson; dune/pdelab/solver/newton.hh).

    -lap u + u^3 = f,  u = g on the boundary.

The Jacobian never appears in user code: jacobian_apply is jax.jvp of the
residual kernel (exact AD replaces the reference's NumericalJacobian FD
mixins).

Run: python examples/03_nonlinear_newton.py
"""
import numpy as np
import jax

# a 1e-10 defect reduction is below the fp32 floor (~4e-7 relative on
# this problem) — correctness demos run in fp64
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

import dune_pdelab_tpu as pt
from dune_pdelab_tpu.ops.base import LocalOperator
from dune_pdelab_tpu.solvers import NewtonMethod, SEQ_CG_Jacobi
from dune_pdelab_tpu.space.functions import l2_difference


def u_exact(p):
    return np.sin(np.pi * p[:, 0]) * np.sin(np.pi * p[:, 1]) + 0.5


class NonlinearPoisson(LocalOperator):
    def alpha_volume(self, ctx, u):
        tab = ctx.tab
        gu = self.gradient_at_qp(tab, u)
        uq = self.value_at_qp(tab, u)
        return (self.accumulate_gradient(tab, ctx.factor, gu)
                + self.accumulate_value(tab, ctx.factor, uq ** 3))

    def lambda_volume(self, ctx):
        s = jnp.sin(jnp.pi * ctx.x[..., 0]) * jnp.sin(jnp.pi * ctx.x[..., 1])
        ue = s + 0.5
        f = 2 * jnp.pi ** 2 * s + ue ** 3
        return self.accumulate_value(ctx.tab, ctx.factor, -f)


def main():
    mesh = pt.StructuredMesh([0, 0], [1, 1], (32, 32))
    V = pt.FunctionSpace(mesh, pt.QkFEM(1, 2))
    cg = pt.constraints(True, V)
    go = pt.GridOperator(V, NonlinearPoisson(), constraints=cg)
    x0 = pt.interpolate_dirichlet(u_exact, V, cg, V.zero())
    newton = NewtonMethod(go, SEQ_CG_Jacobi(), reduction=1e-10, verbose=2,
                          reassemble_threshold=0.0)
    x = newton.apply(x0)
    print(f"Newton: {newton.result.iterations} iterations, "
          f"converged={newton.result.converged}")
    print(f"L2 error: {float(l2_difference(V, x, u_exact)):.3e}")


if __name__ == "__main__":
    main()
