"""PDE-constrained optimization: recover a diffusion coefficient field
from observations of the solution, by gradient descent with ADJOINT
gradients through the PDE solve (solvers/differentiable.py).

Beyond the C++ reference: PDELab has no sensitivity machinery — the
adjoint PDE would have to be derived by hand and coded as another
LocalOperator. Here `jax.grad` differentiates straight through
assembly + Krylov solve via the implicit function theorem: each gradient
costs one extra (adjoint) linear solve, independent of the number of
parameters.

Problem:  -div(a(x; theta) grad u) = 1  on (0,1)^2,  u = 0 on the boundary
with a bilinear coefficient model a = theta0 + theta1*x + theta2*y +
theta3*x*y. Synthetic observations come from theta_true; Adam recovers
theta from a cold start. With full-field observations the four parameters
are identifiable, and the data misfit drops by ~6 orders of magnitude.

Run: python examples/11_pde_constrained_optimization.py   (CPU, ~1 min)
"""
import numpy as np
import jax
import jax.numpy as jnp

import dune_pdelab_tpu as pt
from dune_pdelab_tpu.ops import (
    ConvectionDiffusionProblem, ConvectionDiffusionFEM,
)
from dune_pdelab_tpu.solvers import differentiable_stationary_solve

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def factory(theta):
    class P(ConvectionDiffusionProblem):
        def A(self, x):
            a = (theta[0] + theta[1] * x[..., 0] + theta[2] * x[..., 1]
                 + theta[3] * x[..., 0] * x[..., 1])
            return a[..., None, None] * jnp.eye(x.shape[-1], dtype=x.dtype)

        def f(self, x):
            return jnp.ones(x.shape[:-1], x.dtype)
    return ConvectionDiffusionFEM(P())


def main():
    import optax

    mesh = pt.StructuredMesh([0, 0], [1, 1], (16, 16))
    V = pt.FunctionSpace(mesh, pt.QkFEM(1, 2))
    cons = pt.constraints(True, V)

    solve = differentiable_stationary_solve(V, factory, constraints=cons,
                                            solver="cg", tol=1e-13)

    theta_true = jnp.array([1.0, 0.8, -0.4, 0.5])
    x_obs = solve(theta_true)
    print(f"observations: {V.ndofs} DOFs from theta_true "
          f"{np.asarray(theta_true)}")

    loss = jax.jit(jax.value_and_grad(
        lambda t: jnp.sum((solve(t) - x_obs) ** 2)))

    theta = jnp.array([0.5, 0.0, 0.0, 0.0])
    v0, _ = loss(theta)
    # jit the pure-value objective too: the L-BFGS zoom linesearch
    # re-evaluates it several times per update
    fun = jax.jit(lambda t: jnp.sum((solve(t) - x_obs) ** 2))
    opt = optax.lbfgs()
    state = opt.init(theta)
    for k in range(60):
        v, g = loss(theta)
        if k % 10 == 0:
            print(f"  iter {k:3d}  misfit {float(v):.3e}  "
                  f"theta {np.round(np.asarray(theta), 4)}")
        upd, state = opt.update(g, state, theta, value=v, grad=g,
                                value_fn=fun)
        theta = optax.apply_updates(theta, upd)

    v, _ = loss(theta)
    print(f"final misfit {float(v):.3e}  (reduction {float(v0 / v):.1e}x)")
    print(f"recovered theta {np.round(np.asarray(theta), 4)} "
          f"vs true {np.asarray(theta_true)}")
    assert float(v) < 1e-6 * float(v0)
    err = float(jnp.max(jnp.abs(theta - theta_true)))
    print(f"OK: misfit down {float(v0/v):.1e}x; max parameter error {err:.2e}")


if __name__ == "__main__":
    main()
