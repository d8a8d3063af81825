"""Differentiable time integration (instationary/differentiable.py):
the traceable theta-scheme rollout must (a) reproduce the OneStepMethod
driver's trajectory and (b) deliver discrete-adjoint gradients matching
central finite differences of the whole rollout."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import dune_pdelab_tpu as pt
from dune_pdelab_tpu.ops import (
    ConvectionDiffusionProblem, ConvectionDiffusionFEM,
)
from dune_pdelab_tpu.instationary import differentiable_theta_rollout

pytestmark = pytest.mark.fast


def _setup():
    mesh = pt.StructuredMesh([0, 0], [1, 1], (8, 8))
    V = pt.FunctionSpace(mesh, pt.QkFEM(1, 2))
    cons = pt.constraints(True, V)

    def factory(params):
        class P(ConvectionDiffusionProblem):
            def A(self, x):
                return (params[0])[..., None, None] * jnp.eye(
                    x.shape[-1], dtype=x.dtype) + 0.0 * x[..., :1, None]

            def f(self, x):
                return params[1] * jnp.sin(np.pi * x[..., 0]) \
                    * jnp.sin(np.pi * x[..., 1])
        return ConvectionDiffusionFEM(P())
    return V, cons, factory


def test_rollout_matches_onestep_driver():
    """Crank-Nicolson rollout == OneStepMethod(one_step_theta(0.5)) on
    the heat equation, same dt/steps, to solver tolerance."""
    from dune_pdelab_tpu.instationary import OneStepMethod, one_step_theta
    from dune_pdelab_tpu.ops.l2 import L2
    from dune_pdelab_tpu.solvers import SEQ_CG_Jacobi

    V, cons, factory = _setup()
    params = jnp.array([1.0, 5.0])
    x0 = V.interpolate(lambda q: np.sin(np.pi * q[..., 0])
                       * np.sin(np.pi * q[..., 1]))
    x0 = jnp.where(cons.mask, 0.0, x0)
    dt, nsteps = 0.01, 6

    roll = differentiable_theta_rollout(V, factory, cons, theta=0.5,
                                        tol=1e-13)
    xT = roll(x0, params, dt, nsteps)

    go_s = pt.GridOperator(V, factory(params), constraints=cons)
    go_m = pt.GridOperator(V, L2(), constraints=cons)
    osm = OneStepMethod(one_step_theta(0.5), go_s, go_m, SEQ_CG_Jacobi(),
                        pdesolver="linear", reduction=1e-13)
    x = x0
    t = 0.0
    for _ in range(nsteps):
        x = osm.apply(t, dt, x)
        t += dt
    err = float(jnp.max(jnp.abs(xT - x)))
    assert err < 1e-9, err


def test_rollout_gradient_vs_fd():
    """grad of ||x_T||^2 w.r.t. (diffusivity, source amplitude) AND the
    initial condition: discrete adjoint == central FD."""
    V, cons, factory = _setup()
    roll = differentiable_theta_rollout(V, factory, cons, theta=0.5,
                                        tol=1e-13)
    x0 = V.interpolate(lambda q: np.sin(np.pi * q[..., 0])
                       * np.sin(np.pi * q[..., 1]))
    x0 = jnp.where(cons.mask, 0.0, x0)
    dt, nsteps = 0.02, 5

    def loss(params, x0):
        return jnp.sum(roll(x0, params, dt, nsteps) ** 2)

    params = jnp.array([0.8, 3.0])
    g_p, g_x0 = jax.grad(loss, argnums=(0, 1))(params, x0)

    eps = 1e-6
    for i in range(2):
        e = jnp.zeros(2).at[i].set(eps)
        fd = (float(loss(params + e, x0)) - float(loss(params - e, x0))) \
            / (2 * eps)
        rel = abs(fd - float(g_p[i])) / max(1e-14, abs(fd))
        assert rel < 1e-5, (i, fd, float(g_p[i]))

    # one random direction for the (169-dim) initial-condition gradient
    v = jnp.asarray(np.random.default_rng(3).standard_normal(V.ndofs))
    v = jnp.where(cons.mask, 0.0, v)
    fd = (float(loss(params, x0 + eps * v))
          - float(loss(params, x0 - eps * v))) / (2 * eps)
    ad = float(jnp.dot(g_x0, v))
    assert abs(fd - ad) / max(1e-14, abs(fd)) < 1e-5, (fd, ad)


def test_rollout_checkpointed_and_jitted():
    """checkpoint_steps=True + jit(grad): same gradient values."""
    V, cons, factory = _setup()
    x0 = jnp.where(cons.mask, 0.0,
                   V.interpolate(lambda q: q[..., 0] * (1 - q[..., 0])))
    params = jnp.array([1.0, 1.0])

    r1 = differentiable_theta_rollout(V, factory, cons, theta=1.0,
                                      tol=1e-13)
    r2 = differentiable_theta_rollout(V, factory, cons, theta=1.0,
                                      tol=1e-13, checkpoint_steps=True)

    def l1(p):
        return jnp.sum(r1(x0, p, 0.02, 4) ** 2)

    def l2(p):
        return jnp.sum(r2(x0, p, 0.02, 4) ** 2)

    g1 = jax.grad(l1)(params)
    g2 = jax.jit(jax.grad(l2))(params)
    assert np.allclose(np.asarray(g1), np.asarray(g2), rtol=1e-9)
