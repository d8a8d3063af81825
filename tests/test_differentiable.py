"""Differentiable solves: adjoint gradients via the implicit function
theorem (solvers/differentiable.py) checked against central finite
differences of the full solve. Beyond the C++ reference (no sensitivity
machinery exists there) — this is the TPU-native framework exercising
JAX transformations through the whole assembly + solver stack."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import dune_pdelab_tpu as pt
from dune_pdelab_tpu.ops import (
    ConvectionDiffusionProblem, ConvectionDiffusionFEM,
)
from dune_pdelab_tpu.solvers import (
    parametric_residual, implicit_solve, opaque_forward,
    differentiable_stationary_solve, NewtonMethod, SEQ_CG_Jacobi,
)

pytestmark = pytest.mark.fast


def _make_factory():
    def factory(theta):
        class P(ConvectionDiffusionProblem):
            def A(self, x):
                a = theta[0] + theta[1] * x[..., 0] + theta[2] * x[..., 1]
                return (a[..., None, None]
                        * jnp.eye(x.shape[-1], dtype=x.dtype))

            def f(self, x):
                return jnp.ones(x.shape[:-1], x.dtype)
        return ConvectionDiffusionFEM(P())
    return factory


def _fd_grad(loss, theta, eps=1e-6):
    g = np.zeros(len(theta))
    for i in range(len(theta)):
        e = np.zeros(len(theta))
        e[i] = eps
        g[i] = (float(loss(theta + e)) - float(loss(theta - e))) / (2 * eps)
    return g


def test_linear_adjoint_gradient_vs_fd():
    """grad of J(theta) = ||x(theta) - x_t||^2 through a Poisson solve
    with a theta-parametrized diffusion tensor: adjoint == central FD."""
    mesh = pt.StructuredMesh([0, 0], [1, 1], (10, 10))
    V = pt.FunctionSpace(mesh, pt.QkFEM(1, 2))
    cons = pt.constraints(True, V)
    factory = _make_factory()

    f = differentiable_stationary_solve(V, factory, constraints=cons,
                                        solver="cg", tol=1e-13)
    x_t = jnp.asarray(
        np.random.default_rng(0).standard_normal(V.ndofs) * 0.01)

    def loss(theta):
        x = f(jnp.asarray(theta))
        return jnp.sum((x - x_t) ** 2)

    theta0 = jnp.array([1.0, 0.4, -0.3])
    g_ad = np.asarray(jax.grad(loss)(theta0))
    # directional FD (2 extra solves instead of 6 — this is the CI-gate
    # oracle; the slow tier checks every component on the other tests)
    v = np.asarray([0.6, -0.3, 0.4])
    eps = 1e-6
    fd = (float(loss(theta0 + eps * v)) - float(loss(theta0 - eps * v))) \
        / (2 * eps)
    ad = float(np.dot(g_ad, v))
    assert abs(fd - ad) / max(1e-14, abs(fd)) < 1e-5, (fd, ad)


def test_gradient_composes_with_jit():
    """jit(value_and_grad(loss)) compiles and matches the eager gradient."""
    mesh = pt.StructuredMesh([0, 0], [1, 1], (6, 6))
    V = pt.FunctionSpace(mesh, pt.QkFEM(1, 2))
    cons = pt.constraints(True, V)
    f = differentiable_stationary_solve(V, _make_factory(),
                                        constraints=cons, tol=1e-13)

    def loss(theta):
        x = f(theta)
        return jnp.sum(x ** 2)

    theta0 = jnp.array([1.2, 0.1, 0.2])
    v1, g1 = jax.value_and_grad(loss)(theta0)
    v2, g2 = jax.jit(jax.value_and_grad(loss))(theta0)
    assert np.allclose(float(v1), float(v2), rtol=1e-12)
    assert np.allclose(np.asarray(g1), np.asarray(g2), rtol=1e-9)


def test_opaque_newton_forward_gradient():
    """Nonlinear problem -div((theta0 + theta1*u^2) grad u) = f solved by
    the (host-side, untraceable) NewtonMethod driver wrapped in
    opaque_forward: the adjoint gradient still matches FD."""
    mesh = pt.StructuredMesh([0, 0], [1, 1], (8, 8))
    V = pt.FunctionSpace(mesh, pt.QkFEM(1, 2))
    cons = pt.constraints(True, V)

    def factory(theta):
        class P(ConvectionDiffusionProblem):
            def A(self, x, u=None):
                a = theta[0] + 0 * x[..., 0]
                return (a[..., None, None]
                        * jnp.eye(x.shape[-1], dtype=x.dtype))

            def c(self, x):
                return theta[1] + 0 * x[..., 0]

            def f(self, x):
                return jnp.ones(x.shape[:-1], x.dtype)
        return ConvectionDiffusionFEM(P())

    R = parametric_residual(V, factory, constraints=cons)

    def solve_py(theta):
        go = pt.GridOperator(V, factory(jnp.asarray(theta)),
                             constraints=cons)
        nm = NewtonMethod(go, SEQ_CG_Jacobi(), reduction=1e-13,
                          verbose=0)
        return np.asarray(nm.apply(V.zero()))

    forward = opaque_forward(solve_py, V.zero())
    f = implicit_solve(R, forward, constraints=cons,
                       adjoint_solver="cg", adjoint_tol=1e-13)

    def loss(theta):
        x = f(theta)
        return jnp.sum(x ** 2)

    theta0 = jnp.array([1.0, 0.5])
    g_ad = np.asarray(jax.grad(loss)(theta0))
    g_fd = _fd_grad(loss, np.asarray(theta0))
    rel = np.abs(g_ad - g_fd).max() / np.abs(g_fd).max()
    assert rel < 1e-5, (g_ad, g_fd, rel)


def test_theta_dependent_dirichlet_data():
    """Boundary data g = theta[3]*(x+y): the x0_fn term of the adjoint
    (Dirichlet rows x_c - x0_c(theta)) must carry its theta-derivative."""
    mesh = pt.StructuredMesh([0, 0], [1, 1], (8, 8))
    V = pt.FunctionSpace(mesh, pt.QkFEM(1, 2))
    cons = pt.constraints(True, V)
    factory = _make_factory()

    # V.interpolate is host-side numpy (setup phase): exploit linearity
    # and interpolate the unit boundary profile once, scaling by theta
    # inside the traceable x0_fn
    xg_unit = V.interpolate(lambda q: q[..., 0] + q[..., 1])

    def x0_fn(theta):
        return jnp.where(cons.mask, theta[3] * xg_unit, 0.0)

    f = differentiable_stationary_solve(V, factory, constraints=cons,
                                        x0_fn=x0_fn, tol=1e-13)

    def loss(theta):
        x = f(jnp.asarray(theta))
        return jnp.sum(x ** 2)

    theta0 = jnp.array([1.0, 0.2, -0.1, 0.7])
    g_ad = np.asarray(jax.grad(loss)(theta0))
    g_fd = _fd_grad(loss, np.asarray(theta0))
    rel = np.abs(g_ad - g_fd).max() / np.abs(g_fd).max()
    assert rel < 1e-5, (g_ad, g_fd, rel)


def test_vmap_parameter_sweep():
    """Batched parameter sweeps: jax.vmap over the differentiable solve
    (and over its gradients) matches per-parameter solves to machine
    precision — parameter studies run as ONE batched device program."""
    mesh = pt.StructuredMesh([0, 0], [1, 1], (6, 6))
    V = pt.FunctionSpace(mesh, pt.QkFEM(1, 2))
    cons = pt.constraints(True, V)

    def factory(theta):
        class P(ConvectionDiffusionProblem):
            def A(self, x):
                a = theta[0] + theta[1] * x[..., 0]
                return (a[..., None, None]
                        * jnp.eye(x.shape[-1], dtype=x.dtype))

            def f(self, x):
                return jnp.ones(x.shape[:-1], x.dtype)
        return ConvectionDiffusionFEM(P())

    f = differentiable_stationary_solve(V, factory, constraints=cons,
                                        tol=1e-12)
    thetas = jnp.array([[1.0, 0.0], [1.5, 0.3], [0.7, -0.2]])
    xs = jax.vmap(f)(thetas)
    xs_ref = jnp.stack([f(t) for t in thetas])
    assert float(jnp.max(jnp.abs(xs - xs_ref))) < 1e-14

    gfun = jax.grad(lambda t: jnp.sum(f(t) ** 2))
    g = jax.vmap(gfun)(thetas)
    g_ref = jnp.stack([gfun(t) for t in thetas])
    assert float(jnp.max(jnp.abs(g - g_ref))) < 1e-13


def test_stokes_viscosity_gradient():
    """Composite-space adjoint: grad of a velocity functional of a
    Taylor-Hood Stokes solve w.r.t. a spatially varying viscosity
    mu(x) = theta0 + theta1*x matches directional FD (symmetric
    indefinite adjoint solved by GMRES on the free block)."""
    from dune_pdelab_tpu.ops.stokes import (
        NavierStokesParameters, TaylorHoodNavierStokes,
    )
    from dune_pdelab_tpu.solvers.stokes import (
        taylor_hood_space, stokes_constraints,
    )
    from dune_pdelab_tpu.linalg.krylov import restarted_gmres

    mesh = pt.StructuredMesh([0, 0], [1, 1], (5, 5))
    W = taylor_hood_space(mesh, degree=2)
    cons = stokes_constraints(W, bctype=True, pin_pressure=True)

    class Cavity(NavierStokesParameters):
        def f(self, x):
            fx = jnp.sin(np.pi * x[..., 0]) * jnp.cos(np.pi * x[..., 1])
            return jnp.stack([fx, -fx], axis=-1)

    def factory(theta):
        return TaylorHoodNavierStokes(Cavity(
            mu=lambda x: theta[0] + theta[1] * x[..., 0], rho=0.0))

    R = parametric_residual(W, factory, constraints=cons)

    def forward(theta):
        go = pt.GridOperator(W, factory(theta), constraints=cons)
        x0 = W.zero()
        z, _ = restarted_gmres(lambda p: go.jacobian_apply(x0, p),
                               go.residual(x0), tol=1e-12, restart=200,
                               maxiter=5000)
        return x0 - z

    f = implicit_solve(R, forward, constraints=cons,
                       adjoint_solver="gmres", adjoint_tol=1e-12,
                       adjoint_maxiter=5000)

    def loss(theta):
        x = f(theta)
        return jnp.sum(W.restrict(x, 0) ** 2)

    theta0 = jnp.array([1.0, 0.5])
    g_ad = np.asarray(jax.grad(loss)(theta0))
    v = np.asarray([0.7, -0.4])
    eps = 1e-6
    fd = (float(loss(theta0 + eps * v)) - float(loss(theta0 - eps * v))) \
        / (2 * eps)
    ad = float(np.dot(g_ad, v))
    assert abs(fd - ad) / max(1e-14, abs(fd)) < 1e-5, (fd, ad, g_ad)
