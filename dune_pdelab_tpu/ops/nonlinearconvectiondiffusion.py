"""Nonlinear convection-diffusion FEM kernel with the reference's
(f, w, v, D, q, j) parameter protocol.

TPU-native analog of dune/pdelab/localoperator/nonlinearconvectiondiffusionfem.hh
(parameter interface :76-160, kernel :247-392). PDE solved:

    div( q(x,u) - D(x) v(u) grad w(u) ) = f(x,u)   in Omega
    u = g                                           on Gamma_D
    (q - D grad w(u)) . n = j                       on Gamma_N

Reference semantics preserved exactly (:272-275, :293-328): the
nonlinearity w is applied NODALLY (w_i = w(u_i), Lagrange-basis
assumption), so the kernel works with the interpolant w_h = sum_i w(u_i)
phi_i; the `u` argument handed to f, q, v at quadrature points is w_h's
value there. The reference's hand-written FD Jacobian (:392+) is replaced
by exact AD — the grid operator differentiates this residual with jvp.
"""
from __future__ import annotations

import copy

import jax.numpy as jnp

from dune_pdelab_tpu.ops.base import LocalOperator, VolumeContext, FaceContext
from dune_pdelab_tpu.ops.convectiondiffusion import (
    BCType, apply_tensor, _is_zero,
)


class NonlinearConvectionDiffusionProblem:
    """Parameter protocol (nonlinearconvectiondiffusionfem.hh:76-160).

    Every method takes batched physical points x (..., dim); the
    state-dependent ones additionally take the (broadcast-compatible)
    scalar state. Defaults reduce the PDE to -Laplace(u) = 0.
    """

    time = 0.0

    def f(self, x, u):
        """Source term f(x,u)."""
        return 0.0

    def w(self, x, u):
        """Nonlinearity under the gradient (applied nodally)."""
        return u

    def v(self, x, u):
        """Scalar diffusion multiplier v(u)."""
        return 1.0

    def D(self, x):
        """Diffusion tensor: scalar, (...,) field, or (..., d, d)."""
        return 1.0

    def q(self, x, u):
        """Convective flux vector q(x,u): (..., dim)."""
        return jnp.zeros_like(x)

    def j(self, x):
        """Neumann flux."""
        return 0.0

    def bctype(self, x):
        return BCType.DIRICHLET

    def g(self, x):
        """Dirichlet value / initial-guess extension."""
        return 0.0

    def with_time(self, t):
        p = copy.copy(self)
        p.time = t
        return p

    def dirichlet_bctype(self):
        import numpy as np

        def bc(x):
            v = self.bctype(x)
            return np.broadcast_to(np.asarray(v) == BCType.DIRICHLET,
                                   x.shape[:-1])
        return bc


class NonlinearConvectionDiffusionFEM(LocalOperator):
    """Conforming FEM kernel (nonlinearconvectiondiffusionfem.hh:247)."""

    is_linear = False

    def __init__(self, problem: NonlinearConvectionDiffusionProblem,
                 quadrature_add: int = 2):
        self.problem = problem
        self.quadrature_add = quadrature_add

    def set_time(self, t):
        new = copy.copy(self)
        new.problem = self.problem.with_time(t)
        return new

    def _nodal_w(self, ctx, u):
        """w applied at the nodes with the element-center position
        (reference :273-275 evaluates w at the reference-element center)."""
        xc = jnp.mean(ctx.x, axis=1)                    # (E, dim)
        return jnp.asarray(self.problem.w(xc[:, None, :], u))

    def alpha_volume(self, ctx: VolumeContext, u):
        p, tab = self.problem, ctx.tab
        wn = self._nodal_w(ctx, u)                      # (E, nb)
        wq = self.value_at_qp(tab, wn)                  # (E, nqp)
        gw = self.gradient_at_qp(tab, wn)               # (E, nqp, d)
        flux = apply_tensor(jnp.asarray(p.D(ctx.x)),
                            jnp.asarray(p.v(ctx.x, wq))[..., None] * gw)
        q = jnp.asarray(p.q(ctx.x, wq))
        if q.shape != flux.shape:
            q = jnp.broadcast_to(q, flux.shape)
        r = self.accumulate_gradient(tab, ctx.factor, flux - q)
        fv = p.f(ctx.x, wq)
        if not _is_zero(fv):
            fq = jnp.broadcast_to(jnp.asarray(fv, ctx.factor.dtype),
                                  ctx.x.shape[:-1])
            r = r - self.accumulate_value(tab, ctx.factor, fq)
        return r

    def alpha_boundary(self, ctx: FaceContext, u):
        """Neumann faces: + j phi (reference :334-392; Dirichlet faces are
        strongly constrained and skipped)."""
        p, tab = self.problem, ctx.tab
        bct = jnp.broadcast_to(jnp.asarray(p.bctype(ctx.x)),
                               ctx.x.shape[:-1])
        jq = jnp.broadcast_to(jnp.asarray(p.j(ctx.x), ctx.factor.dtype),
                              ctx.x.shape[:-1])
        w = jnp.where(bct == BCType.NEUMANN, jq, 0.0)
        return self.accumulate_value(tab, ctx.factor, w)
