"""Linear elasticity operator on vector (Power) spaces.

TPU-native analog of the reference kernel (reference:
dune/pdelab/localoperator/linearelasticity.hh:38 + parameter class
linearelasticityparameter.hh). Weak form (residual convention):

  sum_c ∫ mu (∂u_c/∂x_j + ∂u_j/∂x_c) ∂φ_c/∂x_j
        + lambda (∇·u) ∂φ_c/∂x_c  -  f_c φ_c dx  -  ∮_ΓN t_c φ_c ds

with Lame parameters lambda/mu, body force f, surface traction t, and
strongly imposed Dirichlet displacements.
"""
from __future__ import annotations

import copy

import jax.numpy as jnp

from dune_pdelab_tpu.ops.base import LocalOperator, VolumeContext, FaceContext


class LinearElasticityParameters:
    """Lame coefficients + loads (linearelasticityparameter.hh analog)."""

    time = 0.0

    def __init__(self, lam=1.0, mu=1.0):
        self.lam = lam
        self.mu = mu

    def f(self, x):
        """Body force (..., dim)."""
        return jnp.zeros_like(x)

    def g(self, x):
        """Dirichlet displacement (..., dim)."""
        return jnp.zeros_like(x)

    def traction(self, x):
        """Neumann surface traction (..., dim) (zero = free surface)."""
        return jnp.zeros_like(x)

    def is_neumann(self, x):
        """Boundary classification at face points: True -> traction BC."""
        return jnp.zeros(x.shape[:-1], bool)

    def with_time(self, t):
        p = copy.copy(self)
        p.time = t
        return p

    def dirichlet_bctype(self):
        import numpy as np

        def bc(x):
            return ~np.asarray(self.is_neumann(jnp.asarray(x)))
        return bc


class LinearElasticity(LocalOperator):
    """Vector-valued kernel; u = (u_0, ..., u_{d-1}) leaf tuple."""

    is_linear = True

    def __init__(self, params: LinearElasticityParameters):
        self.params = params

    def set_time(self, t):
        new = copy.copy(self)
        new.params = self.params.with_time(t)
        return new

    def alpha_volume(self, ctx: VolumeContext, u):
        dim = ctx.x.shape[-1]
        assert len(u) == dim
        tab = ctx.tabs[0]
        lam, mu = self.params.lam, self.params.mu
        g = [self.gradient_at_qp(tab, u[c]) for c in range(dim)]  # (E,nqp,d)
        div = sum(g[c][..., c] for c in range(dim))
        r = []
        for c in range(dim):
            # w_j = mu (du_c/dx_j + du_j/dx_c) + lam div(u) delta_jc
            wvec = mu * (g[c] + jnp.stack([g[j][..., c] for j in range(dim)],
                                          axis=-1))
            wvec = wvec.at[..., c].add(lam * div)
            r.append(self.accumulate_gradient(tab, ctx.factor, wvec))
        return tuple(r)

    def lambda_volume(self, ctx: VolumeContext):
        dim = ctx.x.shape[-1]
        tab = ctx.tabs[0]
        f = jnp.broadcast_to(
            jnp.asarray(self.params.f(ctx.x), ctx.factor.dtype), ctx.x.shape)
        return tuple(self.accumulate_value(tab, ctx.factor, -f[..., c])
                     for c in range(dim))

    def lambda_boundary(self, ctx: FaceContext):
        dim = ctx.x.shape[-1]
        tab = ctx.tabs[0]
        nm = jnp.broadcast_to(
            jnp.asarray(self.params.is_neumann(ctx.x)), ctx.x.shape[:-1])
        t = jnp.broadcast_to(
            jnp.asarray(self.params.traction(ctx.x), ctx.factor.dtype),
            ctx.x.shape)
        return tuple(
            self.accumulate_value(tab, ctx.factor,
                                  jnp.where(nm, -t[..., c], 0.0))
            for c in range(dim)
        )
