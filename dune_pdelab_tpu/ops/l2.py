"""L2 (mass) operator — the temporal operator for time stepping.

Reference: dune/pdelab/localoperator/l2.hh:149 (class L2) and
navierstokesmass.hh; scaled mass ∫ scale * u v dx, applied per leaf for
composite spaces.
"""
from __future__ import annotations

import jax.numpy as jnp

from dune_pdelab_tpu.ops.base import LocalOperator, VolumeContext


class L2(LocalOperator):
    """alpha_volume = ∫ scale * u v dx (scale may be a callable of x)."""

    is_linear = True
    qp_separable = True
    quadrature_factor = 2

    def __init__(self, scale=1.0, quadrature_add: int = 0):
        self.scale = scale
        self.quadrature_add = quadrature_add
        # constant scale -> translation invariant (qualifies the stencil
        # compilers' huge-mesh proxy path, assembly/stencil.py)
        self.spatially_invariant = not callable(scale)

    def _scale(self, ctx):
        return self.scale(ctx.x) if callable(self.scale) else self.scale

    def alpha_volume(self, ctx: VolumeContext, u):
        s = self._scale(ctx)
        if isinstance(u, tuple):
            return tuple(
                self.accumulate_value(t, ctx.factor, s * self.value_at_qp(t, ui))
                for t, ui in zip(ctx.tabs, u)
            )
        tab = ctx.tab
        return self.accumulate_value(tab, ctx.factor, s * self.value_at_qp(tab, u))


class L2VolumeFunctional(LocalOperator):
    """lambda-only right-hand side ∫ f v dx (reference:
    dune/pdelab/localoperator/l2volumefunctional.hh)."""

    is_linear = True

    def __init__(self, f, quadrature_add: int = 0):
        self.f = f
        self.quadrature_add = quadrature_add

    def lambda_volume(self, ctx: VolumeContext):
        fv = jnp.broadcast_to(jnp.asarray(self.f(ctx.x), ctx.factor.dtype),
                              ctx.x.shape[:-1])
        if len(ctx.tabs) > 1:
            return tuple(
                self.accumulate_value(t, ctx.factor, -fv) for t in ctx.tabs
            )
        return self.accumulate_value(ctx.tab, ctx.factor, -fv)
