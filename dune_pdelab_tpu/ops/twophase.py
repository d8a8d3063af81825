"""Two-phase immiscible incompressible flow, cell-centered FV.

TPU-native analog of the reference kernel (reference:
dune/pdelab/localoperator/twophaseccfv.hh, 1069 LoC): phase-pressure
formulation (p_l, p_g) on PowerSpace(P0, 2), two-point flux with
phase-upwinded mobilities, capillary pressure closure S_l(p_c = p_g - p_l),
and a nonlinear storage (mass) operator for implicit time stepping via the
one-step machinery + Newton.

Spatial residual per phase alpha in {l, g} and interior face (i -> o):
  F_alpha = - lam_alpha(S_up) K_harm (p_alpha_o - p_alpha_i)/d * |F|
with S upwinded by the sign of the pressure drop; volume terms add wells
q_alpha. The storage operator contributes phi * rho_alpha * S_alpha.
"""
from __future__ import annotations

import copy

import jax.numpy as jnp

from dune_pdelab_tpu.ops.base import (
    LocalOperator, VolumeContext, FaceContext, SkeletonContext,
)


def jax_sigmoid(x):
    import jax
    return jax.nn.sigmoid(x)


class TwoPhaseParameters:
    """Rock/fluid closure functions (TwoPhaseParameterInterface analog)."""

    time = 0.0

    def __init__(self, phi=0.2, K=1.0, mu_l=1.0, mu_g=0.5,
                 rho_l=1.0, rho_g=1.0, pc_scale=1.0):
        self.phi = phi
        self.K = K
        self.mu_l = mu_l
        self.mu_g = mu_g
        self.rho_l = rho_l
        self.rho_g = rho_g
        self.pc_scale = pc_scale

    # smooth monotone capillary closure (strictly decreasing in pc, values
    # in (0,1) so the storage Jacobian never degenerates):
    #   S_l(pc) = sigmoid(4 (1/2 - pc/scale))
    def s_l(self, pc):
        return jax_sigmoid(4.0 * (0.5 - pc / self.pc_scale))

    # Corey-type relative permeabilities
    def kr_l(self, s_l):
        return jnp.clip(s_l, 0.0, 1.0) ** 2

    def kr_g(self, s_l):
        return jnp.clip(1.0 - s_l, 0.0, 1.0) ** 2

    def q_l(self, x):
        return 0.0

    def q_g(self, x):
        return 0.0

    # boundary data: per phase, Dirichlet pressure regions + values
    def is_dirichlet(self, x):
        return jnp.zeros(x.shape[:-1], bool)

    def g_l(self, x):
        return 0.0

    def g_g(self, x):
        return 0.0

    def with_time(self, t):
        p = copy.copy(self)
        p.time = t
        return p


class TwoPhaseCCFV(LocalOperator):
    is_linear = False
    quadrature_factor = 0

    def __init__(self, params: TwoPhaseParameters):
        self.prm = params

    def set_time(self, t):
        new = copy.copy(self)
        new.prm = self.prm.with_time(t)
        return new

    def _mob(self, s_l):
        return (self.prm.kr_l(s_l) / self.prm.mu_l,
                self.prm.kr_g(s_l) / self.prm.mu_g)

    def lambda_volume(self, ctx: VolumeContext):
        p = self.prm
        vol = jnp.sum(ctx.factor, axis=-1)
        ql = jnp.broadcast_to(jnp.asarray(p.q_l(ctx.x), ctx.factor.dtype),
                              ctx.x.shape[:-1])
        qg = jnp.broadcast_to(jnp.asarray(p.q_g(ctx.x), ctx.factor.dtype),
                              ctx.x.shape[:-1])
        r_l = -jnp.sum(ql * ctx.factor, axis=-1)[:, None]
        r_g = -jnp.sum(qg * ctx.factor, axis=-1)[:, None]
        return r_l, r_g

    def alpha_skeleton(self, ctx: SkeletonContext, u_in, u_out):
        p = self.prm
        pl_i, pg_i = u_in[0][:, 0], u_in[1][:, 0]
        pl_o, pg_o = u_out[0][:, 0], u_out[1][:, 0]
        s_i = p.s_l(pg_i - pl_i)
        s_o = p.s_l(pg_o - pl_o)
        d = ctx.h_inside
        area = jnp.sum(ctx.factor, axis=-1)
        K = p.K

        def phase_flux(pi, po, mob_i, mob_o):
            upw = jnp.where(pi >= po, mob_i, mob_o)  # upwind by pressure drop
            return -upw * K * (po - pi) / d * area

        mob_l_i, mob_g_i = self._mob(s_i)
        mob_l_o, mob_g_o = self._mob(s_o)
        Fl = phase_flux(pl_i, pl_o, mob_l_i, mob_l_o)
        Fg = phase_flux(pg_i, pg_o, mob_g_i, mob_g_o)
        r_in = (Fl[:, None], Fg[:, None])
        r_out = (-Fl[:, None], -Fg[:, None])
        return r_in, r_out

    def alpha_boundary(self, ctx: FaceContext, u):
        p = self.prm
        pl_i, pg_i = u[0][:, 0], u[1][:, 0]
        s_i = p.s_l(pg_i - pl_i)
        isd = jnp.broadcast_to(jnp.asarray(p.is_dirichlet(ctx.x)),
                               ctx.x.shape[:-1]).any(axis=-1)
        gl = jnp.broadcast_to(jnp.asarray(p.g_l(ctx.x), pl_i.dtype),
                              ctx.x.shape[:-1]).mean(axis=-1)
        gg = jnp.broadcast_to(jnp.asarray(p.g_g(ctx.x), pl_i.dtype),
                              ctx.x.shape[:-1]).mean(axis=-1)
        s_b = p.s_l(gg - gl)
        d = ctx.h_inside / 2.0
        area = jnp.sum(ctx.factor, axis=-1)
        K = p.K

        def phase_flux(pi, gb, mob_i, mob_b):
            upw = jnp.where(pi >= gb, mob_i, mob_b)
            return -upw * K * (gb - pi) / d * area

        mob_l_i, mob_g_i = self._mob(s_i)
        mob_l_b, mob_g_b = self._mob(s_b)
        Fl = jnp.where(isd, phase_flux(pl_i, gl, mob_l_i, mob_l_b), 0.0)
        Fg = jnp.where(isd, phase_flux(pg_i, gg, mob_g_i, mob_g_b), 0.0)
        return Fl[:, None], Fg[:, None]


class TwoPhaseStorage(LocalOperator):
    """Temporal operator: d/dt [phi rho_alpha S_alpha] per cell (the
    nonlinear mass term; fed to OneStepGridOperator as go1)."""

    is_linear = False
    quadrature_factor = 0

    def __init__(self, params: TwoPhaseParameters):
        self.prm = params

    def set_time(self, t):
        new = copy.copy(self)
        new.prm = self.prm.with_time(t)
        return new

    def alpha_volume(self, ctx: VolumeContext, u):
        p = self.prm
        pl, pg = u[0][:, 0], u[1][:, 0]
        vol = jnp.sum(ctx.factor, axis=-1)
        s_l = p.s_l(pg - pl)
        r_l = p.phi * p.rho_l * s_l * vol
        r_g = p.phi * p.rho_g * (1.0 - s_l) * vol
        return r_l[:, None], r_g[:, None]
