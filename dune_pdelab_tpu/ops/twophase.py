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
    """Rock/fluid closure functions (TwoPhaseParameterInterface analog,
    reference: twophaseccfv.hh parameter protocol — phi, K, mobilities,
    capillary closure, per-phase sources/wells, gravity, boundary data).

    `K` may be a constant or a callable K(x) (per-cell absolute
    permeability field evaluated at cell centers; interface values use the
    harmonic average, as the reference's two-point flux does). `gravity`
    is the gravity vector (e.g. (0, -9.81)); each phase flux is driven by
    the phase potential difference (p_o - p_i) - rho_alpha g.(c_o - c_i).
    """

    time = 0.0

    def __init__(self, phi=0.2, K=1.0, mu_l=1.0, mu_g=0.5,
                 rho_l=1.0, rho_g=1.0, pc_scale=1.0, gravity=None):
        self.phi = phi
        self.K = K
        self.mu_l = mu_l
        self.mu_g = mu_g
        self.rho_l = rho_l
        self.rho_g = rho_g
        self.pc_scale = pc_scale
        self.gravity = gravity

    def k_abs(self, x):
        """Absolute permeability at positions x (..., dim)."""
        if callable(self.K):
            return jnp.asarray(self.K(x))
        return jnp.asarray(self.K)

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


class BrooksCoreyParameters(TwoPhaseParameters):
    """Brooks-Corey capillary pressure + Burdine relative permeabilities
    (the standard closure set of the reference's two-phase test problems):
      S_e(pc) = (pc/pe)^(-lam)            for pc > pe, else 1
      kr_l = S_e^((2+3 lam)/lam),  kr_g = (1-S_e)^2 (1 - S_e^((2+lam)/lam))
    with residual saturations S_l = s_lr + (1 - s_lr - s_gr) S_e and a
    smooth floor eps so Newton never sees a zero derivative."""

    def __init__(self, pe=1.0, lam=2.0, s_lr=0.0, s_gr=0.0, eps=1e-4,
                 **kw):
        super().__init__(**kw)
        self.pe, self.lam = pe, lam
        self.s_lr, self.s_gr, self.eps = s_lr, s_gr, eps

    def _se(self, pc):
        r = jnp.maximum(pc / self.pe, 1.0 + self.eps)
        return r ** (-self.lam)

    def s_l(self, pc):
        se = self._se(pc)
        return self.s_lr + (1.0 - self.s_lr - self.s_gr) * se

    def _se_of_sl(self, s_l):
        se = (s_l - self.s_lr) / (1.0 - self.s_lr - self.s_gr)
        return jnp.clip(se, self.eps, 1.0 - self.eps)

    def kr_l(self, s_l):
        se = self._se_of_sl(s_l)
        return se ** ((2.0 + 3.0 * self.lam) / self.lam)

    def kr_g(self, s_l):
        se = self._se_of_sl(s_l)
        return (1.0 - se) ** 2 * (1.0 - se ** ((2.0 + self.lam) / self.lam))


class VanGenuchtenParameters(TwoPhaseParameters):
    """van Genuchten capillary pressure + Mualem relative permeabilities:
      S_e(pc) = (1 + (a pc)^n)^(-m),  m = 1 - 1/n   (pc > 0)
      kr_l = sqrt(S_e) (1 - (1 - S_e^(1/m))^m)^2
      kr_g = sqrt(1-S_e) (1 - S_e^(1/m))^(2m)"""

    def __init__(self, a=1.0, n=2.0, s_lr=0.0, s_gr=0.0, eps=1e-4, **kw):
        super().__init__(**kw)
        self.a, self.n, self.m = a, n, 1.0 - 1.0 / n
        self.s_lr, self.s_gr, self.eps = s_lr, s_gr, eps

    def s_l(self, pc):
        pc = jnp.maximum(pc, self.eps / self.a)
        se = (1.0 + (self.a * pc) ** self.n) ** (-self.m)
        return self.s_lr + (1.0 - self.s_lr - self.s_gr) * se

    def _se_of_sl(self, s_l):
        se = (s_l - self.s_lr) / (1.0 - self.s_lr - self.s_gr)
        return jnp.clip(se, self.eps, 1.0 - self.eps)

    def kr_l(self, s_l):
        se = self._se_of_sl(s_l)
        return jnp.sqrt(se) * (
            1.0 - (1.0 - se ** (1.0 / self.m)) ** self.m) ** 2

    def kr_g(self, s_l):
        se = self._se_of_sl(s_l)
        return jnp.sqrt(1.0 - se) * (
            1.0 - se ** (1.0 / self.m)) ** (2.0 * self.m)


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

    def _face_k_grav(self, ctx, d):
        """(K_harm, g.n d) at the faces: cell-center permeabilities from
        the face midpoints offset by +-d/2 along the normal, harmonically
        averaged (the reference's TPFA interface permeability); gravity
        potential drop per unit density between the two cell centers."""
        p = self.prm
        xf = ctx.x.mean(axis=-2)                       # (F, dim)
        n = jnp.asarray(ctx.normal)
        if n.ndim > 1:
            n = n.reshape(-1, n.shape[-1])[: xf.shape[0]]
        half = (d / 2.0)[..., None] if jnp.ndim(d) else d / 2.0
        Ki = jnp.broadcast_to(p.k_abs(xf - half * n), xf.shape[:1])
        Ko = jnp.broadcast_to(p.k_abs(xf + half * n), xf.shape[:1])
        Kh = 2.0 * Ki * Ko / (Ki + Ko)
        if p.gravity is None:
            gnd = 0.0
        else:
            gnd = jnp.dot(n, jnp.asarray(p.gravity, xf.dtype)) * d
        return Kh, gnd

    def alpha_skeleton(self, ctx: SkeletonContext, u_in, u_out):
        p = self.prm
        pl_i, pg_i = u_in[0][:, 0], u_in[1][:, 0]
        pl_o, pg_o = u_out[0][:, 0], u_out[1][:, 0]
        s_i = p.s_l(pg_i - pl_i)
        s_o = p.s_l(pg_o - pl_o)
        d = ctx.h_inside
        area = jnp.sum(ctx.factor, axis=-1)
        K, gnd = self._face_k_grav(ctx, d)

        def phase_flux(pi, po, rho, mob_i, mob_o):
            # phase potential drop (inside - outside) incl. gravity head
            drop = pi - po + rho * gnd
            upw = jnp.where(drop >= 0, mob_i, mob_o)
            return upw * K * drop / d * area

        mob_l_i, mob_g_i = self._mob(s_i)
        mob_l_o, mob_g_o = self._mob(s_o)
        Fl = phase_flux(pl_i, pl_o, p.rho_l, mob_l_i, mob_l_o)
        Fg = phase_flux(pg_i, pg_o, p.rho_g, mob_g_i, mob_g_o)
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
        # boundary TPFA: inside cell center at x_face - d n; the boundary
        # value sits on the face itself, so K is the inside-cell value and
        # the gravity head spans the half distance d
        xf = ctx.x.mean(axis=-2)
        n = jnp.asarray(ctx.normal)
        if n.ndim > 1:
            n = n.reshape(-1, n.shape[-1])[: xf.shape[0]]
        half = d[..., None] if jnp.ndim(d) else d
        K = jnp.broadcast_to(p.k_abs(xf - half * n), xf.shape[:1])
        if p.gravity is None:
            gnd = 0.0
        else:
            gnd = jnp.dot(n, jnp.asarray(p.gravity, xf.dtype)) * d

        def phase_flux(pi, gb, rho, mob_i, mob_b):
            drop = pi - gb + rho * gnd
            upw = jnp.where(drop >= 0, mob_i, mob_b)
            return upw * K * drop / d * area

        mob_l_i, mob_g_i = self._mob(s_i)
        mob_l_b, mob_g_b = self._mob(s_b)
        Fl = jnp.where(isd, phase_flux(pl_i, gl, p.rho_l, mob_l_i, mob_l_b),
                       0.0)
        Fg = jnp.where(isd, phase_flux(pg_i, gg, p.rho_g, mob_g_i, mob_g_b),
                       0.0)
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
