"""Two-phase immiscible flow, cell-centered FV, full parameter protocol.

TPU-native analog of the reference kernel (reference:
dune/pdelab/localoperator/twophaseccfv.hh, 1069 LoC): phase-pressure
formulation (p_l, p_g) on PowerSpace(P0, 2) with the reference's complete
TwoPhaseParameterInterface (twophaseccfv.hh:69-238):

  * pressure-dependent phase densities rho_alpha(x, p) and dynamic
    viscosities mu_alpha(x, p) (compressible phases),
  * phase compressibility factors nu_alpha(x, p) multiplying both the
    storage and the flux terms (mass-conservative form; the default
    nu_alpha = rho_alpha reduces to the classic incompressible
    phase-pressure equations scaled by the constant densities),
  * per-cell porosity phi(x) and absolute permeability K(x),
  * per-phase boundary-condition codes bc_alpha in {1: Dirichlet pressure
    g_alpha, 0: Neumann mass flux j_alpha} (twophaseccfv.hh:425-503
    alpha_boundary + lambda_boundary),
  * per-phase wells/sources q_alpha and equation scalings scale_alpha.

Flux scheme (reference-exact, twophaseccfv.hh:300-405): for each interior
face (i -> o) and phase alpha,

  w     = (p_i - p_o)/dist + aavg(rho_i, rho_o) g.n       (potential grad)
  s_up  = S_l(pc_upwind)  with pc upwinded by sign(w)     (upwind closure)
  sigma = havg(lam_i K_i, lam_o K_o),  lam_side = kr(s_up)/mu_side
  F     = scale * aavg(nu_i, nu_o) * sigma * w * |face|

i.e. the saturation is upwinded FIRST and the phase mobility*permeability
product is then harmonically averaged across the face — not an upwinding
of the whole mobility. Dirichlet boundary faces use the inside-cell
saturation/mobility (twophaseccfv.hh:446-470; no boundary-state upwind).
The reference's gas-phase Dirichlet term scales by scale_l
(twophaseccfv.hh:499) — an evident typo not reproduced here: we use
scale_g.

`V_l`/`V_g` (twophaseccfv.hh:607,842) map to `TwoPhaseVelocity`: per-face
phase mass velocities reproducing the solver's TPFA fluxes, RT0 cell
evaluation, and discrete divergence.
"""
from __future__ import annotations

import copy

import numpy as np
import jax.numpy as jnp

from dune_pdelab_tpu.ops.base import (
    LocalOperator, VolumeContext, FaceContext, SkeletonContext,
)


def jax_sigmoid(x):
    import jax
    return jax.nn.sigmoid(x)


def _aavg(a, b):
    return 0.5 * (a + b)


def _havg(a, b, eps=1e-30):
    return 2.0 / (1.0 / (a + eps) + 1.0 / (b + eps))


class TwoPhaseParameters:
    """Rock/fluid closure functions (TwoPhaseParameterInterface analog,
    reference: twophaseccfv.hh:69-238).

    Constructor scalars stay available as attributes (`prm.rho_l`, ...);
    the pressure-dependent protocol lives in the overridable methods
    `density_l/g(x, p)`, `viscosity_l/g(x, p)`, `nu_l/g(x, p)`,
    `porosity(x)`. `K` may be a constant or callable K(x) (per-cell
    absolute permeability at cell centers; interfaces harmonically average
    lambda*K per the reference's scheme). `gravity` is the gravity vector
    (e.g. (0, -9.81)); fluxes are driven by w = dp/dist + rho_avg g.n.
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

    # -- pressure-dependent fluid protocol (twophaseccfv.hh:127-173) --------
    def density_l(self, x, p_l):
        """Liquid density at positions x, pressures p_l (rho_l analog)."""
        return jnp.broadcast_to(jnp.asarray(self.rho_l, p_l.dtype), p_l.shape)

    def density_g(self, x, p_g):
        return jnp.broadcast_to(jnp.asarray(self.rho_g, p_g.dtype), p_g.shape)

    def viscosity_l(self, x, p_l):
        """Dynamic viscosity of the liquid phase (mu_l analog)."""
        return jnp.broadcast_to(jnp.asarray(self.mu_l, p_l.dtype), p_l.shape)

    def viscosity_g(self, x, p_g):
        return jnp.broadcast_to(jnp.asarray(self.mu_g, p_g.dtype), p_g.shape)

    def nu_l(self, x, p_l):
        """Phase compressibility factor (twophaseccfv.hh:139-158): scales
        storage AND flux. Default rho_alpha(x, p): mass-conservative form;
        override to 1 for the volume-balance (incompressible) form."""
        return self.density_l(x, p_l)

    def nu_g(self, x, p_g):
        return self.density_g(x, p_g)

    def porosity(self, x):
        """Per-cell porosity phi(x) (twophaseccfv.hh:109)."""
        return jnp.asarray(self.phi)

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

    # -- boundary protocol (twophaseccfv.hh:196-231) ------------------------
    # codes per phase: 1 = Dirichlet pressure g_alpha, 0 = Neumann mass
    # flux j_alpha (outward-positive). Defaults derive from is_dirichlet()
    # with j = 0, i.e. no-flow outside the Dirichlet region (back-compat).
    def is_dirichlet(self, x):
        return jnp.zeros(x.shape[:-1], bool)

    def bc_l(self, x):
        return jnp.where(self.is_dirichlet(x), 1, 0)

    def bc_g(self, x):
        return jnp.where(self.is_dirichlet(x), 1, 0)

    def g_l(self, x):
        return 0.0

    def g_g(self, x):
        return 0.0

    def j_l(self, x):
        return 0.0

    def j_g(self, x):
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


def _face_geometry(ctx, dist):
    """(x_face, n, x_in_center, x_out_center) for a TPFA face batch:
    cell centers offset from the face midpoints by +-dist/2 along n."""
    xf = ctx.x.mean(axis=-2)                       # (F, dim)
    n = jnp.asarray(ctx.normal)
    if n.ndim > 1:
        n = n.reshape(-1, n.shape[-1])[: xf.shape[0]]
    half = (dist / 2.0)[..., None] if jnp.ndim(dist) else dist / 2.0
    return xf, n, xf - half * n, xf + half * n


class TwoPhaseCCFV(LocalOperator):
    """TwoPhaseTwoPointFluxOperator analog (twophaseccfv.hh:244-512)."""

    is_linear = False
    quadrature_factor = 0

    def __init__(self, params: TwoPhaseParameters, scale_l=1.0, scale_g=1.0):
        self.prm = params
        self.scale_l = scale_l
        self.scale_g = scale_g

    def set_time(self, t):
        new = copy.copy(self)
        new.prm = self.prm.with_time(t)
        return new

    def lambda_volume(self, ctx: VolumeContext):
        p = self.prm
        ql = jnp.broadcast_to(jnp.asarray(p.q_l(ctx.x), ctx.factor.dtype),
                              ctx.x.shape[:-1])
        qg = jnp.broadcast_to(jnp.asarray(p.q_g(ctx.x), ctx.factor.dtype),
                              ctx.x.shape[:-1])
        r_l = -self.scale_l * jnp.sum(ql * ctx.factor, axis=-1)[:, None]
        r_g = -self.scale_g * jnp.sum(qg * ctx.factor, axis=-1)[:, None]
        return r_l, r_g

    def _gn(self, n, dtype):
        if self.prm.gravity is None:
            return jnp.zeros((), dtype)
        return jnp.dot(n, jnp.asarray(self.prm.gravity, dtype))

    def _phase_face_flux(self, p_i, p_o, dist, gn, area, rho_i, rho_o,
                         nu_i, nu_o, mu_i, mu_o, K_i, K_o,
                         s_i, s_o, kr):
        """Reference interior-face scheme for one phase; returns F (signed
        toward outside) to accumulate +F inside, -F outside. `kr` takes
        the upwinded LIQUID saturation (both kr_l and kr_g do)."""
        w = (p_i - p_o) / dist + _aavg(rho_i, rho_o) * gn
        s_up = jnp.where(w >= 0, s_i, s_o)
        lam_i = kr(s_up) / mu_i
        lam_o = kr(s_up) / mu_o
        sigma = _havg(lam_i * K_i, lam_o * K_o)
        return _aavg(nu_i, nu_o) * sigma * w * area

    def alpha_skeleton(self, ctx: SkeletonContext, u_in, u_out):
        p = self.prm
        pl_i, pg_i = u_in[0][:, 0], u_in[1][:, 0]
        pl_o, pg_o = u_out[0][:, 0], u_out[1][:, 0]
        s_i = p.s_l(pg_i - pl_i)
        s_o = p.s_l(pg_o - pl_o)
        dist = _aavg(ctx.h_inside, ctx.h_outside)
        area = jnp.sum(ctx.factor, axis=-1)
        xf, n, x_i, x_o = _face_geometry(ctx, dist)
        K_i = jnp.broadcast_to(p.k_abs(x_i), xf.shape[:1])
        K_o = jnp.broadcast_to(p.k_abs(x_o), xf.shape[:1])
        gn = self._gn(n, xf.dtype)

        Fl = self._phase_face_flux(
            pl_i, pl_o, dist, gn, area,
            p.density_l(x_i, pl_i), p.density_l(x_o, pl_o),
            p.nu_l(x_i, pl_i), p.nu_l(x_o, pl_o),
            p.viscosity_l(x_i, pl_i), p.viscosity_l(x_o, pl_o),
            K_i, K_o, s_i, s_o, p.kr_l) * self.scale_l
        Fg = self._phase_face_flux(
            pg_i, pg_o, dist, gn, area,
            p.density_g(x_i, pg_i), p.density_g(x_o, pg_o),
            p.nu_g(x_i, pg_i), p.nu_g(x_o, pg_o),
            p.viscosity_g(x_i, pg_i), p.viscosity_g(x_o, pg_o),
            K_i, K_o, s_i, s_o, p.kr_g) * self.scale_g
        r_in = (Fl[:, None], Fg[:, None])
        r_out = (-Fl[:, None], -Fg[:, None])
        return r_in, r_out

    def alpha_boundary(self, ctx: FaceContext, u):
        """Dirichlet faces (bc==1): inside-cell mobility (reference
        twophaseccfv.hh:446-470 uses the inside saturation — no
        boundary-state upwind)."""
        p = self.prm
        pl_i, pg_i = u[0][:, 0], u[1][:, 0]
        s_i = p.s_l(pg_i - pl_i)
        dist = ctx.h_inside / 2.0
        area = jnp.sum(ctx.factor, axis=-1)
        xf = ctx.x.mean(axis=-2)
        n = jnp.asarray(ctx.normal)
        if n.ndim > 1:
            n = n.reshape(-1, n.shape[-1])[: xf.shape[0]]
        half = dist[..., None] if jnp.ndim(dist) else dist
        x_i = xf - half * n
        K_i = jnp.broadcast_to(p.k_abs(x_i), xf.shape[:1])
        gn = self._gn(n, xf.dtype)
        bcl = jnp.broadcast_to(jnp.asarray(p.bc_l(ctx.x)),
                               ctx.x.shape[:-1]).max(axis=-1)
        bcg = jnp.broadcast_to(jnp.asarray(p.bc_g(ctx.x)),
                               ctx.x.shape[:-1]).max(axis=-1)
        gl = jnp.broadcast_to(jnp.asarray(p.g_l(ctx.x), pl_i.dtype),
                              ctx.x.shape[:-1]).mean(axis=-1)
        gg = jnp.broadcast_to(jnp.asarray(p.g_g(ctx.x), pl_i.dtype),
                              ctx.x.shape[:-1]).mean(axis=-1)

        w_l = (pl_i - gl) / dist + p.density_l(x_i, pl_i) * gn
        sig_l = (p.kr_l(s_i) / p.viscosity_l(x_i, pl_i)) * K_i
        Fl = jnp.where(bcl == 1,
                       self.scale_l * p.nu_l(x_i, pl_i) * sig_l * w_l * area,
                       0.0)
        w_g = (pg_i - gg) / dist + p.density_g(x_i, pg_i) * gn
        sig_g = (p.kr_g(s_i) / p.viscosity_g(x_i, pg_i)) * K_i
        Fg = jnp.where(bcg == 1,
                       self.scale_g * p.nu_g(x_i, pg_i) * sig_g * w_g * area,
                       0.0)
        return Fl[:, None], Fg[:, None]

    def lambda_boundary(self, ctx: FaceContext):
        """Neumann faces (bc==0): prescribed outward mass flux j_alpha
        (twophaseccfv.hh:474-503 lambda_boundary)."""
        p = self.prm
        area = jnp.sum(ctx.factor, axis=-1)
        bcl = jnp.broadcast_to(jnp.asarray(p.bc_l(ctx.x)),
                               ctx.x.shape[:-1]).max(axis=-1)
        bcg = jnp.broadcast_to(jnp.asarray(p.bc_g(ctx.x)),
                               ctx.x.shape[:-1]).max(axis=-1)
        jl = jnp.broadcast_to(jnp.asarray(p.j_l(ctx.x), ctx.factor.dtype),
                              ctx.x.shape[:-1]).mean(axis=-1)
        jg = jnp.broadcast_to(jnp.asarray(p.j_g(ctx.x), ctx.factor.dtype),
                              ctx.x.shape[:-1]).mean(axis=-1)
        r_l = jnp.where(bcl == 0, self.scale_l * jl * area, 0.0)
        r_g = jnp.where(bcg == 0, self.scale_g * jg * area, 0.0)
        return r_l[:, None], r_g[:, None]


class TwoPhaseStorage(LocalOperator):
    """Temporal operator (TwoPhaseOnePointTemporalOperator analog,
    twophaseccfv.hh:538-595): d/dt [phi(x) nu_alpha(x, p) S_alpha] per
    cell; fed to OneStepGridOperator as go1. With the default
    nu_alpha = rho_alpha this is the mass per cell."""

    is_linear = False
    quadrature_factor = 0

    def __init__(self, params: TwoPhaseParameters, scale_l=1.0, scale_g=1.0):
        self.prm = params
        self.scale_l = scale_l
        self.scale_g = scale_g

    def set_time(self, t):
        new = copy.copy(self)
        new.prm = self.prm.with_time(t)
        return new

    def alpha_volume(self, ctx: VolumeContext, u):
        p = self.prm
        pl, pg = u[0][:, 0], u[1][:, 0]
        vol = jnp.sum(ctx.factor, axis=-1)
        xc = ctx.x.mean(axis=-2)
        phi = jnp.broadcast_to(jnp.asarray(p.porosity(xc)), pl.shape)
        s_l = p.s_l(pg - pl)
        r_l = self.scale_l * phi * s_l * p.nu_l(xc, pl) * vol
        r_g = self.scale_g * phi * (1.0 - s_l) * p.nu_g(xc, pg) * vol
        return r_l[:, None], r_g[:, None]


class TwoPhaseVelocity:
    """Per-phase mass velocity reconstruction (V_l/V_g analog,
    twophaseccfv.hh:607,842): face-normal velocities nu sigma w that
    reproduce the solver's TPFA fluxes (upwinded saturation + harmonic
    lambda K interior; inside mobility on Dirichlet faces; prescribed j on
    Neumann faces), RT0 evaluation at cell centers, discrete divergence.

    Uniform structured (cube) meshes, like DarcyVelocityFromHeadCCFV.
    """

    def __init__(self, mesh, prm: TwoPhaseParameters, space, x,
                 phase="liquid"):
        if not mesh.uniform or mesh.geometry_type != "cube":
            raise NotImplementedError(
                "TwoPhaseVelocity: uniform structured meshes")
        if phase not in ("liquid", "gas"):
            raise ValueError(phase)
        self.mesh, self.prm, self.phase = mesh, prm, phase
        x = np.asarray(x, dtype=np.float64)
        self.pl = np.asarray(space.restrict(jnp.asarray(x), 0))
        self.pg = np.asarray(space.restrict(jnp.asarray(x), 1))
        self._faces = self._reconstruct()

    def _phase_fields(self, xs, pl, pg):
        p = self.prm
        xs = jnp.asarray(xs)
        plj, pgj = jnp.asarray(pl), jnp.asarray(pg)
        s = p.s_l(pgj - plj)
        if self.phase == "liquid":
            return (plj, np.asarray(p.density_l(xs, plj)),
                    np.asarray(p.nu_l(xs, plj)),
                    np.asarray(p.viscosity_l(xs, plj)),
                    lambda su: np.asarray(p.kr_l(jnp.asarray(su))), s)
        return (pgj, np.asarray(p.density_g(xs, pgj)),
                np.asarray(p.nu_g(xs, pgj)),
                np.asarray(p.viscosity_g(xs, pgj)),
                lambda su: np.asarray(p.kr_g(jnp.asarray(su))), s)

    def _reconstruct(self):
        mesh, p = self.mesh, self.prm
        dim, cells = mesh.dim, mesh.cells
        lat = cells[::-1]
        lower, h = np.asarray(mesh.lower), np.asarray(mesh.h)
        centers = np.asarray(mesh.element_centers()).reshape(*lat, dim)
        PL = self.pl.reshape(lat)
        PG = self.pg.reshape(lat)
        Pp, rho, nu, mu, kr, s_lj = self._phase_fields(
            centers.reshape(-1, dim), PL.reshape(-1), PG.reshape(-1))
        P = np.asarray(Pp).reshape(lat)
        rho, nu, mu = (a.reshape(lat) for a in (rho, nu, mu))
        S = np.asarray(s_lj).reshape(lat)
        Kc = np.broadcast_to(
            np.asarray(p.k_abs(jnp.asarray(centers))), lat).astype(float)
        grav = (np.zeros(dim) if p.gravity is None
                else np.asarray(p.gravity, float))
        out = []
        for d in range(dim):
            ax = dim - 1 - d
            shape = list(lat)
            shape[ax] += 1
            V = np.zeros(shape)
            gn = grav[d]           # face normal +e_d
            sl_in = tuple(slice(None) if a != ax else slice(1, -1)
                          for a in range(dim))
            lo = tuple(slice(None) if a != ax else slice(0, -1)
                       for a in range(dim))
            hi = tuple(slice(None) if a != ax else slice(1, None)
                       for a in range(dim))
            # interior faces: inside = lower cell, outside = upper cell
            w = (P[lo] - P[hi]) / h[d] + 0.5 * (rho[lo] + rho[hi]) * gn
            s_up = np.where(w >= 0, S[lo], S[hi])
            lam_i = kr(s_up) / mu[lo]
            lam_o = kr(s_up) / mu[hi]
            sigma = _havg(lam_i * Kc[lo], lam_o * Kc[hi])
            V[sl_in] = (0.5 * (nu[lo] + nu[hi]) * sigma * w)
            # boundary faces
            for side in (0, 1):
                sl = tuple(slice(None) if a != ax else
                           (slice(0, 1) if side == 0 else slice(-1, None))
                           for a in range(dim))
                fpts = centers[sl].copy()
                fpts[..., d] = lower[d] + (0 if side == 0 else cells[d] * h[d])
                xj = jnp.asarray(fpts)
                bc = np.broadcast_to(np.asarray(
                    p.bc_l(xj) if self.phase == "liquid" else p.bc_g(xj)),
                    fpts.shape[:-1])
                g = np.broadcast_to(np.asarray(
                    p.g_l(xj) if self.phase == "liquid" else p.g_g(xj),
                    dtype=float), fpts.shape[:-1])
                jf = np.broadcast_to(np.asarray(
                    p.j_l(xj) if self.phase == "liquid" else p.j_g(xj),
                    dtype=float), fpts.shape[:-1])
                nsign = -1.0 if side == 0 else 1.0     # outward normal
                pc_ = P[sl]
                # w along OUTWARD normal; face velocity along +e_d
                w_b = (pc_ - g) / (h[d] / 2) + rho[sl] * nsign * gn
                sig = kr(S[sl]) / mu[sl] * Kc[sl]
                v_dir = nsign * nu[sl] * sig * w_b     # +e_d component
                v_neu = nsign * jf
                V[sl] = np.where(bc == 1, v_dir,
                                 np.where(bc == 0, v_neu, 0.0))
            out.append(V)
        return out

    def face_normal_velocities(self):
        """Per axis d: +e_d mass velocity on the face lattice."""
        return self._faces

    def at_centers(self):
        """RT0 evaluation at element centers: (E, dim)."""
        mesh = self.mesh
        dim = mesh.dim
        cols = []
        for d in range(dim):
            ax = dim - 1 - d
            V = self._faces[d]
            lo = tuple(slice(None) if a != ax else slice(0, -1)
                       for a in range(dim))
            hi = tuple(slice(None) if a != ax else slice(1, None)
                       for a in range(dim))
            cols.append(0.5 * (V[lo] + V[hi]).reshape(-1))
        return np.stack(cols, axis=-1)

    def cell_divergence(self):
        """div(v) per cell from the face fluxes: (E,)."""
        mesh = self.mesh
        dim, h = mesh.dim, np.asarray(mesh.h)
        div = np.zeros(mesh.cells[::-1])
        for d in range(dim):
            ax = dim - 1 - d
            div += np.diff(self._faces[d], axis=ax) / h[d]
        return div.reshape(-1)
