"""Interior-penalty DG discretization of (Navier-)Stokes.

TPU-native analog of the reference kernel (reference:
dune/pdelab/localoperator/dgnavierstokes.hh:32, 1372 LoC, +
dginteriorpenaltyparameter.hh): equal-order or mixed DG velocity/pressure
on PowerSpace(DG^dim) x DG with

  * componentwise SIPG/NIPG viscous terms (penalty sigma mu k(k+1)/h),
  * pressure-velocity coupling fluxes  +∫ {p} n·[v],  -∫ {q} n·[u]
    (symmetric saddle-point convention),
  * Dirichlet velocity via Nitsche terms with data g,
  * optional convection with upwinding on the face-mean velocity.

Space layout: (v_0, ..., v_{d-1}, p) leaf tuple like the Taylor-Hood kernel.
"""
from __future__ import annotations

import copy

import jax.numpy as jnp

from dune_pdelab_tpu.ops.base import (
    LocalOperator, VolumeContext, FaceContext, SkeletonContext,
)
from dune_pdelab_tpu.ops.stokes import NavierStokesParameters


class DGNavierStokes(LocalOperator):
    quadrature_factor = 2
    quadrature_add = 1

    def __init__(self, params: NavierStokesParameters, penalty: float = 4.0,
                 theta: float = 1.0, navier: bool | None = None,
                 tensor_form: bool = False, incomp_scaling: float = 1.0):
        self.params = params
        self.penalty = penalty
        self.theta = theta
        self.navier = navier if navier is not None else (params.rho != 0.0)
        self.is_linear = not self.navier
        # full stress sigma = mu (grad u + grad u^T) instead of mu grad u
        # (the reference's full_tensor switch, dgnavierstokes.hh)
        self.tensor_form = tensor_form
        # rescale the continuity-equation rows (reference:
        # dgnavierstokesparameter.hh:108 incompressibilityScaling — the
        # instationary drivers there pass 1/dt to keep the saddle-point
        # blocks balanced against the dt-weighted momentum rows)
        self.incomp_scaling = incomp_scaling

    def set_time(self, t):
        new = copy.copy(self)
        new.params = self.params.with_time(t)
        return new

    # -- volume (same terms as Taylor-Hood) ----------------------------------
    def alpha_volume(self, ctx: VolumeContext, u):
        dim = ctx.x.shape[-1]
        tab_v, tab_p = ctx.tabs[0], ctx.tabs[dim]
        mu, rho = self.params.mu, self.params.rho
        vq = [self.value_at_qp(tab_v, u[c]) for c in range(dim)]
        gv = [self.gradient_at_qp(tab_v, u[c]) for c in range(dim)]
        pq = self.value_at_qp(tab_p, u[dim])
        r = []
        for c in range(dim):
            wvec = mu * gv[c]
            if self.tensor_form:
                wvec = wvec + mu * jnp.stack(
                    [gv[d][..., c] for d in range(dim)], axis=-1)
            wvec = wvec.at[..., c].add(-pq)
            rc = self.accumulate_gradient(tab_v, ctx.factor, wvec)
            if self.navier:
                conv = sum(vq[d] * gv[c][..., d] for d in range(dim))
                rc = rc + self.accumulate_value(tab_v, ctx.factor, rho * conv)
            r.append(rc)
        div = sum(gv[c][..., c] for c in range(dim))
        r.append(-self.incomp_scaling
                 * self.accumulate_value(tab_p, ctx.factor, div))
        return tuple(r)

    def lambda_volume(self, ctx: VolumeContext):
        dim = ctx.x.shape[-1]
        tab_v, tab_p = ctx.tabs[0], ctx.tabs[dim]
        f = jnp.broadcast_to(
            jnp.asarray(self.params.f(ctx.x), ctx.factor.dtype), ctx.x.shape)
        r = [self.accumulate_value(tab_v, ctx.factor, -f[..., c])
             for c in range(dim)]
        r.append(jnp.zeros((ctx.x.shape[0], tab_p.phi.shape[1]),
                           ctx.factor.dtype))
        return tuple(r)

    def _gamma(self, tab_v, h, dim):
        k = max(1, tab_v.degree)
        return self.penalty * self.params.mu * k * (k + dim - 1.0) / h

    # -- interior faces ------------------------------------------------------
    def alpha_skeleton(self, ctx: SkeletonContext, u_in, u_out):
        dim = ctx.x.shape[-1]
        tin_v, tin_p = ctx.tabs_in[0], ctx.tabs_in[dim]
        tout_v, tout_p = ctx.tabs_out[0], ctx.tabs_out[dim]
        n = ctx.normal
        mu, rho = self.params.mu, self.params.rho
        h = ctx.h_inside[:, None]
        gamma = self._gamma(tin_v, h, dim)
        acc_i = lambda t, w: jnp.einsum("qb,eq->eb", t.phi, w * ctx.factor)
        acc_o = lambda t, w: jnp.einsum("qb,eq->eb", t.phi, w * ctx.factor)
        ndphi_i = jnp.einsum("qbd,d->qb", tin_v.grad[0], n)
        ndphi_o = jnp.einsum("qbd,d->qb", tout_v.grad[0], n)

        vi = [self.value_at_qp(tin_v, u_in[c]) for c in range(dim)]
        vo = [self.value_at_qp(tout_v, u_out[c]) for c in range(dim)]
        gi = [self.gradient_at_qp(tin_v, u_in[c]) for c in range(dim)]
        go_ = [self.gradient_at_qp(tout_v, u_out[c]) for c in range(dim)]
        pi = self.value_at_qp(tin_p, u_in[dim])
        po = self.value_at_qp(tout_p, u_out[dim])
        pavg = 0.5 * (pi + po)
        un_jump = sum((vi[c] - vo[c]) * n[c] for c in range(dim))
        r_in, r_out = [], []
        if self.navier:
            # upwind convection by the mean normal velocity
            ubar_n = 0.5 * sum((vi[c] + vo[c]) * n[c] for c in range(dim))
        jumps = [vi[c] - vo[c] for c in range(dim)]
        for c in range(dim):
            jump = jumps[c]
            avg_ngrad = 0.5 * (jnp.einsum("fqd,d->fq", gi[c], n)
                               + jnp.einsum("fqd,d->fq", go_[c], n))
            if self.tensor_form:
                # + {(grad u)^T n}_c = 0.5 sum_d n_d (d_c u_d)|_i,o
                avg_ngrad = avg_ngrad + 0.5 * sum(
                    n[d] * (gi[d][..., c] + go_[d][..., c])
                    for d in range(dim))
            w = -mu * avg_ngrad + gamma * jump + pavg * n[c]
            if self.navier:
                upw = jnp.where(ubar_n >= 0, vi[c], vo[c])
                w = w + rho * ubar_n * upw
            ri = acc_i(tin_v, w)
            ro = acc_o(tout_v, -w)
            if self.tensor_form:
                # adjoint term -theta [u].{sigma(phi) n}: gradient-axis
                # weight W_c[..., e] = -theta mu 0.5 (n_e [u_c] + n_c [u_e])
                W = jnp.stack([-self.theta * mu * 0.5
                               * (n[e] * jump + n[c] * jumps[e])
                               for e in range(dim)], axis=-1)
                ri = ri + self.accumulate_gradient(tin_v, ctx.factor, W)
                ro = ro + self.accumulate_gradient(tout_v, ctx.factor, W)
            else:
                # symmetry term -theta mu {grad v}.n [u]
                wsym = -self.theta * mu * 0.5 * jump * ctx.factor
                ri = ri + jnp.einsum("qb,eq->eb", ndphi_i, wsym)
                ro = ro + jnp.einsum("qb,eq->eb", ndphi_o, wsym)
            r_in.append(ri)
            r_out.append(ro)
        # continuity coupling: b(u, q) face part +∫ {q} [u·n] (the pairing
        # that makes the formulation adjoint-consistent -> optimal L2 order)
        wq = self.incomp_scaling * 0.5 * un_jump
        r_in.append(acc_i(tin_p, wq))
        r_out.append(acc_o(tout_p, wq))
        return tuple(r_in), tuple(r_out)

    # -- boundary: Nitsche-Dirichlet terms on VELOCITY_DIRICHLET faces only
    # (reference: dgnavierstokes.hh:879,1039 — StressNeumann faces get no
    # solution-dependent boundary term)
    def _dirichlet_sel(self, ctx):
        from dune_pdelab_tpu.ops.stokes import StokesBC
        bct = jnp.broadcast_to(jnp.asarray(self.params.bctype(ctx.x)),
                               ctx.x.shape[:-1])
        return bct, bct == StokesBC.VELOCITY_DIRICHLET

    def alpha_boundary(self, ctx: FaceContext, u):
        from dune_pdelab_tpu.ops.stokes import StokesBC
        dim = ctx.x.shape[-1]
        tab_v, tab_p = ctx.tabs[0], ctx.tabs[dim]
        n = ctx.normal
        mu, rho = self.params.mu, self.params.rho
        h = ctx.h_inside[:, None]
        gamma = self._gamma(tab_v, h, dim)
        acc = lambda t, w: jnp.einsum("qb,eq->eb", t.phi, w * ctx.factor)
        ndphi = jnp.einsum("qbd,d->qb", tab_v.grad[0], n)
        bct, sel = self._dirichlet_sel(ctx)
        slp = bct == StokesBC.SLIP_VELOCITY
        selp = sel | slp   # pressure coupling: Dirichlet AND slip faces
        vi = [self.value_at_qp(tab_v, u[c]) for c in range(dim)]
        gi = [self.gradient_at_qp(tab_v, u[c]) for c in range(dim)]
        pq = self.value_at_qp(tab_p, u[dim])
        un = sum(vi[c] * n[c] for c in range(dim))
        # slip (free tangential, weak u.n = 0; reference:
        # dgnavierstokes.hh:923-949): Nitsche on the NORMAL trace only,
        # scalarized via ten_sum for the full-tensor form
        ten = 2.0 if self.tensor_form else 1.0
        ngrad_n = sum(n[c] * jnp.einsum("fqd,d->fq", gi[c], n)
                      for c in range(dim))
        w_slip = jnp.where(slp, -ten * mu * ngrad_n + gamma * un, 0.0)
        w_slip_adj = jnp.where(slp, -self.theta * ten * mu * un, 0.0)
        r = []
        for c in range(dim):
            ngrad = jnp.einsum("fqd,d->fq", gi[c], n)
            if self.tensor_form:
                ngrad = ngrad + sum(n[d] * gi[d][..., c] for d in range(dim))
            w = -mu * ngrad + gamma * vi[c]
            if self.navier:
                w = w + rho * jnp.where(un >= 0, un * vi[c], 0.0)
            w = jnp.where(sel, w, 0.0) \
                + jnp.where(selp, pq, 0.0) * n[c] + w_slip * n[c]
            rc = acc(tab_v, w)
            if self.tensor_form:
                W = jnp.stack([-self.theta * mu
                               * (n[e] * vi[c] + n[c] * vi[e])
                               for e in range(dim)], axis=-1)
                rc = rc + self.accumulate_gradient(
                    tab_v, ctx.factor, W * sel[..., None])
                rc = rc + jnp.einsum("qb,eq->eb", ndphi,
                                     w_slip_adj * n[c] * ctx.factor)
            else:
                rc = rc + jnp.einsum(
                    "qb,eq->eb", ndphi,
                    (jnp.where(sel, -self.theta * mu * vi[c], 0.0)
                     + w_slip_adj * n[c]) * ctx.factor)
            r.append(rc)
        r.append(acc(tab_p,
                     self.incomp_scaling * jnp.where(selp, un, 0.0)))
        return tuple(r)

    def lambda_boundary(self, ctx: FaceContext):
        from dune_pdelab_tpu.ops.stokes import StokesBC
        dim = ctx.x.shape[-1]
        tab_v, tab_p = ctx.tabs[0], ctx.tabs[dim]
        n = ctx.normal
        mu, rho = self.params.mu, self.params.rho
        h = ctx.h_inside[:, None]
        gamma = self._gamma(tab_v, h, dim)
        acc = lambda t, w: jnp.einsum("qb,eq->eb", t.phi, w * ctx.factor)
        ndphi = jnp.einsum("qbd,d->qb", tab_v.grad[0], n)
        bct, sel = self._dirichlet_sel(ctx)
        neu = bct == StokesBC.STRESS_NEUMANN
        slp = bct == StokesBC.SLIP_VELOCITY
        selp = sel | slp
        g = jnp.broadcast_to(
            jnp.asarray(self.params.g(ctx.x), ctx.factor.dtype), ctx.x.shape)
        nb = jnp.broadcast_to(jnp.asarray(n, ctx.factor.dtype), ctx.x.shape)
        jv = jnp.broadcast_to(
            jnp.asarray(self.params.j(ctx.x, nb), ctx.factor.dtype),
            ctx.x.shape)
        gn = sum(g[..., c] * n[c] for c in range(dim))
        ten = 2.0 if self.tensor_form else 1.0
        w_slip = jnp.where(slp, -gamma * gn, 0.0)
        w_slip_adj = jnp.where(slp, self.theta * ten * mu * gn, 0.0)
        r = []
        for c in range(dim):
            w = -gamma * g[..., c]
            if self.navier:
                un_in = gn  # inflow data
                w = w + rho * jnp.where(un_in < 0, un_in * g[..., c], 0.0)
            # prescribed stress on STRESS_NEUMANN faces: +j.phi
            # (reference: dgnavierstokes.hh:1346-1360); slip faces get the
            # normal-projected data terms (g.n, usually zero)
            w = (jnp.where(sel, w, 0.0) + jnp.where(neu, jv[..., c], 0.0)
                 + w_slip * n[c])
            rc = acc(tab_v, w)
            if self.tensor_form:
                W = jnp.stack([self.theta * mu
                               * (n[e] * g[..., c] + n[c] * g[..., e])
                               for e in range(dim)], axis=-1)
                rc = rc + self.accumulate_gradient(
                    tab_v, ctx.factor, W * sel[..., None])
                rc = rc + jnp.einsum("qb,eq->eb", ndphi,
                                     w_slip_adj * n[c] * ctx.factor)
            else:
                rc = rc + jnp.einsum(
                    "qb,eq->eb", ndphi,
                    (jnp.where(sel, self.theta * mu * g[..., c], 0.0)
                     + w_slip_adj * n[c]) * ctx.factor)
            r.append(rc)
        r.append(acc(tab_p,
                     self.incomp_scaling * jnp.where(selp, -gn, 0.0)))
        return tuple(r)
