"""Linear acoustics DG operator (first-order wave system, upwind fluxes,
heterogeneous sound speed).

TPU-native analog of the reference hyperbolic DG kernel (reference:
dune/pdelab/localoperator/linearacousticsdg.hh:316 — eigendecomposed upwind
numerical flux with a per-cell sound speed parameter, used with explicit RK
time stepping). System (sound speed c(x), sampled per cell like the
reference's `param.c(cell, localcenter)`):

    p_t + c div u = 0,    u_t + c grad p = 0

on a PowerSpace(DG, 1 + dim) with leaf order (p, u_1, ..., u_d). In these
symmetrized variables the characteristic impedance is 1 on every cell, so
the reference's flux-vector splitting F = A+(c_in) q_in + A-(c_out) q_out
(linearacousticsdg.hh:317-338: A_plus from the inside speed, A_minus from
the outside speed) reads

    f_p   = (c_i/2) (p_i + un_i) - (c_o/2) (p_o - un_o)
    f_u,d = n_d [ (c_i/2)(p_i + un_i) + (c_o/2)(p_o - un_o) ]

which reduces to the homogeneous exact upwind flux for constant c.
Boundary conditions: 'reflect' (rigid wall: mirror the normal velocity) or
'absorb' (first-order outflow: zero exterior state).
"""
from __future__ import annotations

import jax.numpy as jnp

from dune_pdelab_tpu.ops.base import (
    LocalOperator, VolumeContext, FaceContext, SkeletonContext,
)


class LinearAcousticsDG(LocalOperator):
    quadrature_factor = 2

    is_linear = True

    def __init__(self, c=1.0, bc: str = "reflect", cmax=None):
        self.c = c
        self.bc = bc
        self.cmax = cmax

    def max_speed(self, x=None):
        """For CFLTimeController (explicitonestep.hh:64 analog); pass
        `cmax` when c is a callable."""
        if self.cmax is not None:
            return self.cmax
        return self.c if not callable(self.c) else 1.0

    def _c_at(self, x):
        """Sound speed at points x (..., dim) -> (...)."""
        if callable(self.c):
            return self.c(x)
        return jnp.full(x.shape[:-1], self.c, x.dtype)

    # -- volume: -int sum_d (A_d q) . dv/dx_d -------------------------------
    def alpha_volume(self, ctx: VolumeContext, q):
        dim = ctx.x.shape[-1]
        tab = ctx.tabs[0]
        # per-cell speed at the cell center (reference: per-cell parameter)
        cv = self._c_at(ctx.x.mean(axis=1))[:, None]          # (E, 1)
        pq = self.value_at_qp(tab, q[0])                      # (E, nqp)
        uq = [self.value_at_qp(tab, q[1 + d]) for d in range(dim)]
        # p-equation flux: c*u ; u_c-equation flux: c*p e_c
        r_p = -self.accumulate_gradient(
            tab, ctx.factor, jnp.stack([cv * u for u in uq], axis=-1))
        r = [r_p]
        cp = cv * pq
        for d in range(dim):
            w = jnp.zeros(pq.shape + (dim,), pq.dtype).at[..., d].set(cp)
            r.append(-self.accumulate_gradient(tab, ctx.factor, w))
        return tuple(r)

    # -- upwind flux (per-side speeds, flux-vector splitting) ---------------
    def _flux(self, n, p_i, u_i, p_o, u_o, c_i, c_o):
        un_i = sum(u_i[d] * n[d] for d in range(len(u_i)))
        un_o = sum(u_o[d] * n[d] for d in range(len(u_o)))
        wp = 0.5 * c_i * (p_i + un_i)        # outgoing (+c) wave, inside c
        wm = 0.5 * c_o * (p_o - un_o)        # incoming (-c) wave, outside c
        f_p = wp - wm
        f_u = [(wp + wm) * n[d] for d in range(len(u_i))]
        return f_p, f_u

    def alpha_skeleton(self, ctx: SkeletonContext, q_in, q_out):
        dim = ctx.x.shape[-1]
        tin, tout = ctx.tab_in, ctx.tab_out
        n = ctx.normal
        p_i = self.value_at_qp(tin, q_in[0])
        p_o = self.value_at_qp(tout, q_out[0])
        u_i = [self.value_at_qp(tin, q_in[1 + d]) for d in range(dim)]
        u_o = [self.value_at_qp(tout, q_out[1 + d]) for d in range(dim)]
        c_i, c_o = self._side_speeds(ctx, skeleton=True)
        f_p, f_u = self._flux(n, p_i, u_i, p_o, u_o, c_i, c_o)
        acc_i = lambda w: jnp.einsum("qb,eq->eb", tin.phi, w * ctx.factor)
        acc_o = lambda w: jnp.einsum("qb,eq->eb", tout.phi, w * ctx.factor)
        r_in = [acc_i(f_p)] + [acc_i(f) for f in f_u]
        r_out = [acc_o(-f_p)] + [acc_o(-f) for f in f_u]
        return tuple(r_in), tuple(r_out)

    def _side_speeds(self, ctx, skeleton):
        """Per-side cell speeds: face centers offset half a cell along the
        normal (cell-wise material sampling)."""
        if not callable(self.c):
            c = jnp.asarray(self.c)
            return c, c
        xf = ctx.x.mean(axis=1)
        n = jnp.asarray(ctx.normal, xf.dtype)
        nv = n[:, 0, :] if jnp.ndim(n) == 3 else jnp.broadcast_to(
            n, xf.shape)
        hi = jnp.reshape(jnp.asarray(ctx.h_inside, xf.dtype), (-1,))
        c_i = self._c_at(xf - 0.5 * hi[:, None] * nv)[:, None]
        if skeleton:
            ho = jnp.reshape(jnp.asarray(ctx.h_outside, xf.dtype), (-1,))
            c_o = self._c_at(xf + 0.5 * ho[:, None] * nv)[:, None]
        else:
            c_o = c_i
        return c_i, c_o

    def alpha_boundary(self, ctx: FaceContext, q):
        dim = ctx.x.shape[-1]
        tab = ctx.tab
        n = ctx.normal
        p_i = self.value_at_qp(tab, q[0])
        u_i = [self.value_at_qp(tab, q[1 + d]) for d in range(dim)]
        if self.bc == "reflect":
            p_o = p_i
            un = sum(u_i[d] * n[d] for d in range(dim))
            u_o = [u_i[d] - 2.0 * un * n[d] for d in range(dim)]
        elif self.bc == "absorb":
            p_o = jnp.zeros_like(p_i)
            u_o = [jnp.zeros_like(u) for u in u_i]
        else:
            raise ValueError(self.bc)
        c_i, _ = self._side_speeds(ctx, skeleton=False)
        f_p, f_u = self._flux(n, p_i, u_i, p_o, u_o, c_i, c_i)
        acc = lambda w: jnp.einsum("qb,eq->eb", tab.phi, w * ctx.factor)
        return tuple([acc(f_p)] + [acc(f) for f in f_u])
