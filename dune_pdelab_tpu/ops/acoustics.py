"""Linear acoustics DG operator (first-order wave system, upwind fluxes).

TPU-native analog of the reference hyperbolic DG kernel (reference:
dune/pdelab/localoperator/linearacousticsdg.hh:316 — eigendecomposed upwind
numerical flux, used with explicit RK time stepping). System (sound speed c):

    p_t + c ∇·u = 0,    u_t + c ∇p = 0

on a PowerSpace(DG, 1 + dim) with leaf order (p, u_1, ..., u_d). The normal
flux matrix A_n = c [[0, n^T], [n, 0]] has |A_n| = c [[1, 0], [0, n n^T]],
giving the exact characteristic upwind flux

    F̂ = 1/2 A_n (q_i + q_o) + 1/2 |A_n| (q_i - q_o).

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

    def __init__(self, c=1.0, bc: str = "reflect"):
        self.c = c
        self.bc = bc

    def max_speed(self, x=None):
        """For CFLTimeController (explicitonestep.hh:64 analog)."""
        return self.c

    # -- volume: -∫ sum_d (A_d q) . dv/dx_d ---------------------------------
    def alpha_volume(self, ctx: VolumeContext, q):
        dim = ctx.x.shape[-1]
        tab = ctx.tabs[0]
        c = self.c
        pq = self.value_at_qp(tab, q[0])                       # (E, nqp)
        uq = [self.value_at_qp(tab, q[1 + d]) for d in range(dim)]
        # p-equation flux: c*u ; u_c-equation flux: c*p e_c
        r_p = -self.accumulate_gradient(
            tab, ctx.factor, c * jnp.stack(uq, axis=-1))
        r = [r_p]
        for d in range(dim):
            w = jnp.zeros(pq.shape + (dim,), pq.dtype).at[..., d].set(c * pq)
            r.append(-self.accumulate_gradient(tab, ctx.factor, w))
        return tuple(r)

    # -- upwind flux --------------------------------------------------------
    def _flux(self, n, p_i, u_i, p_o, u_o):
        c = self.c
        un_i = sum(u_i[d] * n[d] for d in range(len(u_i)))
        un_o = sum(u_o[d] * n[d] for d in range(len(u_o)))
        f_p = 0.5 * c * (un_i + un_o) + 0.5 * c * (p_i - p_o)
        f_u = []
        for d in range(len(u_i)):
            f_u.append(0.5 * c * (p_i + p_o) * n[d]
                       + 0.5 * c * n[d] * (un_i - un_o))
        return f_p, f_u

    def alpha_skeleton(self, ctx: SkeletonContext, q_in, q_out):
        dim = ctx.x.shape[-1]
        tin, tout = ctx.tab_in, ctx.tab_out
        n = ctx.normal
        p_i = self.value_at_qp(tin, q_in[0])
        p_o = self.value_at_qp(tout, q_out[0])
        u_i = [self.value_at_qp(tin, q_in[1 + d]) for d in range(dim)]
        u_o = [self.value_at_qp(tout, q_out[1 + d]) for d in range(dim)]
        f_p, f_u = self._flux(n, p_i, u_i, p_o, u_o)
        acc_i = lambda w: jnp.einsum("qb,eq->eb", tin.phi, w * ctx.factor)
        acc_o = lambda w: jnp.einsum("qb,eq->eb", tout.phi, w * ctx.factor)
        r_in = [acc_i(f_p)] + [acc_i(f) for f in f_u]
        r_out = [acc_o(-f_p)] + [acc_o(-f) for f in f_u]
        return tuple(r_in), tuple(r_out)

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
        f_p, f_u = self._flux(n, p_i, u_i, p_o, u_o)
        acc = lambda w: jnp.einsum("qb,eq->eb", tab.phi, w * ctx.factor)
        return tuple([acc(f_p)] + [acc(f) for f in f_u])
