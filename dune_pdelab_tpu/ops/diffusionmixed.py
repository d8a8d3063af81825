"""Mixed (dual) formulation of diffusion: Darcy velocity + pressure.

TPU-native analog of the reference kernel (reference:
dune/pdelab/localoperator/diffusionmixed.hh, 311 LoC; Darcy variants
darcyccfv.hh / darcyfem.hh). First-order system for -∇·(K∇p) = f:

    K^{-1} u + ∇p = 0,     ∇·u = f

on Composite(RT0/BDM1 space, P0/DG space), leaves (u, p). Weak form:

  r_u(v) = ∫ (K^{-1} u)·v - p ∇·v dx + ∮_ΓD g v·n ds
  r_p(q) = -∫ (∇·u) q dx + ∫ f q dx     (sign chosen for symmetry:
                                          A = [[M, -B^T], [-B, 0]], MINRES-able)

Dirichlet data for p enters naturally through the boundary term; Neumann
(flux) conditions would constrain the normal DOFs of u (strong) — not yet
wired (full-Dirichlet-p problems supported).
"""
from __future__ import annotations

import copy

import jax.numpy as jnp

from dune_pdelab_tpu.ops.base import LocalOperator, VolumeContext, FaceContext
from dune_pdelab_tpu.ops.convectiondiffusion import ConvectionDiffusionProblem


class DiffusionMixed(LocalOperator):
    is_linear = True
    quadrature_factor = 2

    def __init__(self, problem: ConvectionDiffusionProblem):
        self.problem = problem

    def set_time(self, t):
        new = copy.copy(self)
        new.problem = self.problem.with_time(t)
        return new

    def alpha_volume(self, ctx: VolumeContext, u):
        uu, pp = u
        tab_u, tab_p = ctx.tabs
        K = jnp.asarray(self.problem.A(ctx.x))
        uq = self.hdiv_value_at_qp(tab_u, uu)          # (E, nqp, d)
        Kinv_u = uq / K[..., None] if K.ndim == uq.ndim - 1 else uq / K
        pq = self.value_at_qp(tab_p, pp)
        divu = self.div_at_qp(tab_u, uu)
        r_u = (self.accumulate_hdiv(tab_u, ctx.factor, Kinv_u)
               - self.accumulate_div(tab_u, ctx.factor, pq))
        r_p = -self.accumulate_value(tab_p, ctx.factor, divu)
        return r_u, r_p

    def lambda_volume(self, ctx: VolumeContext):
        tab_u, tab_p = ctx.tabs
        f = jnp.broadcast_to(
            jnp.asarray(self.problem.f(ctx.x), ctx.factor.dtype),
            ctx.x.shape[:-1])
        r_p = self.accumulate_value(tab_p, ctx.factor, f)
        r_u = jnp.zeros((ctx.x.shape[0], tab_u.vec_phi.shape[-2]),
                        ctx.factor.dtype)
        return r_u, r_p

    def lambda_boundary(self, ctx: FaceContext):
        tab_u, tab_p = ctx.tabs
        g = jnp.broadcast_to(
            jnp.asarray(self.problem.g(ctx.x), ctx.factor.dtype),
            ctx.x.shape[:-1])
        if tab_u.vec_phi.ndim == 4 or ctx.normal.ndim > 1:
            vp = (tab_u.vec_phi if tab_u.vec_phi.ndim == 4
                  else tab_u.vec_phi[None])
            n = (ctx.normal if ctx.normal.ndim > 1
                 else ctx.normal[None, None])
            vn = (vp * n[:, :, None, :]).sum(-1)       # (F, nqp, nb)
            r_u = jnp.einsum("fqb,fq->fb", vn, g * ctx.factor)
        else:
            vn = jnp.einsum("qbd,d->qb", tab_u.vec_phi, ctx.normal)
            r_u = jnp.einsum("qb,eq->eb", vn, g * ctx.factor)
        r_p = jnp.zeros((ctx.x.shape[0], tab_p.phi.shape[-1]),
                        ctx.factor.dtype)
        return r_u, r_p
