"""Cell-centered finite volume convection-diffusion on P0 spaces.

TPU-native analog of the reference kernel (reference:
dune/pdelab/localoperator/convectiondiffusionccfv.hh, 607 LoC): two-point
flux approximation with harmonic diffusivity averaging and upwinded
convection; Dirichlet boundaries via ghost values at distance h/2. Shares
the (A, b, c, f, bctype, g, j, o) parameter protocol.

Per interior face (inside i, outside o, normal n, center distance d):
  flux = - A_harm (u_o - u_i)/d * |F|  +  (b·n) upwind(u_i, u_o) * |F|
accumulated +flux to r_i, -flux to r_o.
"""
from __future__ import annotations

import copy

import jax.numpy as jnp

from dune_pdelab_tpu.ops.base import (
    LocalOperator, VolumeContext, FaceContext, SkeletonContext,
)
from dune_pdelab_tpu.ops.convectiondiffusion import (
    BCType, ConvectionDiffusionProblem, _is_zero,
)


class ConvectionDiffusionCCFV(LocalOperator):
    is_linear = True
    quadrature_factor = 0   # P0: midpoint rules everywhere
    quadrature_add = 0

    def __init__(self, problem: ConvectionDiffusionProblem):
        self.problem = problem

    def set_time(self, t):
        new = copy.copy(self)
        new.problem = self.problem.with_time(t)
        return new

    def _scalarA(self, x, n):
        """Normal diffusivity (scalar A assumed; tensor: n·A n)."""
        A = jnp.asarray(self.problem.A(x))
        if A.ndim >= 2 and A.shape[-1] == A.shape[-2] == x.shape[-1]:
            An = jnp.einsum("...ij,j->...i", A, n)
            return jnp.einsum("...i,i->...", An, n)
        return A

    def max_speed(self, x=None, bmax=None, mesh=None):
        """Max convective speed for CFLTimeController (the conservative
        analog of the reference's cell-influx suggestTimestep,
        convectiondiffusionccfv.hh:513). `x` is the solution state (unused
        here: the flux is linear in u). Pass `bmax` for position-dependent
        velocity fields, or `mesh` so the field is sampled at element
        centers — a single-point probe of a position-dependent b can
        underestimate the CFL-critical speed and destabilize the explicit
        step (ADVICE r3)."""
        if bmax is not None:
            return bmax
        pts = None
        if mesh is not None and hasattr(mesh, "element_centers"):
            pts = jnp.asarray(mesh.element_centers())
        if pts is not None:
            b = jnp.asarray(self.problem.b(pts))
            return float(jnp.max(jnp.abs(b)))
        for d in (3, 2, 1):                # problem dim is not stored here
            try:
                pr = jnp.zeros((1, d))
                b0 = jnp.asarray(self.problem.b(pr))
                # probe a second point: a position-dependent field with no
                # bmax/mesh/x information is a CFL hazard — refuse to guess
                b1 = jnp.asarray(self.problem.b(pr + 0.371))
            except (ValueError, TypeError, IndexError):
                continue
            if not bool(jnp.allclose(b0, b1)):
                raise ValueError(
                    "max_speed: problem.b is position-dependent; pass "
                    "bmax=, mesh=, or sample points x= so the CFL bound "
                    "covers the whole domain")
            return float(jnp.max(jnp.abs(b0)))
        return 0.0

    # -- volume: reaction + source ------------------------------------------
    def alpha_volume(self, ctx: VolumeContext, u):
        p = self.problem
        c = p.c(ctx.x)
        if _is_zero(c):
            return jnp.zeros_like(u)
        cq = jnp.broadcast_to(jnp.asarray(c, u.dtype), ctx.x.shape[:-1])
        return u * jnp.sum(cq * ctx.factor, axis=-1)[:, None]

    def lambda_volume(self, ctx: VolumeContext):
        p = self.problem
        f = jnp.broadcast_to(jnp.asarray(p.f(ctx.x), ctx.factor.dtype),
                             ctx.x.shape[:-1])
        return -jnp.sum(f * ctx.factor, axis=-1)[:, None]

    # -- interior faces: TPFA -----------------------------------------------
    def alpha_skeleton(self, ctx: SkeletonContext, u_in, u_out):
        p = self.problem
        n = ctx.normal
        ui = u_in[:, 0][:, None]                            # (F,1)
        uo = u_out[:, 0][:, None]
        # evaluate A at BOTH cell centers and take the harmonic average of
        # the normal diffusivities — the heterogeneous TPFA of the reference
        # (convectiondiffusionccfv.hh:152-160): centers sit at x -+ (h/2) n
        nn = jnp.broadcast_to(n, ctx.x.shape)
        x_ci = ctx.x - 0.5 * ctx.h_inside[:, None, None] * nn
        x_co = ctx.x + 0.5 * ctx.h_outside[:, None, None] * nn
        Ai = self._scalarA(x_ci, n)                         # (F, nqp)
        Ao = self._scalarA(x_co, n)
        Ah = 2.0 * Ai * Ao / (Ai + Ao + 1e-300)
        # center-to-center distance (== h on uniform meshes)
        d = 0.5 * (ctx.h_inside + ctx.h_outside)[:, None]
        b = jnp.asarray(p.b(ctx.x))
        bn = jnp.einsum("...d,d->...", jnp.broadcast_to(b, ctx.x.shape), n)
        upw = jnp.where(bn >= 0, ui, uo)
        fluxd = -Ah * (uo - ui) / d                         # (F, nqp)
        flux = jnp.sum((fluxd + bn * upw) * ctx.factor, axis=-1)[:, None]
        return flux, -flux

    # -- boundary faces ------------------------------------------------------
    def alpha_boundary(self, ctx: FaceContext, u):
        p = self.problem
        n = ctx.normal
        ui = u[:, 0][:, None]
        bct = jnp.broadcast_to(jnp.asarray(p.bctype(ctx.x)), ctx.x.shape[:-1])
        nn = jnp.broadcast_to(n, ctx.x.shape)
        x_ci = ctx.x - 0.5 * ctx.h_inside[:, None, None] * nn
        A = self._scalarA(x_ci, n)          # cell-center diffusivity
        b = jnp.asarray(p.b(ctx.x))
        bn = jnp.einsum("...d,d->...", jnp.broadcast_to(b, ctx.x.shape), n)
        d = ctx.h_inside[:, None] / 2.0
        # Dirichlet: diffusive flux to ghost value (u-dependent part) +
        # inflow/outflow convection with upwinding against g
        wd = jnp.where(bct == BCType.DIRICHLET,
                       A * ui / d + jnp.where(bn >= 0, bn * ui, 0.0), 0.0)
        wo = jnp.where(bct == BCType.OUTFLOW, bn * ui, 0.0)
        return jnp.sum((wd + wo) * ctx.factor, axis=-1)[:, None]

    def lambda_boundary(self, ctx: FaceContext):
        p = self.problem
        n = ctx.normal
        bct = jnp.broadcast_to(jnp.asarray(p.bctype(ctx.x)), ctx.x.shape[:-1])
        gq = jnp.broadcast_to(jnp.asarray(p.g(ctx.x), ctx.factor.dtype),
                              ctx.x.shape[:-1])
        jq = jnp.broadcast_to(jnp.asarray(p.j(ctx.x), ctx.factor.dtype),
                              ctx.x.shape[:-1])
        oq = jnp.broadcast_to(jnp.asarray(p.o(ctx.x), ctx.factor.dtype),
                              ctx.x.shape[:-1])
        nn = jnp.broadcast_to(n, ctx.x.shape)
        x_ci = ctx.x - 0.5 * ctx.h_inside[:, None, None] * nn
        A = self._scalarA(x_ci, n)          # cell-center diffusivity
        b = jnp.asarray(p.b(ctx.x))
        bn = jnp.einsum("...d,d->...", jnp.broadcast_to(b, ctx.x.shape), n)
        d = ctx.h_inside[:, None] / 2.0
        w = jnp.where(bct == BCType.DIRICHLET,
                      -A * gq / d + jnp.where(bn < 0, bn * gq, 0.0), 0.0) \
            + jnp.where(bct == BCType.NEUMANN, jq, 0.0) \
            + jnp.where(bct == BCType.OUTFLOW, oq, 0.0)
        return jnp.sum(w * ctx.factor, axis=-1)[:, None]
