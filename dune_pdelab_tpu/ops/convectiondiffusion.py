"""Convection-diffusion(-reaction) operators: CG-FEM kernel + parameter protocol.

TPU-native analog of the reference's workhorse operator family:
  * parameter protocol (A, b, c, f, bctype, g, j, o) — reference:
    dune/pdelab/localoperator/convectiondiffusionparameter.hh
  * conforming FEM kernel — reference:
    dune/pdelab/localoperator/convectiondiffusionfem.hh:39-207
      alpha_volume:63   ( A grad u . grad phi  -  u b . grad phi  +  c u phi )
      lambda_volume     ( - f phi )
      alpha_boundary:207( outflow: (b.n u + o) phi )
      lambda_boundary   ( Neumann: j phi )

Weak form solved: find u with
  ∫ (A∇u)·∇v - u b·∇v + c u v dx = ∫ f v dx - ∮_ΓN j v ds - outflow terms,
Dirichlet imposed strongly through constraints.
"""
from __future__ import annotations

import copy

import jax.numpy as jnp

from dune_pdelab_tpu.ops.base import LocalOperator, VolumeContext, FaceContext


class BCType:
    """Boundary condition codes (reference:
    convectiondiffusionparameter.hh ConvectionDiffusionBoundaryConditions)."""
    NEUMANN = 0
    DIRICHLET = 1
    OUTFLOW = 2
    NONE = 3


def apply_tensor(A, g):
    """A * g where A is scalar, (...,) field, or (..., d, d) tensor; g (..., d)."""
    A = jnp.asarray(A)
    if A.ndim >= g.ndim + 1 and A.shape[-1] == g.shape[-1] == A.shape[-2]:
        return jnp.einsum("...ij,...j->...i", A, g)
    return A[..., None] * g if A.ndim == g.ndim - 1 else A * g


class ConvectionDiffusionProblem:
    """Default parameter class: -Δu = 0 with homogeneous Dirichlet BCs.

    Subclass and override; every method takes batched physical points
    x (..., dim) and returns broadcastable arrays. `self.time` holds the
    current time for instationary problems (setTime analog).
    """

    time = 0.0

    def A(self, x):
        """Diffusion tensor: scalar, (...,) field, or (..., d, d)."""
        return 1.0

    def b(self, x):
        """Velocity field (..., dim)."""
        return jnp.zeros_like(x)

    def c(self, x):
        """Reaction coefficient."""
        return 0.0

    def f(self, x):
        """Source term."""
        return 0.0

    def bctype(self, x):
        """Boundary condition code at boundary points (BCType values)."""
        return BCType.DIRICHLET

    def g(self, x):
        """Dirichlet boundary value (also used as initial-guess extension)."""
        return 0.0

    def j(self, x):
        """Neumann flux."""
        return 0.0

    def o(self, x):
        """Outflow boundary term."""
        return 0.0

    # -- conveniences ------------------------------------------------------
    def with_time(self, t):
        p = copy.copy(self)
        p.time = t
        return p

    def dirichlet_bctype(self):
        """bctype callable for `constraints()`: True where Dirichlet."""
        import numpy as np

        def bc(x):
            v = self.bctype(x)
            return np.broadcast_to(np.asarray(v) == BCType.DIRICHLET, x.shape[:-1])
        return bc


class ConvectionDiffusionFEM(LocalOperator):
    """Conforming FEM convection-diffusion kernel (reference:
    dune/pdelab/localoperator/convectiondiffusionfem.hh:39)."""

    is_linear = True
    qp_separable = True

    def __init__(self, problem: ConvectionDiffusionProblem, quadrature_add: int = 0):
        self.problem = problem
        self.quadrature_add = quadrature_add

    def set_time(self, t):
        new = copy.copy(self)
        new.problem = self.problem.with_time(t)
        return new

    def alpha_volume(self, ctx: VolumeContext, u):
        p, tab = self.problem, ctx.tab
        uq = self.value_at_qp(tab, u)            # (E, nqp)
        gu = self.gradient_at_qp(tab, u)         # (E, nqp, d)
        flux = apply_tensor(p.A(ctx.x), gu)      # A grad u
        b = jnp.asarray(p.b(ctx.x))
        flux = flux - uq[..., None] * b          # - u b (convective flux)
        r = self.accumulate_gradient(tab, ctx.factor, flux)
        c = p.c(ctx.x)
        if not _is_zero(c):
            r = r + self.accumulate_value(tab, ctx.factor, c * uq)
        return r

    def lambda_volume(self, ctx: VolumeContext):
        p, tab = self.problem, ctx.tab
        f = jnp.broadcast_to(jnp.asarray(p.f(ctx.x), ctx.factor.dtype),
                             ctx.x.shape[:-1])
        return self.accumulate_value(tab, ctx.factor, -f)

    def alpha_boundary(self, ctx: FaceContext, u):
        p, tab = self.problem, ctx.tab
        bct = jnp.broadcast_to(jnp.asarray(p.bctype(ctx.x)), ctx.x.shape[:-1])
        uq = self.value_at_qp(tab, u)
        b = jnp.asarray(p.b(ctx.x))
        bn = jnp.sum(jnp.broadcast_to(b, ctx.x.shape) * ctx.normal, axis=-1)
        w = jnp.where(bct == BCType.OUTFLOW, bn * uq, 0.0)
        return self.accumulate_value(tab, ctx.factor, w)

    def lambda_boundary(self, ctx: FaceContext):
        p, tab = self.problem, ctx.tab
        bct = jnp.broadcast_to(jnp.asarray(p.bctype(ctx.x)), ctx.x.shape[:-1])
        jflux = jnp.broadcast_to(jnp.asarray(p.j(ctx.x), ctx.factor.dtype),
                                 ctx.x.shape[:-1])
        o = jnp.broadcast_to(jnp.asarray(p.o(ctx.x), ctx.factor.dtype),
                             ctx.x.shape[:-1])
        w = jnp.where(bct == BCType.NEUMANN, jflux,
                      jnp.where(bct == BCType.OUTFLOW, o, 0.0))
        return self.accumulate_value(tab, ctx.factor, w)


def _is_zero(v) -> bool:
    """Static zero test for coefficient shortcuts (trace-time only)."""
    try:
        return float(v) == 0.0
    except (TypeError, ValueError):
        return False
