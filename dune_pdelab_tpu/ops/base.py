"""Local operator protocol: PDE weak forms as batched element kernels.

TPU-native analog of PDELab's LocalOperator interface (reference:
dune/pdelab/localoperator/interface.hh — alpha_volume:273, alpha_skeleton:342,
alpha_boundary:375, lambda_volume:403, lambda_boundary:468 — and the do* flag
dispatch in localoperator/flags.hh:18-98 / callswitch.hh:406).

Differences by design:
  * a kernel processes ALL elements (or faces) of a group at once — arguments
    are batched arrays, so contractions run on the MXU;
  * `do*` flags become method presence (`hasattr(lop, "alpha_volume")`);
  * `jacobian_*`, `jacobian_apply_*` and the NumericalJacobian mixins
    (reference: localoperator/numericaljacobian.hh:31) are replaced wholesale
    by JAX AD: jacobian_apply = jvp of alpha, assembled blocks via
    basis-vector jvp probing in the assembler;
  * time dependence (InstationaryLocalOperatorDefaultMethods, reference:
    localoperator/idefault.hh) is `lop.set_time(t) -> new lop` (functional).

Kernel signatures (u is a per-leaf tuple for composite spaces, else an array):
  alpha_volume(ctx: VolumeContext, u (E, nloc))            -> r (E, nloc)
  lambda_volume(ctx: VolumeContext)                        -> r (E, nloc)
  alpha_boundary(ctx: FaceContext, u (F, nloc))            -> r (F, nloc)
  lambda_boundary(ctx: FaceContext)                        -> r (F, nloc)
  alpha_skeleton(ctx: SkeletonContext, u_in, u_out)        -> (r_in, r_out)
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class LeafTab:
    """Per-leaf basis data at a set of reference points, batched over elements.

    Shapes broadcast over the element/face axis: on uniform meshes the
    element axis of `grad` / `factor` is 1 (XLA broadcasts in-register, the
    LocalBasisCache analog with zero per-element memory; reference:
    dune/pdelab/finiteelement/localbasiscache.hh).
    """

    phi: Any          # (nqp, nb)
    grad: Any         # (Eb, nqp, nb, dim) physical gradients
    ref_grad: Any     # (nqp, nb, dim) reference gradients
    degree: int = 1   # polynomial degree of the leaf element
    vec_phi: Any = None   # H(div)/H(curl) elements: (nqp, nb, dim) mapped values
    div: Any = None       # H(div) elements: (nqp, nb) physical divergence
    curl: Any = None      # H(curl) elements: (nqp, nb) 2D / (nqp, nb, 3) 3D


@dataclass(frozen=True)
class VolumeContext:
    """Everything an alpha_volume/lambda_volume kernel may need.

    The analog of (ElementGeometry, LFSU cache, quadrature rule) handed to
    alpha_volume (reference: localoperator/convectiondiffusionfem.hh:63-138).
    """

    weights: Any      # (nqp,) quadrature weights
    x: Any            # (E, nqp, dim) physical quadrature points
    factor: Any       # (Eb, nqp) w_q * |det J|
    tabs: tuple       # per-leaf LeafTab
    jac_inv_T: Any    # (Eb, nqp, dim, dim) or diag (dim,) for uniform meshes
    cell_volume: Any  # (Eb,) measure of each element
    time: Any = 0.0

    @property
    def tab(self) -> LeafTab:
        return self.tabs[0]

    @property
    def nqp(self) -> int:
        return len(self.weights)


@dataclass(frozen=True)
class FaceContext:
    """Boundary-face kernel context (alpha_boundary/lambda_boundary analog).

    `normal` is the outward unit normal (from the inside element). On the
    uniform structured mesh each face group shares one normal (a +/- unit
    vector) so it is a (dim,) constant.
    """

    weights: Any      # (nqp,)
    x: Any            # (F, nqp, dim)
    factor: Any       # (Fb, nqp) w_q * face measure
    normal: Any       # (dim,) or (F, nqp, dim)
    tabs: tuple       # per-leaf LeafTab tabulated at face qps (inside embedding)
    h_inside: Any     # (Fb,) characteristic element length normal to face
    time: Any = 0.0

    @property
    def tab(self) -> LeafTab:
        return self.tabs[0]


@dataclass(frozen=True)
class SkeletonContext:
    """Interior-face kernel context (alpha_skeleton analog).

    Tabulations for both embeddings: `inside` at the face seen from the lower
    element (its upper face), `outside` from the upper element. Normal points
    from inside to outside (reference convention:
    localoperator/convectiondiffusiondg.hh:271 two-sided accumulate).
    """

    weights: Any
    x: Any            # (F, nqp, dim)
    factor: Any       # (Fb, nqp)
    normal: Any       # (dim,) or (F, nqp, dim)
    tabs_in: tuple    # per-leaf LeafTab, inside embedding
    tabs_out: tuple   # per-leaf LeafTab, outside embedding
    h_inside: Any     # (Fb,)
    h_outside: Any    # (Fb,)
    time: Any = 0.0

    @property
    def tab_in(self) -> LeafTab:
        return self.tabs_in[0]

    @property
    def tab_out(self) -> LeafTab:
        return self.tabs_out[0]


class LocalOperator:
    """Base class for PDE weak-form kernels.

    Subclasses implement any subset of alpha_volume / lambda_volume /
    alpha_boundary / lambda_boundary / alpha_skeleton. Attributes:

      is_linear:      alpha terms are linear in u (isLinear flag analog)
      qp_separable:   volume kernels are plain quadrature sums (no
                      cross-qp coupling such as element-center evaluation
                      via a mean over qp) — enables the assembler's
                      qp-looped fusion path on large uniform meshes
      quadrature_factor, quadrature_add: default quad order =
                      quadrature_factor * max_degree + quadrature_add
                      (intorderadd/quadrature_factor analog,
                      reference: convectiondiffusionfem.hh:46-49)
    """

    is_linear = False
    qp_separable = False
    quadrature_factor = 2
    quadrature_add = 0

    def quad_order(self, degree: int) -> int:
        return self.quadrature_factor * degree + self.quadrature_add

    def set_time(self, t):
        """Return a copy bound to time t; default: operators ignore time."""
        return self

    # -- helpers usable inside kernels --------------------------------------
    @staticmethod
    def value_at_qp(tab: LeafTab, u):
        """u_h at quadrature points: (E, nloc) -> (E, nqp)."""
        return jnp.einsum("qb,eb->eq", tab.phi, u, precision="highest")

    @staticmethod
    def gradient_at_qp(tab: LeafTab, u):
        """grad u_h at quadrature points: (E, nloc) -> (E, nqp, dim).

        grad's element axis may be broadcast (size 1 on uniform meshes) — that
        case contracts through a single shared (nqp*dim, nb) matmul (MXU).
        """
        if tab.grad.shape[0] == 1:
            return jnp.einsum("qbd,eb->eqd", tab.grad[0], u, precision="highest")
        return jnp.einsum("eqbd,eb->eqd", tab.grad, u, precision="highest")

    @staticmethod
    def accumulate_value(tab: LeafTab, factor, w):
        """sum_q w(E,nqp) * phi_i * factor -> (E, nloc)."""
        return jnp.einsum("qb,eq->eb", tab.phi, w * factor, precision="highest")

    @staticmethod
    def accumulate_gradient(tab: LeafTab, factor, wvec):
        """sum_q (wvec(E,nqp,dim) . grad phi_i) * factor -> (E, nloc)."""
        wv = wvec * factor[..., None]
        if tab.grad.shape[0] == 1:
            return jnp.einsum("qbd,eqd->eb", tab.grad[0], wv, precision="highest")
        return jnp.einsum("eqbd,eqd->eb", tab.grad, wv, precision="highest")

    # -- H(div) vector-element helpers ---------------------------------------
    # vec_phi/div may carry a leading element axis (affine simplex Piola):
    # (E, nqp, nb, d) / (E, nqp, nb) instead of the shared uniform-mesh form.
    @staticmethod
    def hdiv_value_at_qp(tab: LeafTab, u):
        """vector value of an H(div) field: (E, nloc) -> (E, nqp, dim)."""
        if tab.vec_phi.ndim == 4:
            return jnp.einsum("eqbd,eb->eqd", tab.vec_phi, u, precision="highest")
        return jnp.einsum("qbd,eb->eqd", tab.vec_phi, u, precision="highest")

    @staticmethod
    def div_at_qp(tab: LeafTab, u):
        """divergence of an H(div) field: (E, nloc) -> (E, nqp)."""
        if tab.div.ndim == 3:
            return jnp.einsum("eqb,eb->eq", tab.div, u, precision="highest")
        return jnp.einsum("qb,eb->eq", tab.div, u, precision="highest")

    @staticmethod
    def accumulate_hdiv(tab: LeafTab, factor, wvec):
        """sum_q wvec(E,nqp,dim) . phi_i * factor -> (E, nloc)."""
        wv = wvec * factor[..., None]
        if tab.vec_phi.ndim == 4:
            return jnp.einsum("eqbd,eqd->eb", tab.vec_phi, wv, precision="highest")
        return jnp.einsum("qbd,eqd->eb", tab.vec_phi, wv, precision="highest")

    @staticmethod
    def accumulate_div(tab: LeafTab, factor, w):
        """sum_q w(E,nqp) * div phi_i * factor -> (E, nloc)."""
        if tab.div.ndim == 3:
            return jnp.einsum("eqb,eq->eb", tab.div, w * factor, precision="highest")
        return jnp.einsum("qb,eq->eb", tab.div, w * factor, precision="highest")

    # -- H(curl) edge-element helpers ---------------------------------------
    # batched (affine-simplex) tabs carry a leading element axis; detect via
    # vec_phi.ndim == 4 (shapes alone are ambiguous for nb == 3).
    @staticmethod
    def curl_at_qp(tab: LeafTab, u):
        """curl of an H(curl) field: (E,nqp) in 2D, (E,nqp,3) in 3D."""
        if tab.vec_phi is not None and tab.vec_phi.ndim == 4:
            if tab.curl.ndim == 3:
                return jnp.einsum("eqb,eb->eq", tab.curl, u, precision="highest")
            return jnp.einsum("eqbd,eb->eqd", tab.curl, u, precision="highest")
        if tab.curl.ndim == 2:
            return jnp.einsum("qb,eb->eq", tab.curl, u, precision="highest")
        return jnp.einsum("qbd,eb->eqd", tab.curl, u, precision="highest")

    @staticmethod
    def accumulate_curl(tab: LeafTab, factor, w):
        """Dual of curl_at_qp: weight w (E,nqp[,3]) -> (E, nloc)."""
        if tab.vec_phi is not None and tab.vec_phi.ndim == 4:
            if tab.curl.ndim == 3:
                return jnp.einsum("eqb,eq->eb", tab.curl, w * factor, precision="highest")
            return jnp.einsum("eqbd,eqd->eb", tab.curl,
                              w * factor[..., None], precision="highest")
        if tab.curl.ndim == 2:
            return jnp.einsum("qb,eq->eb", tab.curl, w * factor, precision="highest")
        return jnp.einsum("qbd,eqd->eb", tab.curl, w * factor[..., None], precision="highest")


class CombinedOperator(LocalOperator):
    """Weighted sum of local operators (reference:
    localoperator/combinedoperator.hh:29, sum.hh:25, weightedsum.hh,
    scaled.hh). Useful for mass + stiffness combinations outside the
    one-step machinery."""

    def __init__(self, ops, weights=None):
        self.ops = tuple(ops)
        self.weights = tuple(weights) if weights is not None else (1.0,) * len(self.ops)
        self.is_linear = all(op.is_linear for op in self.ops)
        self.quadrature_factor = max(op.quadrature_factor for op in self.ops)
        self.quadrature_add = max(op.quadrature_add for op in self.ops)

    def set_time(self, t):
        return CombinedOperator([op.set_time(t) for op in self.ops], self.weights)

    def _sum(self, method, *args):
        out = None
        for w, op in zip(self.weights, self.ops):
            if hasattr(op, method):
                term = getattr(op, method)(*args)
                if isinstance(term, tuple):
                    term = tuple(w * t for t in term)
                    out = term if out is None else tuple(a + b for a, b in zip(out, term))
                else:
                    out = w * term if out is None else out + w * term
        return out

    def __getattr__(self, name):
        if name in ("alpha_volume", "lambda_volume", "alpha_boundary",
                    "lambda_boundary", "alpha_skeleton", "lambda_skeleton"):
            if any(hasattr(op, name) for op in self.ops):
                return lambda *args: self._sum(name, *args)
        raise AttributeError(name)


def ScaledOperator(op, factor):
    """Scaled local operator (reference: localoperator/scaled.hh)."""
    return CombinedOperator([op], [factor])
