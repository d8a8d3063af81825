"""Discrete grid functions and norms: evaluate FE solutions, L2 errors.

TPU-native analog of DiscreteGridFunction and friends (reference:
dune/pdelab/gridfunctionspace/gridfunctionspaceutilities.hh:54 value, :491
gradient) and the test oracles l2difference/l2norm (reference:
dune/pdelab/test/l2difference.hh:15-34, l2norm.hh).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from dune_pdelab_tpu.assembly.geometry import VolumeGeometry
from dune_pdelab_tpu.fe.quadrature import quadrature_rule


def _leaf_eval_setup(space, quad_order):
    mesh = space.mesh
    qp, w = quadrature_rule(mesh.geometry_type, mesh.dim, quad_order)
    geo = VolumeGeometry(mesh, qp, w)
    vals, grads = space.fem.tabulate(qp)
    if mesh.uniform:
        xq = geo.origins[:, None, :] + (qp * mesh.h)[None]
    else:
        xq = geo.qp_phys
    return geo, vals, grads, xq


def evaluate_at_quadrature(space, x, quad_order=None):
    """u_h and grad u_h at volume quadrature points of every element.

    Returns (x_qp (E,nqp,dim), u (E,nqp), gradu (E,nqp,dim), factor (Eb,nqp)).
    """
    qo = quad_order if quad_order is not None else 2 * space.fem.degree + 2
    geo, vals, grads, xq = _leaf_eval_setup(space, qo)
    u_loc = x[jnp.asarray(space.element_dofs, jnp.int32)]     # (E, nb)
    u = jnp.einsum("qb,eb->eq", jnp.asarray(vals, x.dtype), u_loc)
    gphys = jnp.asarray(geo.transform_grad(grads), x.dtype)
    if gphys.shape[0] == 1:
        gu = jnp.einsum("qbd,eb->eqd", gphys[0], u_loc)
    else:
        gu = jnp.einsum("eqbd,eb->eqd", gphys, u_loc)
    return xq, u, gu, jnp.asarray(geo.factor, x.dtype)


def l2_norm(space, x, quad_order=None):
    _, u, _, factor = evaluate_at_quadrature(space, x, quad_order)
    return jnp.sqrt(jnp.real(jnp.sum(factor * u * jnp.conj(u))))


def l2_difference(space, x, exact, quad_order=None):
    """|| u_h - exact ||_L2 (reference: test/l2difference.hh:15-34)."""
    xq, u, _, factor = evaluate_at_quadrature(space, x, quad_order)
    ue = jnp.asarray(np.asarray(exact(np.asarray(xq).reshape(-1, xq.shape[-1])))
                     .reshape(u.shape), x.dtype)
    d = u - ue
    return jnp.sqrt(jnp.real(jnp.sum(factor * d * jnp.conj(d))))


def h1_seminorm_difference(space, x, exact_grad, quad_order=None):
    """| u_h - exact |_H1 given the exact gradient callable."""
    xq, _, gu, factor = evaluate_at_quadrature(space, x, quad_order)
    ge = jnp.asarray(
        np.asarray(exact_grad(np.asarray(xq).reshape(-1, xq.shape[-1])))
        .reshape(gu.shape), x.dtype)
    d = gu - ge
    return jnp.sqrt(jnp.real(jnp.sum(factor * jnp.sum(d * jnp.conj(d),
                                                      axis=-1))))


def integrate_grid_function(space, x, quad_order=None):
    """∫ u_h dx (functionutilities.hh integrateGridFunction analog)."""
    _, u, _, factor = evaluate_at_quadrature(space, x, quad_order)
    return jnp.sum(factor * u)


class DiscreteGridFunction:
    """Evaluable view of (space, dof vector) — DiscreteGridFunction analog
    (reference: dune/pdelab/gridfunctionspace/gridfunctionspaceutilities.hh:54)
    with the arithmetic combinators of the reference's function/ directory
    (productgridfunctionadapter, difference, scaled, ...)."""

    def __init__(self, space, x):
        self.space = space
        self.x = x

    def __call__(self, pts):
        from dune_pdelab_tpu.adaptivity.adaptivity import _evaluate_on
        return _evaluate_on(self.space, self.x, pts)

    # -- combinators return plain point-callables ---------------------------
    def __add__(self, other):
        return _combine(self, other, lambda a, b: a + b)

    def __sub__(self, other):
        return _combine(self, other, lambda a, b: a - b)

    def __mul__(self, other):
        return _combine(self, other, lambda a, b: a * b)

    __rmul__ = __mul__

    def squared(self):
        return _combine(self, self, lambda a, b: a * b)

    def l2_norm(self, quad_order=None):
        return l2_norm(self.space, self.x, quad_order)

    def integrate(self, quad_order=None):
        return integrate_grid_function(self.space, self.x, quad_order)


def _combine(f, g, op):
    fe = f if callable(f) else (lambda p, v=f: np.full(len(p), v))
    ge = g if callable(g) else (lambda p, v=g: np.full(len(p), v))

    def h(pts):
        return op(np.asarray(fe(pts)), np.asarray(ge(pts)))

    return h
