"""DG error indicator and slope limiting.

Reference analogs: dune/pdelab/localoperator/errorindicatordg.hh (410 LoC —
jump-based indicator driving DG adaptivity) and the flux/slope Limiter hook
of the explicit one-step method (reference:
dune/pdelab/instationary/explicitonestep.hh:704).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def dg_jump_indicator(go, x, time=0.0):
    """eta_K^2 = sum_faces h_F ||[u_h]||_F^2 per element for a scalar DG
    space (uses the grid operator's precomputed skeleton groups)."""
    space = go.space
    assert space.is_leaf and space.fem.continuity == "DG"
    E = go.mesh.nelements
    eta2 = jnp.zeros(E, x.dtype)
    for g in go.skel_groups:
        tin = go._leaf_tabs(g.tabs_in, x.dtype)[0]
        tout = go._leaf_tabs(g.tabs_out, x.dtype)[0]
        ui = g.tr_in[0].gather(x)
        uo = g.tr_out[0].gather(x)
        vi = jnp.einsum("qb,eb->eq", tin.phi, ui)
        vo = jnp.einsum("qb,eb->eq", tout.phi, uo)
        jump2 = jnp.sum((vi - vo) ** 2 * jnp.asarray(g.factor, x.dtype),
                        axis=-1)
        w = float(g.h_in[0]) * jump2
        eta2 = eta2.at[jnp.asarray(g.elements, jnp.int32)].add(w)
        eta2 = eta2.at[jnp.asarray(g.outside, jnp.int32)].add(w)
    return eta2


def _minmod(a, b, c):
    s = jnp.sign(a)
    agree = (jnp.sign(b) == s) & (jnp.sign(c) == s)
    m = s * jnp.minimum(jnp.abs(a), jnp.minimum(jnp.abs(b), jnp.abs(c)))
    return jnp.where(agree, m, 0.0)


class MinmodSlopeLimiter:
    """Minmod slope limiter for Q1DG scalar fields on structured meshes.

    Per element: keep the mean, replace each directional slope by
    minmod(slope, theta*(forward mean difference), theta*(backward mean
    difference)); rebuild the multilinear nodal values. Neighbors across
    non-periodic boundaries reuse the element's own mean (zero difference ->
    slopes flatten at boundaries). Usable as the `limiter` hook of
    ExplicitOneStepMethod (reference: explicitonestep.hh Limiter protocol).
    """

    def __init__(self, space, theta: float = 1.0):
        assert space.is_leaf and space.fem.continuity == "DG" \
            and space.fem.degree == 1
        self.space = space
        self.theta = theta
        mesh = space.mesh
        self.mesh = mesh
        self.dim = mesh.dim
        self.nb = space.fem.nbasis
        # node sign pattern per axis: (2*xi_a - 1) at the nodes
        mi = space.fem._mi          # (nb, dim) in {0,1}
        self.node_sign = jnp.asarray(2.0 * mi - 1.0)  # (nb, dim)
        self.eshape = tuple(reversed(mesh.cells))

    def _neighbor_means(self, m_grid, axis, shift):
        ax = self.dim - 1 - axis
        if self.mesh.periodic[axis]:
            return jnp.roll(m_grid, -shift, axis=ax)
        if shift > 0:
            shifted = jnp.concatenate(
                [m_grid.take(jnp.arange(1, m_grid.shape[ax]), axis=ax),
                 m_grid.take(jnp.array([m_grid.shape[ax] - 1]), axis=ax)],
                axis=ax)
        else:
            shifted = jnp.concatenate(
                [m_grid.take(jnp.array([0]), axis=ax),
                 m_grid.take(jnp.arange(0, m_grid.shape[ax] - 1), axis=ax)],
                axis=ax)
        return shifted

    def __call__(self, x):
        u = x.reshape((-1, self.nb))          # (E, nb)
        mean = u.mean(axis=1)
        m_grid = mean.reshape(self.eshape)
        new = jnp.broadcast_to(mean[:, None], u.shape)
        out = new
        for a in range(self.dim):
            # current slope: mean of sign-weighted nodes
            s = jnp.mean(u * self.node_sign[None, :, a], axis=1)
            dp = (self._neighbor_means(m_grid, a, +1) - m_grid).reshape(-1)
            dm = (m_grid - self._neighbor_means(m_grid, a, -1)).reshape(-1)
            s_lim = _minmod(s, self.theta * 0.5 * dp, self.theta * 0.5 * dm)
            out = out + s_lim[:, None] * self.node_sign[None, :, a]
        return out.reshape(x.shape)
