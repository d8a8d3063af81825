"""Maxwell DG operator (first-order curl system, upwind fluxes).

TPU-native analog of the reference kernel (reference:
dune/pdelab/localoperator/maxwelldg.hh:316 — eigendecomposed numerical flux
over a 6-component DG system, used with explicit RK). Normalized materials
(eps = mu = 1, unit impedance):

    E_t =  ∇×H,    H_t = -∇×E

on PowerSpace(DG, 6) with leaf order (E_1, E_2, E_3, H_1, H_2, H_3).
Upwind fluxes (Hesthaven-Warburton form, unit impedance):

    H* = {H} + 1/2 n×[E],     E* = {E} - 1/2 n×[H]

with jump [q] = q_in - q_out and average {q}. Boundary: 'pec' (perfect
electric conductor: mirror tangential E, copy H) or 'absorb' (Silver-Mueller
via zero exterior state).
"""
from __future__ import annotations

import jax.numpy as jnp

from dune_pdelab_tpu.ops.base import (
    LocalOperator, VolumeContext, FaceContext, SkeletonContext,
)


def _cross(a, b):
    """Cross product of 3-lists of (E, nqp) arrays (or length-3 normals)."""
    return [a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0]]


class MaxwellDG(LocalOperator):
    quadrature_factor = 2
    is_linear = True

    def __init__(self, bc: str = "pec"):
        self.bc = bc

    def max_speed(self, x=None):
        return 1.0

    def _values(self, tab, q, lo):
        return [self.value_at_qp(tab, q[lo + c]) for c in range(3)]

    # -- volume --------------------------------------------------------------
    def alpha_volume(self, ctx: VolumeContext, q):
        tab = ctx.tabs[0]
        E = self._values(tab, q, 0)
        H = self._values(tab, q, 3)
        r = []
        # alpha_E,c = -∫ (e_c × H) · ∇φ ;   alpha_H,c = +∫ (e_c × E) · ∇φ
        basis = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
        for c in range(3):
            w = _cross(basis[c], H)
            r.append(-self.accumulate_gradient(
                tab, ctx.factor, jnp.stack(w, axis=-1)))
        for c in range(3):
            w = _cross(basis[c], E)
            r.append(self.accumulate_gradient(
                tab, ctx.factor, jnp.stack(w, axis=-1)))
        return tuple(r)

    # -- face machinery -------------------------------------------------------
    def _face_terms(self, n, Ei, Hi, Eo, Ho):
        """Returns (nxHstar, nxEstar) as 3-lists of qp arrays."""
        nl = [n[0], n[1], n[2]]
        Eavg = [0.5 * (a + b) for a, b in zip(Ei, Eo)]
        Havg = [0.5 * (a + b) for a, b in zip(Hi, Ho)]
        Ejmp = [a - b for a, b in zip(Ei, Eo)]
        Hjmp = [a - b for a, b in zip(Hi, Ho)]
        Hstar = [h + 0.5 * c for h, c in zip(Havg, _cross(nl, Ejmp))]
        Estar = [e - 0.5 * c for e, c in zip(Eavg, _cross(nl, Hjmp))]
        return _cross(nl, Hstar), _cross(nl, Estar)

    def alpha_skeleton(self, ctx: SkeletonContext, q_in, q_out):
        tin, tout = ctx.tab_in, ctx.tab_out
        n = ctx.normal
        Ei, Hi = self._values(tin, q_in, 0), self._values(tin, q_in, 3)
        Eo, Ho = self._values(tout, q_out, 0), self._values(tout, q_out, 3)
        nxH, nxE = self._face_terms(n, Ei, Hi, Eo, Ho)
        acc_i = lambda w: jnp.einsum("qb,eq->eb", tin.phi, w * ctx.factor)
        acc_o = lambda w: jnp.einsum("qb,eq->eb", tout.phi, w * ctx.factor)
        # r_E += -∮ (n×H*) φ ; r_H += +∮ (n×E*) φ ; outside flips n
        r_in = [acc_i(-w) for w in nxH] + [acc_i(w) for w in nxE]
        r_out = [acc_o(w) for w in nxH] + [acc_o(-w) for w in nxE]
        return tuple(r_in), tuple(r_out)

    def alpha_boundary(self, ctx: FaceContext, q):
        tab = ctx.tab
        n = ctx.normal
        Ei, Hi = self._values(tab, q, 0), self._values(tab, q, 3)
        if self.bc == "pec":
            nl = [n[0], n[1], n[2]]
            # mirror tangential E (ghost E = E - 2 (E - (E.n)n)_t => use
            # E_o = 2(E.n)n - E), copy H
            En = sum(Ei[c] * nl[c] for c in range(3))
            Eo = [2.0 * En * nl[c] - Ei[c] for c in range(3)]
            Ho = Hi
        elif self.bc == "absorb":
            Eo = [jnp.zeros_like(e) for e in Ei]
            Ho = [jnp.zeros_like(h) for h in Hi]
        else:
            raise ValueError(self.bc)
        nxH, nxE = self._face_terms(n, Ei, Hi, Eo, Ho)
        acc = lambda w: jnp.einsum("qb,eq->eb", tab.phi, w * ctx.factor)
        return tuple([acc(-w) for w in nxH] + [acc(w) for w in nxE])
