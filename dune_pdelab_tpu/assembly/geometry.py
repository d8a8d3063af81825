"""Element/face geometry precomputation for the batched assembler.

TPU-native analog of dune-geometry mappings as used by PDELab kernels
(`geo.jacobianInverseTransposed`, `geo.integrationElement`; reference usage:
dune/pdelab/localoperator/convectiondiffusionfem.hh:113-115 and
common/geometrywrapper.hh). Two paths:

  * uniform: every element is the same axis-aligned box — Jacobians are one
    shared diagonal; per-element data is just the element origin (E, dim).
    All basis-gradient transforms collapse to broadcastable (1, ...) arrays.
  * multilinear: general Q1-mapped elements — Jacobians per element per
    quadrature point from corner coordinates, inverted in closed form.

Everything here returns numpy at setup; the GridOperator wraps results as jnp
constants baked into the jitted residual.
"""
from __future__ import annotations

import numpy as np

from dune_pdelab_tpu.fe.basis import _cached_fem
from dune_pdelab_tpu.mesh.structured import StructuredMesh


def det_inv(J: np.ndarray):
    """Closed-form det and inverse-transpose of (..., d, d) for d in 1..3."""
    d = J.shape[-1]
    if d == 1:
        det = J[..., 0, 0]
        invT = (1.0 / det)[..., None, None]
        return det, invT
    if d == 2:
        a, b = J[..., 0, 0], J[..., 0, 1]
        c, e = J[..., 1, 0], J[..., 1, 1]
        det = a * e - b * c
        inv = np.empty_like(J)
        inv[..., 0, 0] = e
        inv[..., 0, 1] = -b
        inv[..., 1, 0] = -c
        inv[..., 1, 1] = a
        invT = np.swapaxes(inv, -1, -2) / det[..., None, None]
        return det, invT
    if d == 3:
        cof = np.empty_like(J)
        for i in range(3):
            for j in range(3):
                r = [k for k in range(3) if k != i]
                c = [k for k in range(3) if k != j]
                cof[..., i, j] = ((-1) ** (i + j)) * (
                    J[..., r[0], c[0]] * J[..., r[1], c[1]]
                    - J[..., r[0], c[1]] * J[..., r[1], c[0]]
                )
        det = (J[..., 0, :] * cof[..., 0, :]).sum(-1)
        invT = cof / det[..., None, None]  # inv^T = cof / det
        return det, invT
    raise NotImplementedError(f"dim {d}")


class VolumeGeometry:
    """Per-element geometry at a set of reference quadrature points."""

    def __init__(self, mesh: StructuredMesh, qp_ref: np.ndarray, weights: np.ndarray):
        self.mesh = mesh
        self.qp_ref = qp_ref            # (nqp, dim)
        self.weights = weights          # (nqp,)
        dim = mesh.dim
        if mesh.uniform:
            h = mesh.h
            detJ = float(np.prod(h))
            self.jac_inv_T = np.diag(1.0 / h)[None, None]     # (1, 1, d, d)
            self.factor = (weights * detJ)[None, :]           # (1, nqp)
            self.cell_volume = np.array([detJ])               # (1,)
            # x computed from origins: (E, dim) + qp*h — built lazily (at
            # 100M+ elements the array costs GBs and the slabbed/stencil
            # fast paths never evaluate element positions)
            self._origins = None
            self.qp_phys_offset = qp_ref * h                  # (nqp, dim)
            self.corners = None
        else:
            self._origins = None
            corners = mesh.element_corner_coords()            # (E, C, d)
            geo = _cached_fem(
                "QkFEM" if mesh.geometry_type == "cube" else "PkFEM", 1, dim)
            N, dN = geo.tabulate(qp_ref)                      # (nqp, C), (nqp, C, d)
            J = np.einsum("eci,qcj->eqij", corners, dN)       # (E, nqp, d, d)
            detJ, invT = det_inv(J)
            self.jac_inv_T = invT                             # (E, nqp, d, d)
            self.factor = weights[None, :] * np.abs(detJ)     # (E, nqp)
            self.cell_volume = np.einsum("q,eq->e", weights, np.abs(detJ))
            self.corners = corners
            self._N = N
            self.qp_phys = np.einsum("qc,ecd->eqd", N, corners)

    @property
    def origins(self):
        """(E, dim) element origins (uniform meshes; lazy), else None."""
        if self._origins is None and self.mesh.uniform:
            self._origins = (self.mesh.lower
                             + self.mesh.element_multi_index() * self.mesh.h)
        return self._origins

    def transform_grad(self, ref_grad: np.ndarray) -> np.ndarray:
        """Reference (nqp, nb, d) -> physical gradients (Eb, nqp, nb, d)."""
        if self.mesh.uniform:
            return (ref_grad / self.mesh.h)[None]             # (1, nqp, nb, d)
        return np.einsum("eqij,qbj->eqbi", self.jac_inv_T, ref_grad)


def embed_face_points(qp_face: np.ndarray, axis: int, side: int, dim: int) -> np.ndarray:
    """Embed (nqp, dim-1) face points into the reference cube at face
    (axis, side): coordinate `axis` pinned to `side`, tangential axes in
    increasing order carry the face coordinates."""
    nqp = qp_face.shape[0]
    pts = np.empty((nqp, dim))
    pts[:, axis] = float(side)
    t = 0
    for d in range(dim):
        if d != axis:
            pts[:, d] = qp_face[:, t]
            t += 1
    return pts


class FaceGeometry:
    """Geometry of a group of faces sharing (axis, side-embedding) on a
    uniform structured mesh: one shared normal, one shared face measure."""

    def __init__(self, mesh: StructuredMesh, axis: int,
                 qp_face: np.ndarray, weights: np.ndarray):
        if not mesh.uniform:
            raise NotImplementedError(
                "face integrals on mapped meshes not implemented yet"
            )
        self.mesh = mesh
        self.axis = axis
        self.qp_face = qp_face
        self.weights = weights
        h = mesh.h
        tang = [d for d in range(mesh.dim) if d != axis]
        self.measure = float(np.prod(h[tang])) if tang else 1.0
        self.factor = (weights * self.measure)[None, :]       # (1, nqp)
        self.h_normal = np.array([h[axis]])                   # (1,)
