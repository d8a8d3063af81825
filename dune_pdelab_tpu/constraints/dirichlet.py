"""Constraints: Dirichlet masks and affine constraint rows.

TPU-native analog of PDELab's constraints layer (reference:
dune/pdelab/constraints/common/constraints.hh:749-972 `constraints()` driver
and DOF-vector helpers; dune/pdelab/constraints/conforming.hh:36
ConformingDirichletConstraints). PDELab fills a map
DOF -> {affine row (colIndex, weight)*} where Dirichlet = empty row; here the
same information is two static pieces:

  * `mask`   — (ndofs,) bool, True where the DOF is constrained,
  * optional affine rows (hanging nodes) as COO (rows, cols, weights) with
    constrained value = sum_j w_j x_{col_j} (empty for pure Dirichlet).

The helper functions mirror constraints.hh:796-972 as masked jnp ops.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from dune_pdelab_tpu.space.space import (
    CompositeSpace, FunctionSpace,
)


class DirichletConstraints:
    """Static constraint data for one flat DOF vector.

    `mask` marks ALL constrained DOFs (Dirichlet + hanging — the reference
    model where a constraint is a possibly-empty affine row, reference:
    dune/pdelab/constraints/common/constraintstransformation.hh:18).
    Hanging nodes carry affine rows x[row] = sum_j w_j x[col_j]; parent
    columns are guaranteed non-constrained (transitively resolved).
    """

    def __init__(self, mask: np.ndarray,
                 affine_rows: np.ndarray | None = None,
                 affine_cols: np.ndarray | None = None,
                 affine_weights: np.ndarray | None = None):
        self.mask_np = np.asarray(mask, dtype=bool)
        self.mask = jnp.asarray(self.mask_np)
        self.affine_rows = affine_rows
        self.affine_cols = affine_cols
        self.affine_weights = affine_weights
        self.nconstrained = int(self.mask_np.sum())
        if self.has_affine:
            hm = np.zeros(len(self.mask_np), dtype=bool)
            hm[np.asarray(affine_rows)] = True
            self.hanging_mask_np = hm
            self.hanging_mask = jnp.asarray(hm)
            self._arows = jnp.asarray(affine_rows, jnp.int32)
            self._acols = jnp.asarray(affine_cols, jnp.int32)
            self._aw = jnp.asarray(affine_weights)
            # per-dof parent CSR (identity for non-hanging) for the
            # assembled-Jacobian triple product (numpy, setup only)
            n = len(self.mask_np)
            cnt = np.bincount(np.asarray(affine_rows), minlength=n)
            counts = np.where(cnt > 0, cnt, 1)  # hanging: #parents, else 1
            indptr = np.zeros(n + 1, dtype=np.int64)
            indptr[1:] = np.cumsum(counts)
            pidx = np.empty(indptr[-1], dtype=np.int64)
            pw = np.ones(indptr[-1], dtype=np.float64)
            free = cnt == 0
            pidx[indptr[:-1][free]] = np.nonzero(free)[0]
            seen = {}
            for e, rrow in enumerate(np.asarray(affine_rows)):
                k = indptr[rrow] + seen.get(rrow, 0)
                seen[rrow] = seen.get(rrow, 0) + 1
                pidx[k] = np.asarray(affine_cols)[e]
                pw[k] = np.asarray(affine_weights)[e]
            self._parent_indptr = indptr
            self._parent_idx = pidx
            self._parent_w = pw

    @property
    def has_affine(self) -> bool:
        return self.affine_rows is not None and len(self.affine_rows) > 0

    # -- hanging-node operators (the etadd triple product as vector ops,
    #    reference: gridoperator/common/assemblerutilities.hh:501-586) ----
    def prolong(self, x):
        """P x: overwrite hanging DOFs with their parent interpolation."""
        if not self.has_affine:
            return x
        vals = jnp.zeros_like(x).at[self._arows].add(
            self._aw.astype(x.dtype) * x[self._acols])
        return jnp.where(self.hanging_mask, vals, x)

    def restrict_transpose(self, r):
        """P^T r: distribute hanging-row residuals to parents, zero them."""
        if not self.has_affine:
            return r
        r = r.at[self._acols].add(self._aw.astype(r.dtype) * r[self._arows])
        return jnp.where(self.hanging_mask, 0.0, r)

    def __repr__(self):
        return (f"DirichletConstraints(nconstrained={self.nconstrained}"
                f"{', +affine' if self.has_affine else ''})")


def _leaf_constraints(bctype, space: FunctionSpace) -> np.ndarray:
    """Boolean constrained-DOF mask for a leaf space.

    `bctype` is None (no constraints), True (whole boundary Dirichlet), or a
    callable evaluated at boundary DOF node coordinates returning a bool array
    (True = Dirichlet) — the DirichletConstraintsParameters analog (reference:
    dune/pdelab/constraints/common/constraintsparameters.hh:20).
    """
    mask = np.zeros(space.ndofs, dtype=bool)
    # nodal continuities admit Dirichlet-by-mask: C0 (vertex/edge/face
    # nodes) and Mimetic (face-centroid values)
    if bctype is None or space.fem.continuity not in ("C0", "Mimetic"):
        return mask
    bmask = space.boundary_dof_mask()
    if bctype is True:
        return bmask
    idx = np.nonzero(bmask)[0]
    coords = (space.dof_coords_at(idx) if hasattr(space, "dof_coords_at")
              else space.dof_coords()[idx])
    isd = np.asarray(bctype(coords), dtype=bool)
    mask[idx[isd]] = True
    return mask


def constraints(bctype, space) -> DirichletConstraints:
    """Assemble constraints for a (possibly composite) space.

    Analog of `Dune::PDELab::constraints(param, gfs, cg)` (reference:
    dune/pdelab/constraints/common/constraints.hh:775). For composite spaces
    pass a tuple of per-child bctypes (or a single one applied to all).
    """
    if getattr(space, "is_leaf", False):
        mask = _leaf_constraints(bctype, space)
        from dune_pdelab_tpu.mesh.adaptive import AdaptiveMesh
        if isinstance(space.mesh, AdaptiveMesh):
            # hanging-node affine rows; Dirichlet wins on overlap (the
            # HangingNodesDirichletConstraints composition, reference:
            # dune/pdelab/constraints/hangingnode.hh:310)
            rows, cols, w = space.mesh.hanging_constraints()
            keep = ~mask[rows]
            rows, cols, w = rows[keep], cols[keep], w[keep]
            if len(rows):
                mask = mask.copy()
                mask[rows] = True
                # parents may be Dirichlet (value prescribed) but must not
                # themselves be hanging (transitive resolution guarantee)
                assert not np.isin(cols, rows).any(), (
                    "hanging parents must not be hanging")
                return DirichletConstraints(mask, rows, cols, w)
        return DirichletConstraints(mask)
    # composite: recurse and place child masks through the ordering
    assert isinstance(space, CompositeSpace)
    if not isinstance(bctype, (tuple, list)):
        bctype = (bctype,) * space.nchildren
    mask = np.zeros(space.ndofs, dtype=bool)
    for i, (c, bc) in enumerate(zip(space.children, bctype)):
        sub = constraints(bc, c)
        gidx = space.child_global(i, np.arange(c.ndofs, dtype=np.int64))
        mask[gidx] = sub.mask_np
    return DirichletConstraints(mask)


# ---------------------------------------------------------------------------
# DOF-vector helpers (reference: constraints/common/constraints.hh:796-972)
# ---------------------------------------------------------------------------

def set_constrained_dofs(cg: DirichletConstraints, value, x):
    """x[constrained] = value  (set_constrained_dofs analog, :796)."""
    return jnp.where(cg.mask, value, x)

def set_nonconstrained_dofs(cg: DirichletConstraints, value, x):
    """x[unconstrained] = value  (set_nonconstrained_dofs analog, :960)."""
    return jnp.where(cg.mask, x, value)

def copy_constrained_dofs(cg: DirichletConstraints, x_from, x_to):
    """x_to[constrained] = x_from[constrained]  (copy_constrained_dofs, :936)."""
    return jnp.where(cg.mask, x_from, x_to)

def copy_nonconstrained_dofs(cg: DirichletConstraints, x_from, x_to):
    return jnp.where(cg.mask, x_to, x_from)


def interpolate_dirichlet(g, space, cg: DirichletConstraints, x):
    """Interpolate boundary function g into x on constrained DOFs only.

    The reference idiom is `interpolate(g, gfs, x0)` followed by
    `set_nonconstrained_dofs` / Newton fixing interior values (reference:
    dune/pdelab/test/testpoisson.cc:201); this fuses the two.
    """
    xg = space.interpolate(g, dtype=x.dtype)
    return copy_constrained_dofs(cg, xg, x)


def no_constraints(space) -> DirichletConstraints:
    """NoConstraints analog (reference: constraints/noconstraints.hh)."""
    return DirichletConstraints(np.zeros(space.ndofs, dtype=bool))
