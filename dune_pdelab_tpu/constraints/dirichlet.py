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
    """Static constraint data for one flat DOF vector."""

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

    @property
    def has_affine(self) -> bool:
        return self.affine_rows is not None and len(self.affine_rows) > 0

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
    if bctype is None or space.fem.continuity != "C0":
        return mask
    bmask = space.boundary_dof_mask()
    if bctype is True:
        return bmask
    idx = np.nonzero(bmask)[0]
    coords = space.dof_coords()[idx]
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
        return DirichletConstraints(_leaf_constraints(bctype, space))
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
