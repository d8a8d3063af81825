"""Leaf DOF transfer strategies: local<->global gather/scatter.

The assembler's inner data movement (the LFSIndexCache gather + constrained
scatter of the reference, dune/pdelab/gridoperator/default/residualengine.hh:
209 loadCoefficients / scatter) has three TPU implementations, chosen per
leaf at setup:

  * SlicedDofMap  — structured-mesh tensor-product C0 spaces: the DOF grid is
    a lattice, so "element e, local node l -> k*e + l" is a STRIDED SLICE of
    the DOF grid per local node. Gather = nloc strided slices, scatter-add =
    nloc strided slice-adds — no gather/scatter instructions at all, which is
    the difference between ~0.1% and double-digit % of HBM roofline on TPU.
  * ReshapeDofMap — DG spaces: element DOFs are contiguous, the whole
    transfer is one reshape (the FastDG aliased-view analog, reference:
    dune/pdelab/gridoperator/fastdg/assembler.hh:25 — direct views into the
    global vector, no copies).
  * IndexDofMap   — fallback: explicit int32 index arrays + gather /
    scatter-add (mapped meshes, interleaved orderings, face groups).

All three expose gather(x) -> (E, nloc) and scatter_add(r, r_loc) -> r.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


class IndexDofMap:
    """General index-array path."""

    def __init__(self, element_dofs: np.ndarray):
        self.dofs = jnp.asarray(element_dofs, jnp.int32)

    def gather(self, x):
        return x[self.dofs]

    def scatter_add(self, r, r_loc):
        return r.at[self.dofs].add(r_loc.astype(r.dtype))


class ReshapeDofMap:
    """DG fast path: element DOFs are [offset + e*nb + l]."""

    def __init__(self, offset: int, nelements: int, nbasis: int):
        self.offset = offset
        self.E = nelements
        self.nb = nbasis

    def gather(self, x):
        seg = x[self.offset:self.offset + self.E * self.nb]
        return seg.reshape(self.E, self.nb)

    def scatter_add(self, r, r_loc):
        flat = r_loc.reshape(-1).astype(r.dtype)
        return r.at[self.offset:self.offset + self.E * self.nb].add(flat)


class SlicedDofMap:
    """Structured C0 fast path: strided slices of the DOF lattice.

    DOF grid dims (per axis, dim 0 fastest): n_d = k*c_d (+1 if not
    periodic). Element flat order and local tensor order both have dim 0
    fastest, so the (reversed-shape) C-order reshape lines the axes up.
    Periodic axes compute on an extended (+1) grid: gather reads a wrapped
    copy of the first plane, scatter folds the last plane back onto it.
    """

    def __init__(self, offset: int, k: int, cells, periodic, local_mi):
        self.offset = int(offset)
        self.k = k
        self.cells = tuple(cells)
        self.periodic = tuple(periodic)
        self.dim = len(cells)
        self.local_mi = np.asarray(local_mi)      # (nloc, dim)
        self.dims = tuple(
            k * c if p else k * c + 1 for c, p in zip(cells, periodic)
        )                                          # stored grid dims
        self.ext_dims = tuple(k * c + 1 for c in cells)   # computation grid
        self.n = int(np.prod(self.dims))
        self.nloc = len(self.local_mi)

    # grid shapes are reversed (C-order: slowest axis first)
    def _grid(self, ext=False):
        d = self.ext_dims if ext else self.dims
        return tuple(reversed(d))

    def _slices(self, l):
        """Index expression (slowest axis first) for local node l on the
        extended grid."""
        mi = self.local_mi[l]
        out = []
        for d in reversed(range(self.dim)):
            start = int(mi[d])
            out.append(slice(start, start + self.k * (self.cells[d] - 1) + 1,
                             self.k))
        return tuple(out)

    def _axslice(self, ax, sl):
        idx = [slice(None)] * self.dim
        idx[ax] = sl
        return tuple(idx)

    def _extend(self, xg):
        """Stored grid -> extended grid (wrap first plane on periodic axes)."""
        for d in range(self.dim):
            if self.periodic[d]:
                ax = self.dim - 1 - d   # reversed layout
                first = xg[self._axslice(ax, slice(0, 1))]
                xg = jnp.concatenate([xg, first], axis=ax)
        return xg

    def _fold(self, rg):
        """Extended grid -> stored grid (fold last plane onto the first)."""
        for d in range(self.dim):
            if self.periodic[d]:
                ax = self.dim - 1 - d
                last = rg[self._axslice(ax, slice(-1, None))]
                rg = rg[self._axslice(ax, slice(0, -1))]
                rg = rg.at[self._axslice(ax, slice(0, 1))].add(last)
        return rg

    def gather(self, x):
        xg = x[self.offset:self.offset + self.n].reshape(self._grid())
        xg = self._extend(xg)
        cols = [xg[self._slices(l)].reshape(-1) for l in range(self.nloc)]
        return jnp.stack(cols, axis=1)            # (E, nloc)

    def scatter_add(self, r, r_loc):
        eshape = tuple(reversed(self.cells))
        rg = jnp.zeros(self._grid(ext=True), r.dtype)
        for l in range(self.nloc):
            rg = rg.at[self._slices(l)].add(
                r_loc[:, l].reshape(eshape).astype(r.dtype))
        rg = self._fold(rg)
        return r.at[self.offset:self.offset + self.n].add(rg.reshape(-1))


def make_leaf_dof_map(leaf, element_dofs: np.ndarray | None, offset=None):
    """Choose the fastest transfer strategy for a leaf space.

    `element_dofs` is the (E, nloc) GLOBAL map (offsets applied), or None
    for a standalone leaf at offset 0 — then the fast strategies are
    derived from the layout alone and the index array is only built (from
    `leaf.element_dofs`, lazily) when no fast path applies.
    `offset` is the leaf's contiguous global offset when the leaf occupies
    [offset, offset + leaf.ndofs) contiguously, else None.
    """
    fem = leaf.fem
    mesh = leaf.mesh
    E = mesh.nelements
    nb = fem.nbasis
    if offset is not None:
        if fem.continuity == "DG":
            if element_dofs is None:
                # standalone DG leaf: the layout IS element-major by
                # construction (space.py generic branch)
                return ReshapeDofMap(int(offset), E, nb)
            expected = offset + np.arange(E, dtype=np.int64)[:, None] * nb \
                + np.arange(nb, dtype=np.int64)[None, :]
            if np.array_equal(np.asarray(element_dofs, np.int64), expected):
                return ReshapeDofMap(int(offset), E, nb)
        elif (fem.continuity == "C0" and hasattr(fem, "_mi")
              and getattr(fem, "variant", "equidistant") == "equidistant"
              and mesh.geometry_type == "cube"
              and hasattr(mesh, "cells")):   # not on AdaptiveMesh
            return SlicedDofMap(int(offset), fem.degree, mesh.cells,
                                mesh.periodic, fem._mi)
    return IndexDofMap(leaf.element_dofs if element_dofs is None
                       else element_dofs)


class IndexFaceTransfer:
    """General face-group transfer via element index arrays."""

    def __init__(self, leaf_dofs: np.ndarray):
        self.dofs = jnp.asarray(leaf_dofs, jnp.int32)

    def gather(self, x):
        return x[self.dofs]

    def scatter_add(self, r, r_loc):
        return r.at[self.dofs].add(r_loc.astype(r.dtype))


class SlabFaceTransfer:
    """Structured-mesh face-group transfer for DG (reshape) leaves.

    For faces normal to `axis`, the inside/outside element sets are slabs of
    the element grid, so gathering the face coefficients is a reshape + slice
    of the leaf's contiguous DOF block (and scatter-add is a slice-add) —
    the face analog of ReshapeDofMap; no index arrays in the hot path.
    """

    def __init__(self, offset: int, cells, nbasis: int, axis: int,
                 lo: int, hi_off: int, periodic_roll: int = 0):
        self.offset = int(offset)
        self.cells = tuple(cells)
        self.nb = nbasis
        self.E = int(np.prod(cells))
        self.dim = len(cells)
        self.gax = self.dim - 1 - axis      # C-order axis in the grid view
        self.lo = lo
        self.hi_off = hi_off                # slice end = cells[axis] + hi_off
        self.roll = periodic_roll
        self.grid_shape = tuple(reversed(self.cells)) + (nbasis,)

    def _slc(self):
        idx = [slice(None)] * (self.dim + 1)
        idx[self.gax] = slice(self.lo, self.cells[self.dim - 1 - self.gax]
                              + self.hi_off)
        return tuple(idx)

    def gather(self, x):
        g = x[self.offset:self.offset + self.E * self.nb].reshape(
            self.grid_shape)
        if self.roll:
            g = jnp.roll(g, -self.roll, axis=self.gax)
        return g[self._slc()].reshape(-1, self.nb)

    def scatter_add(self, r, r_loc):
        g = jnp.zeros(self.grid_shape, r.dtype)
        sl = self._slc()
        shape = tuple(
            (s.stop - s.start) if isinstance(s, slice) and s.start is not None
            else dim for s, dim in zip(sl, self.grid_shape)
        )
        g = g.at[sl].add(r_loc.reshape(shape).astype(r.dtype))
        if self.roll:
            g = jnp.roll(g, self.roll, axis=self.gax)
        return r.at[self.offset:self.offset + self.E * self.nb].add(
            g.reshape(-1))
