"""H(curl)-conforming edge elements: lowest-order Nedelec on cubes.

TPU-native analog of the reference's edge FiniteElementMap (reference:
dune/pdelab/finiteelementmap/edges0.5fem.hh:24 EdgeS0.5 Nedelec elements).
DOFs are tangential line integrals along edges with the GLOBAL edge
direction +e_axis; on structured meshes all shared-edge tangents agree, so
no orientation flips are needed.

Provides `tabulate_vector` (values (npts, nb, dim)) and `tabulate_curl`
((npts, nb) scalar curl in 2D, (npts, nb, 3) in 3D) on the reference cube.
"""
from __future__ import annotations

import itertools

import numpy as np


class N0Cube:
    """Lowest-order Nedelec (type 1) on the reference square/cube.

    Basis ordering: for each axis a (edge direction), the 2^(dim-1)
    transverse corner combinations in bit order (dim0-fastest among the
    transverse axes). phi has only component a nonzero, equal to the tensor
    Q1 hat function of the transverse coordinates.
    """

    geometry = "cube"
    continuity = "Hcurl"
    nodes = None
    degree = 1

    def __init__(self, dim: int):
        assert dim in (2, 3)
        self.dim = dim
        self.edges = []   # (axis, transverse bits)
        for a in range(dim):
            tdims = [d for d in range(dim) if d != a]
            for bits in itertools.product((0, 1), repeat=dim - 1):
                self.edges.append((a, tuple(tdims), bits))
        self.nbasis = len(self.edges)   # 4 (2D) / 12 (3D)

    @staticmethod
    def _hat(x, bit):
        return x if bit else 1.0 - x

    @staticmethod
    def _dhat(bit):
        return 1.0 if bit else -1.0

    def tabulate_vector(self, points):
        points = np.atleast_2d(points)
        npts = points.shape[0]
        v = np.zeros((npts, self.nbasis, self.dim))
        for b, (a, tdims, bits) in enumerate(self.edges):
            val = np.ones(npts)
            for td, bit in zip(tdims, bits):
                val = val * self._hat(points[:, td], bit)
            v[:, b, a] = val
        return v

    def tabulate_curl(self, points):
        points = np.atleast_2d(points)
        npts = points.shape[0]
        if self.dim == 2:
            # scalar curl = d v_y/dx - d v_x/dy
            c = np.zeros((npts, self.nbasis))
            for b, (a, tdims, bits) in enumerate(self.edges):
                td, bit = tdims[0], bits[0]
                if a == 0:       # v = (hat(td), 0): curl = -d/dy hat
                    c[:, b] = -self._dhat(bit)
                else:            # v = (0, hat(td)): curl = d/dx hat
                    c[:, b] = self._dhat(bit)
            return c
        # 3D: curl phi for phi = hat(t1)hat(t2) e_a
        c = np.zeros((npts, self.nbasis, 3))
        for b, (a, tdims, bits) in enumerate(self.edges):
            t1, t2 = tdims
            b1, b2 = bits
            h1 = self._hat(points[:, t1], b1)
            h2 = self._hat(points[:, t2], b2)
            d1 = self._dhat(b1)
            d2 = self._dhat(b2)
            # curl(f e_a) = grad f x e_a ; grad f = d1 h2 e_t1 + h1 d2 e_t2
            for (td, dval) in ((t1, d1 * h2), (t2, h1 * d2)):
                e_td = np.zeros(3)
                e_td[td] = 1.0
                e_a = np.zeros(3)
                e_a[a] = 1.0
                cr = np.cross(e_td, e_a)
                for comp in range(3):
                    if cr[comp] != 0.0:
                        c[:, b, comp] += cr[comp] * dval
        return c

    def __repr__(self):
        return f"N0Cube(dim={self.dim}, nbasis={self.nbasis}, Hcurl)"
