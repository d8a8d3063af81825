"""Mesh + function-space/ordering unit tests (testgridfunctionspace /
testordering analogs, reference: dune/pdelab/test/testgridfunctionspace.cc,
testordering.cc)."""
import numpy as np
import jax.numpy as jnp
import pytest

from dune_pdelab_tpu import (
    StructuredMesh, FunctionSpace, CompositeSpace, PowerSpace,
    QkFEM, QkDGFEM, P0FEM, constraints,
)
from dune_pdelab_tpu.space.space import VectorSpace, _leaf_boundary_dof_mask
from dune_pdelab_tpu.space.functions import l2_difference


class TestMesh:
    def test_counts_2d(self):
        m = StructuredMesh([0, 0], [1, 2], (3, 4))
        assert m.nelements == 12
        assert m.nvertices == 20
        assert np.allclose(m.h, [1 / 3, 0.5])

    def test_element_vertices_2d(self):
        m = StructuredMesh([0, 0], [1, 1], (2, 2))
        ev = m.element_vertex_indices()
        assert ev.shape == (4, 4)
        # element 0 at (0,0): vertices 0,1,3,4 in a 3x3 vertex grid
        assert list(ev[0]) == [0, 1, 3, 4]
        vc = m.vertex_coords()
        assert np.allclose(vc[4], [0.5, 0.5])

    def test_corner_coords_match_vertices(self):
        m = StructuredMesh([0, 0, 0], [1, 1, 1], (2, 3, 4))
        cc = m.element_corner_coords()
        vc = m.vertex_coords()[m.element_vertex_indices()]
        assert np.allclose(cc, vc)

    def test_interior_faces_2d(self):
        m = StructuredMesh([0, 0], [1, 1], (3, 3))
        itf = m.interior_faces()
        assert len(itf["inside"]) == 2 * 3 + 3 * 2  # x-normal + y-normal
        # neighbor relation
        mi = m.element_multi_index()
        for i, o, a in zip(itf["inside"], itf["outside"], itf["axis"]):
            d = mi[o] - mi[i]
            assert d[a] == 1 and np.sum(np.abs(d)) == 1

    def test_periodic_faces(self):
        m = StructuredMesh([0, 0], [1, 1], (3, 3), periodic=(True, False))
        itf = m.interior_faces()
        assert np.sum(itf["axis"] == 0) == 9   # wraps
        assert np.sum(itf["axis"] == 1) == 6
        bf = m.boundary_faces()
        assert np.all(bf["axis"] == 1)
        assert len(bf["element"]) == 6

    def test_boundary_faces_3d(self):
        m = StructuredMesh([0, 0, 0], [1, 1, 1], (2, 2, 2))
        bf = m.boundary_faces()
        assert len(bf["element"]) == 6 * 4

    def test_refine_coarsen(self):
        m = StructuredMesh([0, 0], [1, 1], (4, 4))
        assert m.refine().cells == (8, 8)
        assert m.coarsen().cells == (2, 2)


class TestSpace:
    def test_q1_ndofs(self):
        m = StructuredMesh([0, 0], [1, 1], (4, 5))
        V = FunctionSpace(m, QkFEM(1, 2))
        assert V.ndofs == 5 * 6
        V3 = FunctionSpace(StructuredMesh([0] * 3, [1] * 3, (2, 2, 2)), QkFEM(1, 3))
        assert V3.ndofs == 27

    def test_q2_ndofs(self):
        m = StructuredMesh([0, 0], [1, 1], (4, 4))
        V = FunctionSpace(m, QkFEM(2, 2))
        assert V.ndofs == 9 * 9

    def test_periodic_ndofs(self):
        m = StructuredMesh([0, 0], [1, 1], (4, 4), periodic=(True, True))
        V = FunctionSpace(m, QkFEM(1, 2))
        assert V.ndofs == 16

    def test_dg_ndofs(self):
        m = StructuredMesh([0, 0], [1, 1], (3, 3))
        V = FunctionSpace(m, QkDGFEM(1, 2))
        assert V.ndofs == 9 * 4
        assert FunctionSpace(m, P0FEM(2)).ndofs == 9

    def test_shared_dofs_consistent(self):
        m = StructuredMesh([0, 0], [1, 1], (3, 3))
        V = FunctionSpace(m, QkFEM(2, 2))
        # interpolating a smooth function must give single-valued DOFs:
        # reconstruct per-element and compare against direct evaluation
        f = lambda p: np.sin(p[:, 0]) * np.cos(p[:, 1])
        x = np.asarray(V.interpolate(f))
        coords = V.dof_coords()
        assert np.allclose(x, f(coords), atol=1e-12)

    @pytest.mark.parametrize("k", [1, 2, 3])
    def test_interpolation_reproduces_polynomials(self, k):
        m = StructuredMesh([0, 0], [1, 1], (3, 2))
        V = FunctionSpace(m, QkFEM(k, 2))
        f = lambda p: (1 + p[:, 0]) ** k + (0.5 + p[:, 1]) ** k
        x = V.interpolate(f)
        err = float(l2_difference(V, x, f))
        assert err < 1e-12

    def test_boundary_mask(self):
        m = StructuredMesh([0, 0], [1, 1], (4, 4))
        V = FunctionSpace(m, QkFEM(1, 2))
        mask = _leaf_boundary_dof_mask(V)
        assert mask.sum() == 16
        coords = V.dof_coords()
        on_b = (np.isclose(coords, 0) | np.isclose(coords, 1)).any(axis=1)
        assert np.array_equal(mask, on_b)

    def test_composite_lexicographic(self):
        m = StructuredMesh([0, 0], [1, 1], (2, 2))
        V2 = FunctionSpace(m, QkFEM(2, 2))
        V1 = FunctionSpace(m, QkFEM(1, 2))
        TH = CompositeSpace(PowerSpace(V2, 2), V1)
        assert TH.ndofs == 2 * 25 + 9
        maps = TH.leaf_element_dofs()
        assert len(maps) == 3
        assert maps[0].min() == 0
        assert maps[1].min() == 25 and maps[1].max() == 49
        assert maps[2].min() == 50 and maps[2].max() == 58

    def test_power_interleaved(self):
        m = StructuredMesh([0, 0], [1, 1], (2, 2))
        W = VectorSpace(m, QkFEM(1, 2), ordering="interleaved")
        maps = W.leaf_element_dofs()
        assert W.ndofs == 18
        assert set(np.unique(maps[0] % 2)) == {0}
        assert set(np.unique(maps[1] % 2)) == {1}

    def test_composite_interpolate_restrict(self):
        m = StructuredMesh([0, 0], [1, 1], (2, 2))
        V = FunctionSpace(m, QkFEM(1, 2))
        W = CompositeSpace(V, V)
        x = W.interpolate((lambda p: p[:, 0], lambda p: p[:, 1]))
        x0 = W.restrict(x, 0)
        assert np.allclose(np.asarray(x0), V.dof_coords()[:, 0])


class TestConstraints:
    def test_full_dirichlet(self):
        m = StructuredMesh([0, 0], [1, 1], (4, 4))
        V = FunctionSpace(m, QkFEM(1, 2))
        cg = constraints(True, V)
        assert cg.nconstrained == 16

    def test_bctype_selective(self):
        m = StructuredMesh([0, 0], [1, 1], (4, 4))
        V = FunctionSpace(m, QkFEM(1, 2))
        # Dirichlet only on x=0
        cg = constraints(lambda x: np.isclose(x[:, 0], 0.0), V)
        assert cg.nconstrained == 5

    def test_composite_constraints(self):
        m = StructuredMesh([0, 0], [1, 1], (2, 2))
        V2 = FunctionSpace(m, QkFEM(2, 2))
        V1 = FunctionSpace(m, QkFEM(1, 2))
        TH = CompositeSpace(PowerSpace(V2, 2), V1)
        cg = constraints((True, None), TH)
        assert cg.nconstrained == 2 * 16  # velocity boundary nodes only
