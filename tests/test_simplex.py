"""Simplex mesh + Pk conforming space tests (unstructured-grid analog,
reference: dune/pdelab/test/gridexamples.hh triangulated domains +
testpk2dinterpolation.cc): P1/P2 Poisson convergence on triangulated
squares, entity list sanity."""
import numpy as np
import jax.numpy as jnp
import pytest

from dune_pdelab_tpu import (
    StructuredMesh, FunctionSpace, GridOperator, constraints,
    StationaryLinearProblemSolver, interpolate_dirichlet,
)
from dune_pdelab_tpu.mesh import SimplexMesh
from dune_pdelab_tpu.fe import PkFEM
from dune_pdelab_tpu.ops import ConvectionDiffusionProblem, ConvectionDiffusionFEM
from dune_pdelab_tpu.solvers import SEQ_CG_Jacobi
from dune_pdelab_tpu.space.functions import l2_difference


def test_triangulation_counts():
    sm = SimplexMesh.from_structured(StructuredMesh([0, 0], [1, 1], (3, 3)))
    assert sm.nelements == 18 and sm.nvertices == 16
    uniq, cell_edges = sm.edges()
    # Euler: V - E + F = 1 for planar triangulation of a disk-like domain
    assert sm.nvertices - len(uniq) + sm.nelements == 1
    # triangulated volume sums to 1
    cc = sm.element_corner_coords()
    a = cc[:, 1] - cc[:, 0]
    b = cc[:, 2] - cc[:, 0]
    area = 0.5 * np.abs(a[:, 0] * b[:, 1] - a[:, 1] * b[:, 0])
    assert np.isclose(area.sum(), 1.0)


def test_tet_triangulation_volume():
    sm = SimplexMesh.from_structured(StructuredMesh([0, 0, 0], [1, 1, 1],
                                                    (2, 2, 2)))
    assert sm.nelements == 48
    cc = sm.element_corner_coords()
    J = cc[:, 1:] - cc[:, :1]
    vol = np.abs(np.linalg.det(J)) / 6.0
    assert np.isclose(vol.sum(), 1.0)


class P(ConvectionDiffusionProblem):
    def exact(self, p):
        return np.sin(np.pi * p[:, 0]) * np.cos(2 * np.pi * p[:, 1]) + p[:, 0]

    def f(self, x):
        return 5 * np.pi**2 * jnp.sin(np.pi * x[..., 0]) * jnp.cos(
            2 * np.pi * x[..., 1])

    def g(self, x):
        return jnp.sin(np.pi * x[..., 0]) * jnp.cos(2 * np.pi * x[..., 1]) \
            + x[..., 0]


def _solve(n, k):
    p = P()
    sm = SimplexMesh.from_structured(StructuredMesh([0, 0], [1, 1], (n, n)))
    V = FunctionSpace(sm, PkFEM(k, 2))
    cg_ = constraints(p.dirichlet_bctype(), V)
    go = GridOperator(V, ConvectionDiffusionFEM(p), constraints=cg_,
                      skip_boundary=True)
    x0 = interpolate_dirichlet(
        lambda q: np.asarray(p.g(jnp.asarray(q))), V, cg_, V.zero())
    x = StationaryLinearProblemSolver(go, SEQ_CG_Jacobi(), reduction=1e-12,
                                      verbose=0).apply(x0)
    return V, x, p


@pytest.mark.parametrize("k,order", [(1, 2.0), (2, 3.0)])
def test_pk_poisson_convergence(k, order):
    errs = []
    for n in (8, 16, 32):
        V, x, p = _solve(n, k)
        errs.append(float(l2_difference(V, x, p.exact)))
    orders = [np.log2(errs[i] / errs[i + 1]) for i in range(2)]
    assert orders[-1] > order - 0.2, (errs, orders)


def test_p2_shared_edge_dofs_consistent():
    """Interpolation into P2 is single-valued on shared edges: interpolating
    a quadratic reproduces it exactly."""
    sm = SimplexMesh.from_structured(StructuredMesh([0, 0], [1, 1], (4, 4)))
    V = FunctionSpace(sm, PkFEM(2, 2))
    f = lambda q: (q[:, 0] - 0.3) ** 2 + q[:, 0] * q[:, 1]
    x = V.interpolate(f)
    assert float(l2_difference(V, x, f)) < 1e-12
