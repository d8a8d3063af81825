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


# ---------------------------------------------------------------------------
# Face integrals on simplex meshes (round 2): DG + Neumann
# ---------------------------------------------------------------------------

def test_face_lists_consistency():
    """Interior + boundary face counts satisfy 3E = 2*I + B (2D) and each
    interior face pair shares the same sorted vertex set."""
    sm = SimplexMesh.from_structured(StructuredMesh([0, 0], [1, 1], (4, 4)))
    itf = sm.interior_faces()
    bf = sm.boundary_faces()
    ni, nb = len(itf["inside"]), len(bf["element"])
    assert 3 * sm.nelements == 2 * ni + nb
    d = sm.dim
    locs = [[v for v in range(d + 1) if v != l] for l in range(d + 1)]
    for j in range(min(ni, 10)):
        vi = np.sort(sm.cells[itf["inside"][j]][locs[itf["face_in"][j]]])
        vo = np.sort(sm.cells[itf["outside"][j]][locs[itf["face_out"][j]]])
        assert np.array_equal(vi, vo)


def test_face_lists_3d():
    sm = SimplexMesh.from_structured(StructuredMesh([0, 0, 0], [1, 1, 1],
                                                    (2, 2, 2)))
    itf = sm.interior_faces()
    bf = sm.boundary_faces()
    assert 4 * sm.nelements == 2 * len(itf["inside"]) + len(bf["element"])


def test_simplex_sipg_linear_patch():
    """A linear exact solution lies in P1DG: SIPG reproduces it exactly on a
    triangulated square (consistency of all simplex face terms: normals,
    measures, penalties, both-side embeddings)."""
    from dune_pdelab_tpu.fe import PkDGFEM
    from dune_pdelab_tpu.ops.convectiondiffusiondg import (
        ConvectionDiffusionDG, DGMethod,
    )
    from dune_pdelab_tpu.solvers import SEQ_BCGS_Jacobi

    class Lin(ConvectionDiffusionProblem):
        def exact(self, p):
            return 2 * p[:, 0] - 3 * p[:, 1] + 1

        def f(self, x):
            return jnp.zeros(x.shape[:-1])

        def g(self, x):
            return 2 * x[..., 0] - 3 * x[..., 1] + 1

    p = Lin()
    sm = SimplexMesh.from_structured(StructuredMesh([0, 0], [1, 1], (4, 4)))
    V = FunctionSpace(sm, PkDGFEM(1, 2))
    go = GridOperator(V, ConvectionDiffusionDG(p, method=DGMethod.SIPG))
    slp = StationaryLinearProblemSolver(
        go, SEQ_BCGS_Jacobi(maxiter=20000), reduction=1e-12, verbose=0)
    x = slp.apply(V.zero())
    assert slp.result.converged
    err = float(l2_difference(V, x, p.exact))
    assert err < 1e-9, err


@pytest.mark.parametrize("k,min_order", [(1, 1.7), (2, 2.7)])
def test_simplex_sipg_convergence(k, min_order):
    """SIPG PkDG on triangulated squares converges at order k+1
    (testconvectiondiffusiondg analog on simplices)."""
    from dune_pdelab_tpu.fe import PkDGFEM
    from dune_pdelab_tpu.ops.convectiondiffusiondg import (
        ConvectionDiffusionDG, DGMethod,
    )
    from dune_pdelab_tpu.solvers import SEQ_BCGS_Jacobi

    p = P()
    errs = []
    for n in (8, 16):
        sm = SimplexMesh.from_structured(
            StructuredMesh([0, 0], [1, 1], (n, n)))
        V = FunctionSpace(sm, PkDGFEM(k, 2))
        go = GridOperator(V, ConvectionDiffusionDG(p, method=DGMethod.SIPG))
        slp = StationaryLinearProblemSolver(
            go, SEQ_BCGS_Jacobi(maxiter=40000), reduction=1e-11, verbose=0)
        x = slp.apply(V.zero())
        assert slp.result.converged
        errs.append(float(l2_difference(V, x, p.exact)))
    order = np.log2(errs[0] / errs[1])
    assert order > min_order, (errs, order)


def test_simplex_neumann_boundary():
    """Mixed Dirichlet/Neumann CG Poisson on a triangulated square: exact
    solution u = x^2 + y with Neumann flux on the x=1 edge."""
    class PN(ConvectionDiffusionProblem):
        def exact(self, p):
            return p[:, 0] ** 2 + p[:, 1]

        def f(self, x):
            return -2.0 * jnp.ones(x.shape[:-1])

        def bctype(self, x):
            # Dirichlet wins on the Neumann-edge closure (corner vertices),
            # the reference's conforming-constraints convention
            from dune_pdelab_tpu.ops.convectiondiffusion import BCType
            neumann = ((x[..., 0] > 1 - 1e-9)
                       & (x[..., 1] > 1e-9) & (x[..., 1] < 1 - 1e-9))
            return jnp.where(neumann, BCType.NEUMANN, BCType.DIRICHLET)

        def g(self, x):
            return x[..., 0] ** 2 + x[..., 1]

        def j(self, x):
            # -grad u . n on x=1: -(2x) * 1 = -2
            return -2.0 * jnp.ones(x.shape[:-1])

    p = PN()
    errs = []
    for n in (8, 16):
        sm = SimplexMesh.from_structured(
            StructuredMesh([0, 0], [1, 1], (n, n)))
        V = FunctionSpace(sm, PkFEM(2, 2))
        cg_ = constraints(p.dirichlet_bctype(), V)
        go = GridOperator(V, ConvectionDiffusionFEM(p), constraints=cg_)
        x0 = interpolate_dirichlet(
            lambda q: np.asarray(p.g(jnp.asarray(q))), V, cg_, V.zero())
        slp = StationaryLinearProblemSolver(
            go, SEQ_CG_Jacobi(maxiter=20000), reduction=1e-12, verbose=0)
        x = slp.apply(x0)
        assert slp.result.converged
        errs.append(float(l2_difference(V, x, p.exact)))
    # u is in P2: reproduced to solver tolerance
    assert errs[-1] < 1e-8, errs


def test_simplex3d_sipg_linear_patch():
    """3D tets: SIPG reproduces a linear solution exactly (validates the
    3D simplex face machinery: triangle face quadrature, cross-product
    normals/measures, per-face gradients)."""
    from dune_pdelab_tpu.fe import PkDGFEM
    from dune_pdelab_tpu.ops.convectiondiffusiondg import (
        ConvectionDiffusionDG, DGMethod,
    )
    from dune_pdelab_tpu.solvers import SEQ_BCGS_Jacobi

    class Lin(ConvectionDiffusionProblem):
        def exact(self, p):
            return p[:, 0] - 2 * p[:, 1] + 3 * p[:, 2] + 1

        def f(self, x):
            return jnp.zeros(x.shape[:-1])

        def g(self, x):
            return x[..., 0] - 2 * x[..., 1] + 3 * x[..., 2] + 1

    p = Lin()
    sm = SimplexMesh.from_structured(StructuredMesh([0, 0, 0], [1, 1, 1],
                                                    (2, 2, 2)))
    V = FunctionSpace(sm, PkDGFEM(1, 3))
    go = GridOperator(V, ConvectionDiffusionDG(p, method=DGMethod.SIPG))
    slp = StationaryLinearProblemSolver(
        go, SEQ_BCGS_Jacobi(maxiter=40000), reduction=1e-12, verbose=0)
    x = slp.apply(V.zero())
    assert slp.result.converged
    err = float(l2_difference(V, x, p.exact))
    assert err < 1e-8, err
