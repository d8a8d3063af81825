"""Gmsh MSH 2.x reader (the dune-grid GmshReader analog for the reference
test grids, reference: dune/pdelab/test/grids/*.msh)."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from dune_pdelab_tpu import (
    StructuredMesh, FunctionSpace, GridOperator, constraints,
    StationaryLinearProblemSolver, interpolate_dirichlet,
)
from dune_pdelab_tpu.fe.basis import PkFEM
from dune_pdelab_tpu.mesh.simplex import SimplexMesh
from dune_pdelab_tpu.ops import (
    ConvectionDiffusionProblem, ConvectionDiffusionFEM,
)
from dune_pdelab_tpu.solvers import SEQ_CG_Jacobi
from dune_pdelab_tpu.space.functions import l2_difference

pytestmark = pytest.mark.fast

REF_MSH = "/root/reference/dune/pdelab/test/grids/circ_in_rect.msh"


def _write_msh(path, mesh, cell_tag=7, facet_tag=3):
    """Serialize a 2D SimplexMesh as MSH 2.2 ASCII (for round-tripping)."""
    uniq_f, _, counts = mesh.faces()
    bfaces = uniq_f[counts == 1]
    with open(path, "w") as f:
        f.write("$MeshFormat\n2.2 0 8\n$EndMeshFormat\n$Nodes\n")
        f.write(f"{mesh.nvertices}\n")
        for i, v in enumerate(mesh.vertices):
            f.write(f"{i + 1} {v[0]} {v[1]} 0\n")
        f.write("$EndNodes\n$Elements\n")
        f.write(f"{mesh.nelements + len(bfaces)}\n")
        eid = 1
        for fv in bfaces:
            f.write(f"{eid} 1 2 {facet_tag} 1 {fv[0] + 1} {fv[1] + 1}\n")
            eid += 1
        for c in mesh.cells:
            f.write(f"{eid} 2 2 {cell_tag} 1 {c[0] + 1} {c[1] + 1} "
                    f"{c[2] + 1}\n")
            eid += 1
        f.write("$EndElements\n")


def test_msh_roundtrip(tmp_path):
    m0 = SimplexMesh.from_structured(StructuredMesh([0, 0], [1, 1], (5, 4)))
    p = tmp_path / "m.msh"
    _write_msh(str(p), m0)
    m = SimplexMesh.from_gmsh(str(p))
    assert m.dim == 2 and m.nelements == m0.nelements
    assert m.nvertices == m0.nvertices
    # geometry preserved: total area = 1
    cc = m.element_corner_coords()
    J = np.stack([cc[:, 2] - cc[:, 0], cc[:, 1] - cc[:, 0]], axis=-1)
    assert abs(np.abs(np.linalg.det(J)).sum() / 2.0 - 1.0) < 1e-12
    assert (np.linalg.det(np.stack(
        [cc[:, 2] - cc[:, 0], cc[:, 1] - cc[:, 0]], axis=-1)) > 0).all()
    assert set(m.cell_tags) == {7}
    assert set(m.facet_tags.values()) == {3}
    # boundary classification from face counts
    assert m.boundary_vertex_mask().sum() == 2 * (5 + 4)


def test_msh_solve_poisson(tmp_path):
    """P1 Poisson on a Gmsh-loaded mesh reproduces the analytic solution."""
    m0 = SimplexMesh.from_structured(StructuredMesh([0, 0], [1, 1], (12, 12)))
    p = tmp_path / "m.msh"
    _write_msh(str(p), m0)
    mesh = SimplexMesh.from_gmsh(str(p))

    class P(ConvectionDiffusionProblem):
        def exact(self, q):
            return np.sin(np.pi * q[:, 0]) * np.sin(np.pi * q[:, 1]) + q[:, 0]

        def f(self, x):
            return 2 * np.pi**2 * jnp.sin(np.pi * x[..., 0]) * jnp.sin(
                np.pi * x[..., 1])

        def g(self, x):
            return (jnp.sin(np.pi * x[..., 0]) * jnp.sin(np.pi * x[..., 1])
                    + x[..., 0])

    prob = P()
    V = FunctionSpace(mesh, PkFEM(1, 2))
    cgm = constraints(True, V)
    go = GridOperator(V, ConvectionDiffusionFEM(prob), constraints=cgm)
    x0 = interpolate_dirichlet(
        lambda q: np.asarray(prob.g(jnp.asarray(np.atleast_2d(q)))),
        V, cgm, V.zero())
    x = StationaryLinearProblemSolver(
        go, SEQ_CG_Jacobi(maxiter=5000), reduction=1e-11).apply(x0)
    err = float(l2_difference(V, x, prob.exact))
    assert err < 1.5e-2, err   # ~C h^2 at h = 1/12


@pytest.mark.skipif(not os.path.exists(REF_MSH),
                    reason="reference grids not mounted")
def test_msh_reads_reference_grid():
    """The reference's circ_in_rect.msh (658 nodes, unstructured triangles
    around a circular hole) loads with positive orientation and a closed
    boundary."""
    m = SimplexMesh.from_gmsh(REF_MSH)
    assert m.dim == 2 and m.nvertices == 658 and m.nelements > 0
    cc = m.element_corner_coords()
    J = np.stack([cc[:, 2] - cc[:, 0], cc[:, 1] - cc[:, 0]], axis=-1)
    assert (np.linalg.det(J) > 0).all()
    _, _, counts = m.faces()
    assert set(np.unique(counts)) <= {1, 2}
    # the domain is a 15 x 10 rectangle with a hole: area < 150
    area = np.abs(np.linalg.det(J)).sum() / 2.0
    assert 100.0 < area < 150.0
    # mesh is usable: assemble a Laplacian residual on it
    V = FunctionSpace(m, PkFEM(1, 2))

    class P(ConvectionDiffusionProblem):
        def f(self, x):
            return jnp.ones(x.shape[:-1])

    go = GridOperator(V, ConvectionDiffusionFEM(P()),
                      constraints=constraints(True, V))
    r = go.residual(V.zero())
    assert np.isfinite(np.asarray(r)).all()


def test_native_parser_matches_python():
    """The C++ MSH parser (io/native/msh_reader.cc) produces arrays
    identical to the pure-Python fallback on all reference grids."""
    import numpy as np
    from dune_pdelab_tpu.io import msh_native

    if not msh_native.available():
        pytest.skip("no native toolchain")
    for p in (REF_MSH,
              REF_MSH.replace("circ_in_rect", "ldomain"),
              REF_MSH.replace("circ_in_rect", "cube1045")):
        a = msh_native.parse_msh(p)
        b = SimplexMesh._parse_msh_py(p)
        for x, y in zip(a, b):
            assert np.array_equal(np.asarray(x),
                                  np.asarray(y).reshape(np.shape(x))), p
