"""FEM conformity sweep: every finite element family instantiated through a
FunctionSpace, checked for its defining reproduction property (the
reference's fem-with-gfs conformity suite, reference:
dune/pdelab/test/fem/testfemwithgfs.cc — every FiniteElementMap is run
through a GridFunctionSpace)."""
import numpy as np
import jax.numpy as jnp
import pytest

from dune_pdelab_tpu import StructuredMesh, FunctionSpace
from dune_pdelab_tpu.fe import (
    QkFEM, QkDGFEM, PkFEM, PkDGFEM, P0FEM, LegendreDGFEM,
    RannacherTurekFEM, MonomialDGFEM, OPBFEM,
)
from dune_pdelab_tpu.fe.hdiv import (
    RT0Cube, BDM1Cube, RT0Simplex2D, RT0Simplex3D, BDM1Simplex2D,
    RT1Simplex2D, RTkCube2D, RTkCube3D,
)
from dune_pdelab_tpu.fe.hcurl import N0Cube, N0Simplex
from dune_pdelab_tpu.fe.mimetic import MimeticFEM
from dune_pdelab_tpu.mesh.simplex import SimplexMesh
from dune_pdelab_tpu.space.functions import l2_difference

pytestmark = pytest.mark.fast


def _mesh(geometry, dim, n=3):
    sm = StructuredMesh([0] * dim, [1] * dim, (n,) * dim)
    if geometry == "simplex":
        return SimplexMesh.from_structured(sm)
    return sm


SCALAR_FEMS = [
    # (factory, dim, geometry)
    (lambda: QkFEM(1, 2), 2, "cube"),
    (lambda: QkFEM(2, 2), 2, "cube"),
    (lambda: QkFEM(3, 2), 2, "cube"),
    (lambda: QkFEM(1, 3), 3, "cube"),
    (lambda: QkFEM(2, 3), 3, "cube"),
    (lambda: QkDGFEM(1, 2), 2, "cube"),
    (lambda: QkDGFEM(2, 2, "gl"), 2, "cube"),
    (lambda: QkDGFEM(2, 2, "lobatto"), 2, "cube"),
    (lambda: LegendreDGFEM(2, 2), 2, "cube"),
    (lambda: MonomialDGFEM(2, 2), 2, "cube"),
    (lambda: OPBFEM(2, 2), 2, "cube"),
    (lambda: MonomialDGFEM(1, 2, geometry="simplex"), 2, "simplex"),
    (lambda: OPBFEM(2, 2, geometry="simplex"), 2, "simplex"),
    (lambda: P0FEM(2), 2, "cube"),
    (lambda: RannacherTurekFEM(2), 2, "cube"),
    (lambda: PkFEM(1, 2), 2, "simplex"),
    (lambda: PkFEM(2, 2), 2, "simplex"),
    (lambda: PkFEM(3, 2), 2, "simplex"),
    (lambda: PkFEM(4, 2), 2, "simplex"),
    (lambda: PkFEM(1, 3), 3, "simplex"),
    (lambda: PkFEM(2, 3), 3, "simplex"),
    (lambda: PkFEM(3, 3), 3, "simplex"),
    (lambda: PkDGFEM(1, 2), 2, "simplex"),
    (lambda: PkDGFEM(2, 2), 2, "simplex"),
    (lambda: MimeticFEM(2), 2, "cube"),
    (lambda: MimeticFEM(3), 3, "cube"),
]


@pytest.mark.parametrize("i", range(len(SCALAR_FEMS)))
def test_scalar_fem_reproduces_linears(i):
    """Every scalar element reproduces affine functions through
    space.interpolate (P0 reproduces constants)."""
    make, dim, geometry = SCALAR_FEMS[i]
    fem = make()
    V = FunctionSpace(_mesh(geometry, dim), fem)
    if fem.degree == 0:
        f = lambda p: np.full(len(np.atleast_2d(p)), 3.0)
    else:
        f = lambda p: 1.0 + np.atleast_2d(p) @ np.arange(1, dim + 1)
    x = V.interpolate(lambda q: np.asarray(f(q), dtype=np.float64))
    err = float(l2_difference(V, x, lambda p: np.asarray(f(p))))
    assert err < 1e-10, (fem, err)


VECTOR_FEMS = [
    (lambda: RT0Cube(2), 2, "cube"),
    (lambda: RT0Cube(3), 3, "cube"),
    (lambda: BDM1Cube(2), 2, "cube"),
    (lambda: RTkCube2D(1), 2, "cube"),
    (lambda: RTkCube2D(2), 2, "cube"),
    (lambda: RT0Simplex2D(), 2, "simplex"),
    (lambda: RT0Simplex3D(), 3, "simplex"),
    (lambda: BDM1Simplex2D(), 2, "simplex"),
    (lambda: RT1Simplex2D(), 2, "simplex"),
    (lambda: N0Cube(2), 2, "cube"),
    (lambda: N0Cube(3), 3, "cube"),
    (lambda: RTkCube3D(1), 3, "cube"),
    (lambda: N0Simplex(2), 2, "simplex"),
    (lambda: N0Simplex(3), 3, "simplex"),
]


@pytest.mark.parametrize("i", range(len(VECTOR_FEMS)))
def test_vector_fem_space_builds(i):
    """Every vector element builds a conforming space with a consistent DOF
    map (max index + 1 == ndofs, every DOF referenced)."""
    make, dim, geometry = VECTOR_FEMS[i]
    fem = make()
    V = FunctionSpace(_mesh(geometry, dim), fem)
    ed = np.asarray(V.element_dofs)
    assert ed.min() == 0 and ed.max() == V.ndofs - 1
    assert len(np.unique(ed)) == V.ndofs
    assert ed.shape == (V.mesh.nelements, fem.nbasis)
