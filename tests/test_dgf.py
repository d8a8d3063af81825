"""DGF reader (reference fixture format, dune/pdelab/test/grids/*.dgf):
Interval and Vertex+Simplex blocks, plus an end-to-end solve with adaptive
bisection on the reference's re-entrant corner mesh."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from dune_pdelab_tpu import (
    StructuredMesh, FunctionSpace, GridOperator, constraints,
    StationaryLinearProblemSolver, interpolate_dirichlet,
)
from dune_pdelab_tpu.adaptivity.adaptivity import error_fraction, mark_elements
from dune_pdelab_tpu.adaptivity.local import (
    adapt_local_simplex, p1_edge_jump_indicator,
)
from dune_pdelab_tpu.fe.basis import PkFEM
from dune_pdelab_tpu.io import read_dgf
from dune_pdelab_tpu.mesh.simplex import SimplexMesh
from dune_pdelab_tpu.ops import (
    ConvectionDiffusionProblem, ConvectionDiffusionFEM,
)
from dune_pdelab_tpu.solvers import SEQ_CG_Jacobi
from dune_pdelab_tpu.space.functions import l2_difference

pytestmark = pytest.mark.fast

GRIDS = "/root/reference/dune/pdelab/test/grids"
needs_grids = pytest.mark.skipif(not os.path.isdir(GRIDS),
                                 reason="reference grids not mounted")


def test_dgf_interval_block(tmp_path):
    p = tmp_path / "box.dgf"
    p.write_text("DGF\nInterval\n0 0\n2 1\n8 4\n#\n")
    m = read_dgf(str(p))
    assert isinstance(m, StructuredMesh)
    assert tuple(m.cells) == (8, 4)
    assert np.allclose(m.upper, [2, 1])
    # with an empty simplex block: triangulated
    p2 = tmp_path / "boxs.dgf"
    p2.write_text("DGF\nInterval\n0 0\n2 1\n8 4\n#\nSimplex\n#\n")
    m2 = read_dgf(str(p2))
    assert isinstance(m2, SimplexMesh) and m2.nelements == 2 * 8 * 4


@needs_grids
def test_dgf_reads_reference_brick():
    m = read_dgf(f"{GRIDS}/brick.dgf")
    assert m.dim == 3 and m.nelements == 5 * 8 * 13 * 6


@needs_grids
def test_dgf_reentrant_corner_adaptive_solve():
    """The reference's re-entrant corner domain (2dreentrantcorner.dgf, a
    3/4-disc sector) with the matching r^(2/3) singular solution: solve,
    then one bisection-adapt round reduces the error."""
    mesh = read_dgf(f"{GRIDS}/2dreentrantcorner.dgf")
    assert isinstance(mesh, SimplexMesh)
    mesh = mesh.oriented_for_bisection()

    def u_exact(p):
        r = np.hypot(p[:, 0], p[:, 1])
        # the sector spans theta in [0, 3 pi / 2] from the positive x-axis
        th = np.mod(np.arctan2(p[:, 1], p[:, 0]), 2 * np.pi)
        return np.where(r == 0, 0.0, r ** (2 / 3) * np.sin(2 * th / 3))

    class Corner(ConvectionDiffusionProblem):
        def f(self, x):
            return jnp.zeros(x.shape[:-1])

        def g(self, x):
            return jnp.asarray(u_exact(np.atleast_2d(np.asarray(x))))

    def solve(V):
        cgm = constraints(True, V)
        go = GridOperator(V, ConvectionDiffusionFEM(Corner()),
                          constraints=cgm)
        x0 = interpolate_dirichlet(lambda q: u_exact(np.atleast_2d(q)),
                                   V, cgm, V.zero())
        return StationaryLinearProblemSolver(
            go, SEQ_CG_Jacobi(maxiter=20000), reduction=1e-12).apply(x0)

    V = FunctionSpace(mesh, PkFEM(1, 2))
    x = solve(V)
    e0 = float(l2_difference(V, x, u_exact))
    for _ in range(3):
        eta2 = p1_edge_jump_indicator(V, x)
        marks, _ = mark_elements(eta2, error_fraction(eta2, 0.5))
        V, x = adapt_local_simplex(V, x, marks)
        x = solve(V)
    e1 = float(l2_difference(V, x, u_exact))
    assert e1 < 0.6 * e0, (e0, e1)
