"""Skeleton (two-sided) face integrals on MAPPED (multilinear) cube
meshes — the last geometry-wrapper restriction (round-4 VERDICT item 7:
assembly/geometry.py raised on mapped skeleton faces; the reference's
IntersectionGeometry is geometry-general, common/geometrywrapper.hh:119 ff,
consumed by localoperator/convectiondiffusiondg.hh:271).

Identity-map parity pins the arithmetic; SIPG on the quarter annulus pins
the curved-geometry convergence order."""
import numpy as np
import jax.numpy as jnp
import pytest

from dune_pdelab_tpu import StructuredMesh, FunctionSpace, GridOperator
from dune_pdelab_tpu.fe import QkDGFEM
from dune_pdelab_tpu.ops import ConvectionDiffusionProblem
from dune_pdelab_tpu.ops.convectiondiffusiondg import (
    ConvectionDiffusionDG, DGMethod,
)
from dune_pdelab_tpu.solvers import (
    StationaryLinearProblemSolver, SEQ_BCGS_Jacobi,
)
from dune_pdelab_tpu.space.functions import l2_difference

from tests.test_mapped import annulus, identity_mapped, Harmonic

pytestmark = pytest.mark.fast


def test_mapped_skeleton_matches_uniform_on_identity_map():
    """DG residual/jacobian-apply parity: mapped mesh whose coords ARE the
    uniform lattice must reproduce the uniform skeleton fast path."""
    uni, mapped = identity_mapped(6)
    p = Harmonic()
    rng = np.random.default_rng(0)
    for mesh_u, mesh_m in ((uni, mapped),):
        Vu = FunctionSpace(mesh_u, QkDGFEM(1, 2))
        Vm = FunctionSpace(mesh_m, QkDGFEM(1, 2))
        gou = GridOperator(Vu, ConvectionDiffusionDG(p))
        gom = GridOperator(Vm, ConvectionDiffusionDG(p))
        x = jnp.asarray(rng.standard_normal(Vu.ndofs))
        ru = np.asarray(gou.residual(x))
        rm = np.asarray(gom.residual(x))
        np.testing.assert_allclose(rm, ru, rtol=1e-9, atol=1e-10)
        z = jnp.asarray(rng.standard_normal(Vu.ndofs))
        np.testing.assert_allclose(
            np.asarray(gom.jacobian_apply(x, z)),
            np.asarray(gou.jacobian_apply(x, z)), rtol=1e-9, atol=1e-10)


def _solve_dg_annulus(n, k=1):
    mesh = annulus(n)
    V = FunctionSpace(mesh, QkDGFEM(k, 2))
    go = GridOperator(V, ConvectionDiffusionDG(Harmonic()))
    slp = StationaryLinearProblemSolver(go, SEQ_BCGS_Jacobi(maxiter=20000),
                                        reduction=1e-11, verbose=0)
    x = slp.apply(V.zero())
    assert slp.result.converged
    return float(l2_difference(V, x, Harmonic().exact))


def test_sipg_curved_mesh_converges_h2():
    """SIPG Q1-DG on the quarter annulus: optimal O(h^2) L2 rate against
    the harmonic exact solution (matches the curved-simplex result)."""
    errs = [_solve_dg_annulus(n) for n in (4, 8, 16)]
    orders = [np.log2(errs[i] / errs[i + 1]) for i in range(2)]
    assert orders[-1] > 1.8, (errs, orders)


def test_sipg_curved_linear_patch():
    """A globally linear solution lies in the mapped Q1-DG space (the
    multilinear pullback of a linear field is bilinear — but DG penalty
    terms vanish only if jumps vanish, which they do for the conforming
    interpolant): SIPG must reproduce it to solver tolerance."""

    class Lin(ConvectionDiffusionProblem):
        def exact(self, p):
            return 2 * p[:, 0] - 3 * p[:, 1] + 1

        def f(self, x):
            return jnp.zeros(x.shape[:-1])

        def g(self, x):
            return 2 * x[..., 0] - 3 * x[..., 1] + 1

    mesh = annulus(4)
    V = FunctionSpace(mesh, QkDGFEM(2, 2))
    go = GridOperator(V, ConvectionDiffusionDG(Lin()))
    slp = StationaryLinearProblemSolver(go, SEQ_BCGS_Jacobi(maxiter=20000),
                                        reduction=1e-12, verbose=0)
    x = slp.apply(V.zero())
    err = float(l2_difference(V, x, Lin().exact))
    assert err < 1e-8, err
