"""Mimetic finite differences: face-centered element + diffusion operator
(reference slot: dune/pdelab/finiteelementmap/mimeticfem.hh; scheme =
lowest-order mimetic/hybrid-FV consistency + stabilization). Oracles: exact
patch test for affine solutions, order-2 convergence, SPD operator."""
import numpy as np
import jax.numpy as jnp
import pytest

from dune_pdelab_tpu import (
    StructuredMesh, FunctionSpace, GridOperator, constraints,
    StationaryLinearProblemSolver, interpolate_dirichlet,
)
from dune_pdelab_tpu.fe.mimetic import MimeticFEM, DiffusionMFD
from dune_pdelab_tpu.ops import ConvectionDiffusionProblem
from dune_pdelab_tpu.solvers import SEQ_CG_Jacobi
from dune_pdelab_tpu.space.functions import l2_difference

pytestmark = pytest.mark.fast


class LinearProblem(ConvectionDiffusionProblem):
    def f(self, x):
        return jnp.zeros(x.shape[:-1])


class SinProblem(ConvectionDiffusionProblem):
    def exact(self, p):
        return np.sin(np.pi * p[:, 0]) * np.sin(np.pi * p[:, 1]) + p[:, 0]

    def f(self, x):
        return 2 * np.pi**2 * jnp.sin(np.pi * x[..., 0]) * jnp.sin(
            np.pi * x[..., 1])

    def g(self, x):
        return (jnp.sin(np.pi * x[..., 0]) * jnp.sin(np.pi * x[..., 1])
                + x[..., 0])


def test_element_partition_of_unity_and_linears():
    for dim in (2, 3):
        el = MimeticFEM(dim)
        pts = np.random.default_rng(0).uniform(0, 1, (10, dim))
        vals, grads = el.tabulate(pts)
        assert np.allclose(vals.sum(axis=1), 1.0)
        # reproduces affine u from face-centroid values
        a = np.arange(1, dim + 1, dtype=float)
        u_f = 3.0 + el.nodes @ a
        assert np.allclose(vals @ u_f, 3.0 + pts @ a)
        assert np.allclose(np.einsum("pbd,b->pd", grads, u_f),
                           np.broadcast_to(a, (10, dim)))


def test_patch_test_exact():
    """Mimetic diffusion reproduces affine solutions exactly (the defining
    property of the consistency + stabilization construction)."""
    mesh = StructuredMesh([0, 0], [1, 1], (7, 5))
    V = FunctionSpace(mesh, MimeticFEM(2))
    cgm = constraints(True, V)
    go = GridOperator(V, DiffusionMFD(LinearProblem()), constraints=cgm)
    gfun = lambda q: 1.0 + 2.0 * np.atleast_2d(q)[:, 0] - np.atleast_2d(q)[:, 1]
    x0 = interpolate_dirichlet(gfun, V, cgm, V.zero())
    x = StationaryLinearProblemSolver(
        go, SEQ_CG_Jacobi(maxiter=5000), reduction=1e-13).apply(x0)
    assert float(jnp.max(jnp.abs(x - V.interpolate(gfun)))) < 1e-10


def test_mimetic_convergence_order2():
    p = SinProblem()
    errs = []
    for n in (8, 16):
        mesh = StructuredMesh([0, 0], [1, 1], (n, n))
        V = FunctionSpace(mesh, MimeticFEM(2))
        cgm = constraints(True, V)
        go = GridOperator(V, DiffusionMFD(p), constraints=cgm)
        x0 = interpolate_dirichlet(
            lambda q: np.asarray(p.g(jnp.asarray(np.atleast_2d(q)))),
            V, cgm, V.zero())
        x = StationaryLinearProblemSolver(
            go, SEQ_CG_Jacobi(maxiter=20000), reduction=1e-13).apply(x0)
        errs.append(float(l2_difference(V, x, p.exact)))
    order = np.log2(errs[0] / errs[1])
    assert order > 1.8, (errs, order)


def test_mimetic_operator_spd_3d():
    mesh = StructuredMesh([0, 0, 0], [1, 1, 1], (3, 3, 3))
    V = FunctionSpace(mesh, MimeticFEM(3))
    go = GridOperator(V, DiffusionMFD(LinearProblem()))
    A = np.asarray(go.jacobian(V.zero()).todense())
    assert np.allclose(A, A.T, atol=1e-10)
    eig = np.linalg.eigvalsh(A)
    # singular only in the constant mode (pure Neumann-like, no constraints)
    assert eig[0] > -1e-9 and eig[1] > 1e-9 if len(eig) > 1 else True
