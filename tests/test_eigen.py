"""Device-side LOBPCG (linalg/eigen.py): generalized eigenpairs vs a
dense scipy oracle and the analytic Dirichlet-Laplacian spectrum.
Reference analog: the ARPACK workflow of geneo/arpackpp_geneo.hh and the
stored-eigenvalue oracle of testelectrodynamic.cc."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import scipy.linalg

import dune_pdelab_tpu as pt
from dune_pdelab_tpu.ops import (
    ConvectionDiffusionProblem, ConvectionDiffusionFEM,
)
from dune_pdelab_tpu.ops.l2 import L2
from dune_pdelab_tpu.linalg.eigen import lobpcg

pytestmark = pytest.mark.fast


class _Lap(ConvectionDiffusionProblem):
    def f(self, x):
        return jnp.zeros(x.shape[:-1], x.dtype)


def _ops(n):
    mesh = pt.StructuredMesh([0, 0], [1, 1], (n, n))
    V = pt.FunctionSpace(mesh, pt.QkFEM(1, 2))
    cons = pt.constraints(True, V)
    goA = pt.GridOperator(V, ConvectionDiffusionFEM(_Lap()),
                          constraints=cons)
    goB = pt.GridOperator(V, L2(), constraints=cons)
    z = V.zero()
    m = cons.mask
    big = 1e6
    A = lambda v: jnp.where(m, big * v, goA.jacobian_apply(z, v))
    B = lambda v: jnp.where(m, v, goB.jacobian_apply(z, v))
    M = lambda r: r / jnp.where(m, big, goA.jacobian_diagonal(z))
    return V, A, B, M


def test_lobpcg_matches_dense_generalized():
    """k=4 smallest generalized eigenpairs == scipy.linalg.eigh(A, B) on
    the materialized operators, to 1e-8 relative."""
    V, A, B, M = _ops(10)
    n = V.ndofs
    I = np.eye(n)
    Ad = np.column_stack([np.asarray(A(jnp.asarray(I[:, j])))
                          for j in range(n)])
    Bd = np.column_stack([np.asarray(B(jnp.asarray(I[:, j])))
                          for j in range(n)])
    w = scipy.linalg.eigh(Ad, Bd, eigvals_only=True)
    res = lobpcg(A, k=4, n=n, B=B, M=M, tol=1e-10, maxiter=400)
    rel = np.abs(np.asarray(res.eigenvalues) - w[:4]) / w[:4]
    assert np.all(rel < 1e-8), (res.eigenvalues, w[:4])
    # eigenvectors are B-orthonormal
    X = np.asarray(res.eigenvectors)
    G = X.T @ np.asarray(jax.vmap(B, 1, 1)(jnp.asarray(X)))
    assert np.abs(G - np.eye(4)).max() < 1e-7


def test_lobpcg_dirichlet_laplacian_spectrum():
    """Matrix-free stiffness/mass: smallest eigenvalues approach
    pi^2 (m^2+n^2) = pi^2 {2, 5, 5, 8} at O(h^2)."""
    V, A, B, M = _ops(20)
    res = lobpcg(A, k=4, n=V.ndofs, B=B, M=M, tol=1e-6, maxiter=300)
    lam = np.asarray(res.eigenvalues) / np.pi**2
    exact = np.array([2.0, 5.0, 5.0, 8.0])
    assert np.all(np.abs(lam - exact) / exact < 0.02), lam
    assert np.all(np.asarray(res.residual_norms) < 1e-4)
