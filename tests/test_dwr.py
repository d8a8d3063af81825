"""Goal-oriented (dual-weighted-residual) error estimation
(adaptivity/dwr.py + GridOperator.weighted_element_residuals):
localization identity, effectivity near 1, and the DG skeleton path."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import dune_pdelab_tpu as pt
from dune_pdelab_tpu.ops import (
    ConvectionDiffusionProblem, ConvectionDiffusionFEM,
)
from dune_pdelab_tpu.ops.convectiondiffusiondg import ConvectionDiffusionDG
from dune_pdelab_tpu.ops.l2 import L2
from dune_pdelab_tpu.fe import QkDGFEM
from dune_pdelab_tpu.linalg import cg
from dune_pdelab_tpu.adaptivity import dwr_indicators, space_transfer

pytestmark = pytest.mark.fast


class _P(ConvectionDiffusionProblem):
    def exact(self, p):
        return np.sin(np.pi * p[:, 0]) * np.sin(np.pi * p[:, 1])

    def f(self, x):
        return (2 * np.pi**2 * jnp.sin(np.pi * x[..., 0])
                * jnp.sin(np.pi * x[..., 1]))


def test_localization_identity_cg():
    """sum_K eta_K == w^T r(x) exactly (random state, random weight)."""
    mesh = pt.StructuredMesh([0, 0], [1, 1], (7, 6))
    V = pt.FunctionSpace(mesh, pt.QkFEM(2, 2))
    co = pt.constraints(True, V)
    go = pt.GridOperator(V, ConvectionDiffusionFEM(_P()), constraints=co)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(V.ndofs))
    w = jnp.asarray(rng.standard_normal(V.ndofs))
    eta = go.weighted_element_residuals(x, w)
    assert eta.shape == (mesh.nelements,)
    lhs = float(jnp.sum(eta))
    rhs = float(jnp.dot(jnp.where(co.mask, 0.0, w), go.residual(x)))
    assert abs(lhs - rhs) < 1e-11 * max(1.0, abs(rhs)), (lhs, rhs)


def test_localization_identity_dg_skeleton():
    """Same identity through the SIPG skeleton + boundary kernels."""
    mesh = pt.StructuredMesh([0, 0, 0], [1, 1, 1], (3, 4, 3))
    V = pt.FunctionSpace(mesh, QkDGFEM(1, 3))
    go = pt.GridOperator(V, ConvectionDiffusionDG(_P()))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(V.ndofs))
    w = jnp.asarray(rng.standard_normal(V.ndofs))
    lhs = float(jnp.sum(go.weighted_element_residuals(x, w)))
    rhs = float(jnp.dot(w, go.residual(x)))
    assert abs(lhs - rhs) < 1e-11 * max(1.0, abs(rhs)), (lhs, rhs)


def test_dwr_effectivity_mean_value_goal():
    """Poisson, goal J(u) = int u: the DWR estimate with a Q2 dual on a
    Q1 primal reproduces the true goal error (effectivity in [0.9, 1.1]),
    and indicators are nonnegative with the exact signed sum."""
    mesh = pt.StructuredMesh([0, 0], [1, 1], (12, 12))
    V = pt.FunctionSpace(mesh, pt.QkFEM(1, 2))
    Vr = pt.FunctionSpace(mesh, pt.QkFEM(2, 2))
    go = pt.GridOperator(V, ConvectionDiffusionFEM(_P()),
                         constraints=pt.constraints(True, V))
    gor = pt.GridOperator(Vr, ConvectionDiffusionFEM(_P()),
                          constraints=pt.constraints(True, Vr))
    x0 = V.zero()
    z, _ = cg(lambda p: go.jacobian_apply(x0, p), go.residual(x0),
              tol=1e-13, maxiter=2000)
    x = x0 - z

    q = pt.GridOperator(Vr, L2()).jacobian_apply(Vr.zero(),
                                                 jnp.ones(Vr.ndofs))
    goal = lambda u: jnp.dot(q, u)

    eta, est = dwr_indicators(go, gor, x, goal)
    J_exact = (2 / np.pi) ** 2
    J_h = float(goal(space_transfer(V, Vr)(x)))
    true_err = J_exact - J_h
    effectivity = est / true_err
    assert 0.9 < effectivity < 1.1, (est, true_err, effectivity)
    assert float(eta.min()) >= 0.0
