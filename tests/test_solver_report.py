"""Tier-transparency report: which operator-apply path a solve landed on
and why the faster tiers declined (round-4 VERDICT weak-6: users hitting a
slow path got no signal). reference analog: the ISTL backends print their
solver category via Dune::PDELab::LinearSolverResult verbosity."""
import numpy as np
import jax.numpy as jnp
import pytest

import dune_pdelab_tpu as pt
from dune_pdelab_tpu.ops import (
    ConvectionDiffusionProblem, ConvectionDiffusionFEM)
from dune_pdelab_tpu.solvers import SEQ_CG_Jacobi

pytestmark = pytest.mark.fast


class Poisson(ConvectionDiffusionProblem):
    def f(self, x):
        return jnp.ones(x.shape[:-1], x.dtype)


class VarCoeff(ConvectionDiffusionProblem):
    def A(self, x):
        a = 1.0 + 0.5 * x[..., 0]
        return a[..., None, None] * jnp.eye(x.shape[-1], dtype=x.dtype)

    def f(self, x):
        return jnp.ones(x.shape[:-1], x.dtype)


def _solve(problem, n=12):
    mesh = pt.StructuredMesh([0, 0], [1, 1], (n, n))
    V = pt.FunctionSpace(mesh, pt.QkFEM(1, 2))
    go = pt.GridOperator(V, ConvectionDiffusionFEM(problem),
                         constraints=pt.constraints(True, V))
    ls = SEQ_CG_Jacobi()
    x = pt.StationaryLinearProblemSolver(go, ls, reduction=1e-8).apply(
        V.zero())
    return ls, go, x


def test_report_before_solve():
    ls = SEQ_CG_Jacobi()
    assert "no solve recorded" in ls.report()


def test_report_stencil_tier():
    """Constant-coefficient lattice Poisson lands on the compiled stencil."""
    ls, go, _ = _solve(Poisson())
    rep = ls.report(go)
    assert "solve path:" in rep
    assert "stencil" in rep.lower()
    assert "general-jvp" not in rep.split("declined")[0]


def test_report_general_tier_names_decline_reason():
    """A variable-coefficient operator is NOT translation-invariant: the
    report must say the solve fell back and why the stencil declined."""
    ls, go, _ = _solve(VarCoeff())
    rep = ls.report(go)
    assert "general-jvp" in rep
    assert "declined stencil" in rep
