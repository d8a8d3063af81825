"""Fused structured assembly (assembly/structured_fused.py) + the
variable-coefficient GMG built on it (linalg/gmg_varcoeff.py).

Parity oracle: the batched general path (gridoperator residual /
jacobian_apply) on the same operator — the fused kernel recomputes the
same quadrature sums in fp32, so agreement is to fp32 roundoff.
Reference analog for the operator under test:
dune/pdelab/localoperator/convectiondiffusionfem.hh:63-138.
"""
import numpy as np
import pytest
import jax.numpy as jnp

import dune_pdelab_tpu as pt
from dune_pdelab_tpu.ops import (
    ConvectionDiffusionProblem, ConvectionDiffusionFEM)
from dune_pdelab_tpu.assembly.structured_fused import (
    make_fused_residual, make_fused_japply)

pytestmark = pytest.mark.fast


class VarCoeff(ConvectionDiffusionProblem):
    """Scalar-field diffusion + reaction (the bench.py assembled problem)."""

    def A(self, x):
        a = 1.0 + 0.5 * jnp.sin(3 * x[..., 0]) * x[..., 1]
        return a[..., None, None] * jnp.eye(x.shape[-1], dtype=x.dtype)

    def c(self, x):
        return 0.7 + x[..., 0]

    def f(self, x):
        return jnp.ones(x.shape[:-1], x.dtype)


class TensorConv(ConvectionDiffusionProblem):
    """Full anisotropic tensor + convection + source (all kernel branches)."""

    def A(self, x):
        d = x.shape[-1]
        base = jnp.eye(d, dtype=x.dtype) + 0.3 * jnp.ones((d, d), x.dtype)
        a = 1.0 + x[..., 1] * x[..., 2]
        return a[..., None, None] * base

    def b(self, x):
        return jnp.stack([x[..., 1], -x[..., 0],
                          0.5 * jnp.ones_like(x[..., 0])], axis=-1)

    def c(self, x):
        return 0.2 + x[..., 2]

    def f(self, x):
        return jnp.cos(2 * x[..., 0]) * x[..., 1]


def _setup(problem, n=9):
    mesh = pt.StructuredMesh([0, 0, 0], [1, 1, 1], (n, n, n))
    V = pt.FunctionSpace(mesh, pt.QkFEM(1, 3))
    go = pt.GridOperator(V, ConvectionDiffusionFEM(problem),
                         constraints=pt.constraints(True, V),
                         skip_boundary=True)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal(V.ndofs), jnp.float32)
    return go, x


@pytest.mark.parametrize("problem", [VarCoeff(), TensorConv()],
                         ids=["scalar_field", "tensor_convection"])
def test_fused_residual_matches_batched(problem):
    go, x = _setup(problem)
    fused = make_fused_residual(go, tz=4, cy=8)
    assert fused is not None
    r_ref = np.asarray(go.residual(x), np.float64)
    r_f = np.asarray(fused(x), np.float64)
    scale = max(1.0, np.abs(r_ref).max())
    assert np.abs(r_f - r_ref).max() <= 2e-5 * scale


def test_fused_japply_matches_batched():
    go, x = _setup(VarCoeff())
    japply = make_fused_japply(go, tz=4, cy=8)
    assert japply is not None
    rng = np.random.default_rng(11)
    z = jnp.asarray(rng.standard_normal(go.space.ndofs), jnp.float32)
    y_ref = np.asarray(
        go.jacobian_apply(jnp.zeros_like(z), z), np.float64)
    y_f = np.asarray(japply(z), np.float64)
    scale = max(1.0, np.abs(y_ref).max())
    assert np.abs(y_f - y_ref).max() <= 2e-5 * scale
    # constrained rows pass z through (jacobian_apply convention)
    m = np.asarray(go.cg.mask_np)
    assert np.allclose(y_f[m], np.asarray(z)[m], atol=1e-6)


def test_fused_declines_out_of_scope():
    # 2D -> None
    mesh2 = pt.StructuredMesh([0, 0], [1, 1], (8, 8))
    V2 = pt.FunctionSpace(mesh2, pt.QkFEM(1, 2))
    go2 = pt.GridOperator(V2, ConvectionDiffusionFEM(VarCoeff()),
                          constraints=pt.constraints(True, V2),
                          skip_boundary=True)
    assert make_fused_residual(go2) is None
    # Q2 -> None
    mesh = pt.StructuredMesh([0, 0, 0], [1, 1, 1], (6, 6, 6))
    V = pt.FunctionSpace(mesh, pt.QkFEM(2, 3))
    go = pt.GridOperator(V, ConvectionDiffusionFEM(VarCoeff()),
                         constraints=pt.constraints(True, V),
                         skip_boundary=True)
    assert make_fused_residual(go) is None
    # active boundary kernels -> None
    V1 = pt.FunctionSpace(mesh, pt.QkFEM(1, 3))
    go_b = pt.GridOperator(V1, ConvectionDiffusionFEM(VarCoeff()),
                           constraints=pt.constraints(True, V1))
    assert make_fused_residual(go_b) is None


def test_varcoeff_gmg_flat_iterations():
    """Rediscretized GMG on a variable-coefficient operator: iteration
    count stays flat under refinement and the TRUE defect is reduced.
    This is the north-star demand without the translation-invariance
    asterisk (gmg_lattice.py:34-38)."""
    from dune_pdelab_tpu.linalg.gmg_varcoeff import VarCoeffGMG
    its = {}
    for n in (16, 32):
        mesh = pt.StructuredMesh([0, 0, 0], [1, 1, 1], (n, n, n))
        V = pt.FunctionSpace(mesh, pt.QkFEM(1, 3))
        go = pt.GridOperator(V, ConvectionDiffusionFEM(VarCoeff()),
                             constraints=pt.constraints(True, V),
                             skip_boundary=True)
        gmg = VarCoeffGMG(go)
        b = -go.residual(jnp.zeros(V.ndofs, jnp.float32))
        x, info = gmg.solve_host(b, tol=1e-8, maxiter=40)
        assert info["converged"]
        assert info["true_defect"] / info["defect0"] < 1e-4  # fp32 floor
        its[n] = info["iterations"]
    assert its[32] <= its[16] + 2, its


def test_varcoeff_gmg_matches_direct_solution():
    """GMG-CG solution equals the sparse-direct solution of the same
    assembled operator (not just small residual norms)."""
    from dune_pdelab_tpu.linalg.gmg_varcoeff import VarCoeffGMG
    n = 16
    mesh = pt.StructuredMesh([0, 0, 0], [1, 1, 1], (n, n, n))
    V = pt.FunctionSpace(mesh, pt.QkFEM(1, 3))
    go = pt.GridOperator(V, ConvectionDiffusionFEM(VarCoeff()),
                         constraints=pt.constraints(True, V),
                         skip_boundary=True)
    gmg = VarCoeffGMG(go)
    b = -go.residual(jnp.zeros(V.ndofs, jnp.float32))
    x, info = gmg.solve_host(b, tol=1e-10, maxiter=60)

    import scipy.sparse as sp
    import scipy.sparse.linalg as spla
    Abcoo = go.jacobian(jnp.zeros(V.ndofs))
    ij = np.asarray(Abcoo.indices)
    A = sp.csr_matrix((np.asarray(Abcoo.data, np.float64),
                       (ij[:, 0], ij[:, 1])),
                      shape=(V.ndofs, V.ndofs))
    x_ref = spla.spsolve(A, np.asarray(b, np.float64))
    err = np.abs(np.asarray(x, np.float64) - x_ref).max()
    assert err <= 5e-5 * max(1.0, np.abs(x_ref).max()), err
