"""Selective assembly: skip_entity / skip_intersection (reference:
localoperator/interface.hh:121,137, dispatched in
gridoperator/default/assembler.hh:123,161). Here: static 0/1 element and
face weights folded into assembly; skeleton faces need BOTH sides active.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from dune_pdelab_tpu import (
    StructuredMesh, FunctionSpace, GridOperator, QkFEM, constraints,
)
from dune_pdelab_tpu.fe import QkDGFEM
from dune_pdelab_tpu.ops import (
    ConvectionDiffusionProblem, ConvectionDiffusionFEM,
)
from dune_pdelab_tpu.ops.convectiondiffusiondg import ConvectionDiffusionDG


class Prob(ConvectionDiffusionProblem):
    def A(self, x):
        return 1.0 + x[..., 0]

    def c(self, x):
        return 0.5

    def f(self, x):
        return jnp.sin(3 * x[..., 0]) + x[..., 1]

    def bctype(self, x):
        return jnp.where(x[..., 0] < 1e-12, 1, 0)   # Dirichlet left only

    def g(self, x):
        return x[..., 1]

    def j(self, x):
        return 0.3


def _left(fem):
    class Left(fem):
        def skip_entity(self, centers):
            return centers[..., 0] >= 0.5

    return Left


def _right(fem):
    class Right(fem):
        def skip_entity(self, centers):
            return centers[..., 0] < 0.5

    return Right


def _rand(V):
    return jnp.asarray(
        np.random.default_rng(3).standard_normal(V.ndofs), jnp.float64)


def test_skip_entity_cg_complementary_sum():
    """CG FEM (no skeleton): left-restricted + right-restricted == full."""
    p = Prob()
    mesh = StructuredMesh([0, 0], [1, 1], (8, 8))
    V = FunctionSpace(mesh, QkFEM(1, 2))
    cg = constraints(p.dirichlet_bctype(), V)
    x = _rand(V)
    r_full = GridOperator(V, ConvectionDiffusionFEM(p),
                          constraints=cg).residual(x)
    rl = GridOperator(V, _left(ConvectionDiffusionFEM)(p),
                      constraints=cg).residual(x)
    rr = GridOperator(V, _right(ConvectionDiffusionFEM)(p),
                      constraints=cg).residual(x)
    assert float(jnp.max(jnp.abs(rl + rr - r_full))) < 1e-12


def test_skip_entity_dg_zero_rows_and_interface():
    """DG: rows of elements strictly inside the skipped half vanish; the
    complementary sum misses exactly the interface skeleton faces."""
    p = Prob()
    mesh = StructuredMesh([0, 0], [1, 1], (8, 8))
    V = FunctionSpace(mesh, QkDGFEM(1, 2))
    x = _rand(V)
    go_full = GridOperator(V, ConvectionDiffusionDG(p))
    go_l = GridOperator(V, _left(ConvectionDiffusionDG)(p))
    go_r = GridOperator(V, _right(ConvectionDiffusionDG)(p))
    r_full = go_full.residual(x)
    rl, rr = go_l.residual(x), go_r.residual(x)
    # rows of elements with centers x > 0.5 + h are untouched by the left op
    centers = np.asarray(mesh.element_centers())
    nb = V.fem.nbasis
    deep_right = np.flatnonzero(centers[:, 0] > 0.5 + 1.0 / 8)
    rl_e = np.asarray(rl).reshape(mesh.nelements, nb)
    assert np.max(np.abs(rl_e[deep_right])) == 0.0
    # complementary sum == full MINUS the interface faces' contribution
    diff = np.asarray(rl + rr - r_full).reshape(mesh.nelements, nb)
    touched = np.flatnonzero(np.max(np.abs(diff), axis=1) > 1e-13)
    # exactly the two element columns adjacent to x = 0.5
    assert set(touched) == {
        int(e) for e in np.flatnonzero(
            np.abs(np.abs(centers[:, 0] - 0.5) - 0.5 / 8) < 1e-12)
    }


def test_skip_intersection_partition_identity():
    """Partitioning skeleton faces by midpoint: r_A + r_B == r_full +
    r_all_skipped (each face assembled exactly once across A|B)."""
    p = Prob()
    mesh = StructuredMesh([0, 0], [1, 1], (6, 6))
    V = FunctionSpace(mesh, QkDGFEM(1, 2))
    x = _rand(V)

    def with_skip(pred):
        class S(ConvectionDiffusionDG):
            def skip_intersection(self, mids):
                return pred(mids)

        return GridOperator(V, S(p))

    r_full = GridOperator(V, ConvectionDiffusionDG(p)).residual(x)
    r_a = with_skip(lambda m: m[..., 0] >= 0.5).residual(x)
    r_b = with_skip(lambda m: m[..., 0] < 0.5).residual(x)
    r_none = with_skip(lambda m: jnp.ones(m.shape[:-1], bool)).residual(x)
    assert float(jnp.max(jnp.abs(r_a + r_b - (r_full + r_none)))) < 1e-12
    assert float(jnp.max(jnp.abs(r_none - r_full))) > 1e-6  # skeletons real


def test_selective_dwr_localization_invariant():
    """sum_K eta_K == w^T r(x) still holds under selective assembly."""
    p = Prob()
    mesh = StructuredMesh([0, 0], [1, 1], (6, 6))
    V = FunctionSpace(mesh, QkDGFEM(1, 2))
    go = GridOperator(V, _left(ConvectionDiffusionDG)(p))
    x = _rand(V)
    w = jnp.asarray(
        np.random.default_rng(7).standard_normal(V.ndofs), jnp.float64)
    eta = go.weighted_element_residuals(x, w)
    lhs = float(jnp.sum(eta))
    rhs = float(w @ go.residual(x))
    assert abs(lhs - rhs) < 1e-11 * max(1.0, abs(rhs))


def test_skip_entity_jacobian_apply_consistent():
    """jvp jacobian path inherits the masks (linear op: J z == r(z))."""
    p = Prob()
    mesh = StructuredMesh([0, 0], [1, 1], (6, 6))
    V = FunctionSpace(mesh, QkDGFEM(1, 2))
    go = GridOperator(V, _left(ConvectionDiffusionDG)(p))
    z = _rand(V)
    jz = go.jacobian_apply(jnp.zeros_like(z), z)
    rz = go.residual(z) - go.residual(jnp.zeros_like(z))
    assert float(jnp.max(jnp.abs(jz - rz))) < 1e-12


def test_selective_jacobian_matches_jacobian_apply():
    """ADVICE r3 (high): assembled jacobian of a selective operator must be
    the derivative of the masked residual — J @ z == jacobian_apply(x, z)
    for every probing path (jacobian, jacobian_diagonal, element blocks)."""
    p = Prob()
    mesh = StructuredMesh([0, 0], [1, 1], (6, 6))
    V = FunctionSpace(mesh, QkDGFEM(1, 2))
    go = GridOperator(V, _left(ConvectionDiffusionDG)(p))
    x = jnp.zeros(V.ndofs)
    z = _rand(V)
    J = go.jacobian(x)
    jz_mat = J @ z
    jz_free = go.jacobian_apply(x, z)
    assert float(jnp.max(jnp.abs(jz_mat - jz_free))) < 1e-11

    # jacobian_diagonal must equal the diagonal of the assembled jacobian
    d = go.jacobian_diagonal(x)
    Jd = np.zeros(V.ndofs)
    Jdense = np.asarray(J.todense())
    np.testing.assert_allclose(np.asarray(d), np.diag(Jdense), atol=1e-11)

    # element_diagonal_blocks of fully-skipped elements are ZERO (not the
    # unmasked operator's blocks)
    blocks = go.element_diagonal_blocks(x)
    centers = np.asarray(mesh.element_centers())
    skipped = centers[:, 0] >= 0.5
    assert float(jnp.max(jnp.abs(blocks[skipped]))) == 0.0
    assert float(jnp.max(jnp.abs(blocks[~skipped]))) > 1e-6


def test_skip_intersection_masks_boundary_faces():
    """ADVICE r3 (medium): skip_intersection applies to boundary
    intersections too (reference checks skipIntersection before
    classifyIntersection, default/assembler.hh:161)."""
    p = Prob()
    mesh = StructuredMesh([0, 0], [1, 1], (6, 6))
    V = FunctionSpace(mesh, QkDGFEM(1, 2))
    x = _rand(V)

    class SkipRightBnd(ConvectionDiffusionDG):
        def skip_intersection(self, mids):
            return mids[..., 0] > 1.0 - 1e-9   # right boundary faces only

    r_full = GridOperator(V, ConvectionDiffusionDG(p)).residual(x)
    go_s = GridOperator(V, SkipRightBnd(p))
    r_skip = go_s.residual(x)
    diff = np.asarray(jnp.abs(r_full - r_skip))
    assert diff.max() > 1e-8          # right-boundary terms really dropped
    # jacobian consistency on the boundary-masked operator as well
    z = _rand(V)
    assert float(jnp.max(jnp.abs(
        go_s.jacobian(jnp.zeros(V.ndofs)) @ z
        - go_s.jacobian_apply(jnp.zeros(V.ndofs), z)))) < 1e-11
