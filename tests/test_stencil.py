"""Stencil compilation tests: compiled shift-MAC operator must match the
general matrix-free jacobian_apply exactly (BCRS SpMV replacement oracle)."""
import numpy as np
import jax.numpy as jnp
import pytest

from dune_pdelab_tpu import (
    StructuredMesh, FunctionSpace, QkFEM, GridOperator, constraints,
)
from dune_pdelab_tpu.ops import (
    ConvectionDiffusionProblem, ConvectionDiffusionFEM,
)
from dune_pdelab_tpu.assembly.stencil import compile_stencil


class ConstCoeff(ConvectionDiffusionProblem):
    def A(self, x):
        return 2.0

    def b(self, x):
        return jnp.broadcast_to(jnp.array([0.5, -0.25][:x.shape[-1]]
                                          if x.shape[-1] == 2 else
                                          [0.5, -0.25, 0.1]), x.shape)

    def c(self, x):
        return 0.3


class VarCoeff(ConvectionDiffusionProblem):
    def A(self, x):
        return 1.0 + x[..., 0]


@pytest.mark.parametrize("dim,k,n", [(2, 1, 10), (2, 2, 10), (3, 1, 6),
                                     (3, 2, 6)])
def test_stencil_matches_matrix_free(dim, k, n):
    p = ConstCoeff()
    mesh = StructuredMesh([0] * dim, [1] * dim, (n,) * dim)
    V = FunctionSpace(mesh, QkFEM(k, dim))
    cg_ = constraints(True, V)
    go = GridOperator(V, ConvectionDiffusionFEM(p), constraints=cg_)
    st = compile_stencil(go)
    assert st is not None
    rng = np.random.default_rng(0)
    for _ in range(3):
        z = jnp.asarray(rng.standard_normal(V.ndofs))
        y1 = go.jacobian_apply(jnp.zeros(V.ndofs), z)
        y2 = st(z)
        assert float(jnp.linalg.norm(y1 - y2)) < 1e-11 * float(
            jnp.linalg.norm(y1)), (dim, k)


def test_stencil_refuses_variable_coefficients():
    mesh = StructuredMesh([0, 0], [1, 1], (10, 10))
    V = FunctionSpace(mesh, QkFEM(1, 2))
    cg_ = constraints(True, V)
    go = GridOperator(V, ConvectionDiffusionFEM(VarCoeff()), constraints=cg_)
    assert compile_stencil(go) is None


def test_stencil_refuses_central_inclusion():
    """Coefficient constant near the corner probes but not globally — the
    whole-domain random-vector check must reject compilation (regression:
    corner-local probing accepted this and the solver silently converged
    on the wrong operator)."""
    class Inclusion(ConvectionDiffusionProblem):
        def A(self, x):
            inside = ((jnp.abs(x[..., 0] - 0.5) < 0.15)
                      & (jnp.abs(x[..., 1] - 0.5) < 0.15))
            return jnp.where(inside, 1e-3, 1.0)

    mesh = StructuredMesh([0, 0], [1, 1], (16, 16))
    V = FunctionSpace(mesh, QkFEM(1, 2))
    cg_ = constraints(True, V)
    go = GridOperator(V, ConvectionDiffusionFEM(Inclusion()),
                      constraints=cg_)
    assert compile_stencil(go) is None


def test_stencil_refuses_partial_dirichlet():
    mesh = StructuredMesh([0, 0], [1, 1], (10, 10))
    V = FunctionSpace(mesh, QkFEM(1, 2))
    cg_ = constraints(lambda x: np.isclose(x[:, 0], 0.0), V)
    go = GridOperator(V, ConvectionDiffusionFEM(ConstCoeff()), constraints=cg_)
    assert compile_stencil(go) is None


def test_pallas_tiled_stencil_matches_interpret():
    """The Pallas tiled lowering equals the XLA stencil (interpret mode)."""
    from dune_pdelab_tpu.assembly.stencil_pallas_tile import (
        try_pallas_tiled_stencil,
    )
    mesh = StructuredMesh([0, 0, 0], [1, 1, 1], (11, 11, 11))
    V = FunctionSpace(mesh, QkFEM(1, 3))
    cg_ = constraints(True, V)
    go = GridOperator(V, ConvectionDiffusionFEM(ConstCoeff()), constraints=cg_)
    st = compile_stencil(go)
    pal = try_pallas_tiled_stencil(st, interpret=True, row_block=24)
    assert pal is not None
    rng = np.random.default_rng(7)
    z = jnp.asarray(rng.standard_normal(V.ndofs), jnp.float32)
    y1 = st(z).astype(jnp.float32)
    y2 = pal(z)
    assert float(jnp.linalg.norm(y1 - y2)) < 1e-4 * float(jnp.linalg.norm(y1))


def test_stencil_diagonal_matches_probed():
    """StencilOperator.diagonal (the tap-derived Jacobi diagonal used by
    LinearSolverBackend to avoid probing — whose jit ships element-sized
    scatter maps, too large for remote compile at ~1M+ elements) equals
    go.jacobian_diagonal exactly, incl. residue classes (Q2) and the
    identity rows of the constraint mask."""
    for dim, deg, cells in [(2, 1, (8, 8)), (2, 2, (7, 6)),
                            (3, 1, (6, 6, 6))]:
        mesh = StructuredMesh([0] * dim, [1] * dim, cells)
        V = FunctionSpace(mesh, QkFEM(deg, dim))
        cg_ = constraints(True, V)
        go = GridOperator(V, ConvectionDiffusionFEM(ConstCoeff()),
                          constraints=cg_)
        st = compile_stencil(go)
        assert st is not None, (dim, deg)
        d1 = np.asarray(st.diagonal(dtype=jnp.result_type(float)))
        d2 = np.asarray(go.jacobian_diagonal(V.zero()))
        assert np.allclose(d1, d2, atol=1e-12), (dim, deg)
