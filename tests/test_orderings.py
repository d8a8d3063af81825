"""Ordering strategies (reference: dune/pdelab/ordering/
{lexicographicordering,interleavedordering,entityblockedlocalordering,
chunkedblockordering,permutedordering}.hh): permuted solves match
unpermuted solves up to the permutation; entity-blocked layouts interleave
per entity; chunked descriptors validate and expose block views."""
import numpy as np
import jax.numpy as jnp
import pytest

from dune_pdelab_tpu import (
    StructuredMesh, FunctionSpace, QkFEM, GridOperator, constraints,
    StationaryLinearProblemSolver, PermutedSpace, CompositeSpace,
    interpolate_dirichlet,
)
from dune_pdelab_tpu.solvers import SEQ_CG_Jacobi
from dune_pdelab_tpu.ops import ConvectionDiffusionProblem, ConvectionDiffusionFEM


class P(ConvectionDiffusionProblem):
    def exact(self, p):
        return np.sin(np.pi * p[:, 0]) * np.cos(2 * np.pi * p[:, 1]) + p[:, 0]

    def f(self, x):
        return 5 * np.pi**2 * jnp.sin(np.pi * x[..., 0]) * jnp.cos(
            2 * np.pi * x[..., 1])

    def g(self, x):
        return jnp.sin(np.pi * x[..., 0]) * jnp.cos(2 * np.pi * x[..., 1]) \
            + x[..., 0]


def _solve(space, p):
    cg_ = constraints(p.dirichlet_bctype(), space)
    go = GridOperator(space, ConvectionDiffusionFEM(p), constraints=cg_)
    x0 = interpolate_dirichlet(
        lambda q: np.asarray(p.g(jnp.asarray(q))), space, cg_, space.zero())
    slp = StationaryLinearProblemSolver(go, SEQ_CG_Jacobi(), reduction=1e-12,
                                        verbose=0)
    x = slp.apply(x0)
    assert slp.result.converged
    return x, slp


@pytest.mark.fast
@pytest.mark.parametrize("kind", ["reverse", "random"])
def test_permuted_solve_matches(kind):
    p = P()
    mesh = StructuredMesh([0, 0], [1, 1], (12, 12))
    V = FunctionSpace(mesh, QkFEM(1, 2))
    x_ref, s_ref = _solve(V, p)
    if kind == "reverse":
        perm = np.arange(V.ndofs)[::-1].copy()
    else:
        perm = np.random.default_rng(0).permutation(V.ndofs)
    W = PermutedSpace(V, perm)
    x_perm, s_perm = _solve(W, p)
    # same linear system up to symmetric permutation -> same CG iterations
    assert int(s_ref.result.linear_solver_iterations) == \
        int(s_perm.result.linear_solver_iterations)
    assert float(jnp.linalg.norm(W.restrict(x_perm) - x_ref)) < 1e-9


@pytest.mark.fast
def test_entity_blocked_layout():
    mesh = StructuredMesh([0, 0], [1, 1], (4, 4))
    V = FunctionSpace(mesh, QkFEM(1, 2))
    W = CompositeSpace(V, V, ordering="entity_blocked")
    g0 = W.child_global(0, np.arange(V.ndofs))
    g1 = W.child_global(1, np.arange(V.ndofs))
    # per-entity contiguous blocks [c0(e), c1(e)]
    assert np.array_equal(g0, 2 * np.arange(V.ndofs))
    assert np.array_equal(g1, 2 * np.arange(V.ndofs) + 1)
    # different meshes -> rejected
    V2 = FunctionSpace(StructuredMesh([0, 0], [1, 1], (4, 4)), QkFEM(1, 2))
    with pytest.raises(ValueError):
        CompositeSpace(V, V2, ordering="entity_blocked")


@pytest.mark.fast
def test_chunked_descriptor():
    mesh = StructuredMesh([0, 0], [1, 1], (3, 3))
    V = FunctionSpace(mesh, QkFEM(1, 2))           # 16 dofs
    W = CompositeSpace(V, V, ordering="interleaved", chunk=2)
    assert W.nchunks == V.ndofs
    x = jnp.arange(2.0 * V.ndofs)
    assert W.block_view(x).shape == (V.ndofs, 2)
    with pytest.raises(ValueError):
        CompositeSpace(V, V, ordering="interleaved", chunk=3)


@pytest.mark.fast
def test_entity_blocked_heterogeneous_taylor_hood():
    """Heterogeneous entity-blocked ordering (reference:
    entityblockedlocalordering.hh with variable per-entity block size):
    Taylor-Hood gets (vx, vy, p) blocks at vertices and (vx, vy) at
    Q2-only nodes, and the layout solves identically to lexicographic."""
    from dune_pdelab_tpu import entity_blocked, PowerSpace
    from dune_pdelab_tpu.ops import ConvectionDiffusionProblem, ConvectionDiffusionFEM

    mesh = StructuredMesh([0, 0], [1, 1], (4, 4))
    V2 = FunctionSpace(mesh, QkFEM(2, 2), name="v")
    Vel = PowerSpace(V2, 2, name="vel")
    Q1 = FunctionSpace(mesh, QkFEM(1, 2), name="p")
    TH = CompositeSpace(Vel, Q1)
    W = entity_blocked(TH)
    bs = W.entity_block_sizes
    nvert = 5 * 5
    nq2 = 9 * 9
    assert np.sum(bs == 3) == nvert            # (vx, vy, p) at vertices
    assert np.sum(bs == 2) == nq2 - nvert      # (vx, vy) elsewhere
    assert bs.sum() == W.ndofs
    # the permutation is a bijection
    assert len(np.unique(W.perm)) == W.ndofs

    # contiguity: the three dofs of each vertex entity are adjacent and in
    # tree order; check via restrict round-trip of a labeled vector
    import jax.numpy as jnp
    lab = jnp.arange(TH.ndofs, dtype=jnp.float64)
    x = jnp.zeros(W.ndofs).at[jnp.asarray(W.perm)].set(lab)
    assert float(jnp.max(jnp.abs(W.restrict(x) - lab))) == 0.0


@pytest.mark.fast
def test_entity_blocked_poisson_vector_solve():
    """Vector Poisson on the entity-blocked layout matches per-component
    sequential solves through the full assembly/constraint/solve stack."""
    from dune_pdelab_tpu import entity_blocked, PowerSpace, constraints
    from dune_pdelab_tpu.ops import ConvectionDiffusionProblem, ConvectionDiffusionFEM
    from dune_pdelab_tpu.solvers import SEQ_CG_Jacobi

    from dune_pdelab_tpu.ops.base import LocalOperator

    class VecPoisson(LocalOperator):
        """-lap u_c = 1 per component (tuple-aware volume kernel)."""
        is_linear = True

        def alpha_volume(self, ctx, u):
            us = u if isinstance(u, tuple) else (u,)
            out = tuple(
                self.accumulate_gradient(t, ctx.factor,
                                         self.gradient_at_qp(t, ui))
                for t, ui in zip(ctx.tabs, us))
            return out if isinstance(u, tuple) else out[0]

        def lambda_volume(self, ctx):
            one = jnp.ones(ctx.x.shape[:-1], ctx.factor.dtype)
            out = tuple(self.accumulate_value(t, ctx.factor, -one)
                        for t in ctx.tabs)
            return out if len(out) > 1 else out[0]

    class P(ConvectionDiffusionProblem):
        def f(self, x):
            return jnp.ones(x.shape[:-1], x.dtype)

    mesh = StructuredMesh([0, 0], [1, 1], (8, 8))
    V = FunctionSpace(mesh, QkFEM(1, 2))
    W = entity_blocked(CompositeSpace(V, V))
    prob = P()
    cgm = constraints((True, True), W)
    go = GridOperator(W, VecPoisson(), constraints=cgm)
    x = StationaryLinearProblemSolver(
        go, SEQ_CG_Jacobi(maxiter=5000), reduction=1e-12).apply(W.zero())

    cg1 = constraints(prob.dirichlet_bctype(), V)
    go1 = GridOperator(V, ConvectionDiffusionFEM(prob), constraints=cg1)
    x1 = StationaryLinearProblemSolver(
        go1, SEQ_CG_Jacobi(maxiter=5000), reduction=1e-12).apply(V.zero())

    inner = W.restrict(x)
    for c in range(2):
        xc = inner[c * V.ndofs:(c + 1) * V.ndofs]
        assert float(jnp.max(jnp.abs(xc - x1))) < 1e-9
