"""Lattice ILU(0) (Chow-Patel fine-grained parallel reformulation on the
ELL pattern; reference smoother slot: dune/pdelab/backend/istl/
seqistlsolverbackend.hh ILU0 combos). Oracles: exactness on tridiagonal
systems (ILU0 == LU there), and iteration counts well below Jacobi on 2D
Poisson."""
import numpy as np
import jax.numpy as jnp
import pytest

from dune_pdelab_tpu import (
    StructuredMesh, FunctionSpace, QkFEM, GridOperator, constraints,
)
from dune_pdelab_tpu.assembly.ell import assemble_ell
from dune_pdelab_tpu.linalg.ilu import EllILU0
from dune_pdelab_tpu.linalg.krylov import cg
from dune_pdelab_tpu.ops import ConvectionDiffusionProblem, ConvectionDiffusionFEM


class P(ConvectionDiffusionProblem):
    def f(self, x):
        return jnp.ones(x.shape[:-1], x.dtype)


def _ell(cells, dim):
    mesh = StructuredMesh([0] * dim, [1] * dim, cells)
    V = FunctionSpace(mesh, QkFEM(1, dim))
    cg_ = constraints(True, V)
    go = GridOperator(V, ConvectionDiffusionFEM(P()), constraints=cg_)
    ell = assemble_ell(go)
    assert ell is not None
    return V, go, ell


@pytest.mark.fast
def test_ilu0_exact_on_tridiagonal():
    """1D Q1 lattice is tridiagonal: ILU0 == exact LU, and with enough
    triangular-solve iterations the preconditioner is a direct solver."""
    V, go, ell = _ell((8,), 1)
    n = V.ndofs
    ilu = EllILU0(ell, sweeps=30, tri_iters=n + 1)
    rng = np.random.default_rng(0)
    r = jnp.asarray(rng.standard_normal(n))
    r = jnp.where(ell.mask, 0.0, r)
    z = ilu(r)
    assert float(jnp.linalg.norm(jnp.where(ell.mask, 0.0, ell(z)) - r)) < 1e-9


@pytest.mark.fast
def test_ilu0_beats_jacobi_2d():
    V, go, ell = _ell((24, 24), 2)
    x0 = V.zero()
    b = go.residual(x0)
    d = go.jacobian_diagonal(x0)
    ilu = EllILU0(ell, sweeps=6, tri_iters=8)
    _, s_jac = cg(ell, b, M=lambda r: r / d, tol=1e-10)
    _, s_ilu = cg(ell, b, M=ilu._apply_impl, tol=1e-10)
    assert int(s_ilu.iterations) < 0.75 * int(s_jac.iterations), (
        int(s_ilu.iterations), int(s_jac.iterations))


@pytest.mark.fast
def test_ilu0_backend():
    """SEQ_CG_ILU0 backend end-to-end (callable-precond path)."""
    from dune_pdelab_tpu.solvers import StationaryLinearProblemSolver
    from dune_pdelab_tpu.solvers.linear import SEQ_CG_ILU0

    mesh = StructuredMesh([0, 0], [1, 1], (16, 16))
    V = FunctionSpace(mesh, QkFEM(1, 2))
    p = P()
    cg_ = constraints(True, V)
    go = GridOperator(V, ConvectionDiffusionFEM(p), constraints=cg_)
    slp = StationaryLinearProblemSolver(go, SEQ_CG_ILU0(), reduction=1e-10,
                                        verbose=0)
    x = slp.apply(V.zero())
    assert slp.result.converged


@pytest.mark.fast
def test_ilun_fill_offsets():
    from dune_pdelab_tpu.linalg.ilu import _fill_levels
    # 1D tridiagonal {-1,0,1}: level-1 fill adds {-2, 2}
    offs = np.array([[-1], [0], [1]])
    ext = _fill_levels(offs, 1)
    assert set(ext) == {(-1,), (0,), (1,), (-2,), (2,)}
    # level 2 adds {-3, 3} (and nothing else new at +-4 needs level 3)
    ext2 = _fill_levels(offs, 2)
    assert (-3,) in ext2 and (3,) in ext2 and (-4,) not in ext2


@pytest.mark.fast
def test_ilu1_beats_ilu0_iterations():
    """ILU(1) is a strictly stronger preconditioner: fewer CG iterations
    than ILU(0) on 2D Poisson (the ISTLBackend_SEQ_CG_ILUn promise)."""
    V, go, ell = _ell((24, 24), 2)
    b = -go.residual(jnp.zeros(V.ndofs))

    its = {}
    for level in (0, 1):
        ilu = EllILU0(ell, sweeps=8, tri_iters=6, level=level)
        A = lambda z: go.jacobian_apply(jnp.zeros(V.ndofs), z)
        x, stats = cg(A, b, M=ilu, tol=1e-10, maxiter=500)
        assert bool(stats.converged)
        its[level] = int(stats.iterations)
    assert its[1] < its[0], its


@pytest.mark.fast
def test_ilun_backend_solves_poisson():
    from dune_pdelab_tpu.solvers import SEQ_CG_ILUn, StationaryLinearProblemSolver
    mesh = StructuredMesh([0, 0], [1, 1], (16, 16))
    V = FunctionSpace(mesh, QkFEM(1, 2))
    cg_ = constraints(True, V)
    go = GridOperator(V, ConvectionDiffusionFEM(P()), constraints=cg_)
    s = StationaryLinearProblemSolver(go, SEQ_CG_ILUn(level=1), reduction=1e-10)
    x = s.apply(V.zero())
    r = go.residual(x)
    assert float(jnp.max(jnp.abs(jnp.where(go.cg.mask, 0.0, r)))) < 1e-8
