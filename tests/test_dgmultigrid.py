"""Two-level DG multigrid: SIPG Poisson iteration counts must stay flat
under mesh refinement (the AMG-for-DG oracle, reference:
dune/pdelab/backend/istl/seq_amg_dg_backend.hh:146, test-dg-amg)."""
import numpy as np
import jax.numpy as jnp
import pytest

from dune_pdelab_tpu import StructuredMesh, FunctionSpace, GridOperator
from dune_pdelab_tpu.fe import QkDGFEM
from dune_pdelab_tpu.linalg import DGTwoLevel
from dune_pdelab_tpu.ops import (
    ConvectionDiffusionProblem, ConvectionDiffusionFEM,
)
from dune_pdelab_tpu.ops.convectiondiffusiondg import (
    ConvectionDiffusionDG, DGMethod,
)
from dune_pdelab_tpu.solvers import (
    LinearSolverBackend, StationaryLinearProblemSolver, SEQ_CG_BlockJacobi,
)
from dune_pdelab_tpu.space.functions import l2_difference


class SinCos2D(ConvectionDiffusionProblem):
    def exact(self, p):
        return np.sin(np.pi * p[:, 0]) * np.cos(2 * np.pi * p[:, 1]) + p[:, 0]

    def f(self, x):
        return 5 * np.pi**2 * jnp.sin(np.pi * x[..., 0]) * jnp.cos(
            2 * np.pi * x[..., 1])

    def g(self, x):
        return jnp.sin(np.pi * x[..., 0]) * jnp.cos(2 * np.pi * x[..., 1]) \
            + x[..., 0]


class SinCos3D(ConvectionDiffusionProblem):
    def exact(self, p):
        return np.sin(np.pi * p[:, 0]) * np.sin(np.pi * p[:, 1]) * p[:, 2]

    def f(self, x):
        return 2 * np.pi**2 * jnp.sin(np.pi * x[..., 0]) * jnp.sin(
            np.pi * x[..., 1]) * x[..., 2]

    def g(self, x):
        return jnp.sin(np.pi * x[..., 0]) * jnp.sin(np.pi * x[..., 1]) \
            * x[..., 2]


def _solve(problem, n, dim, k=1):
    mesh = StructuredMesh([0] * dim, [1] * dim, (n,) * dim)
    V = FunctionSpace(mesh, QkDGFEM(k, dim))
    go = GridOperator(V, ConvectionDiffusionDG(problem, method=DGMethod.SIPG))
    pre = DGTwoLevel(go, ConvectionDiffusionFEM(problem),
                     bctype=problem.dirichlet_bctype())
    ls = LinearSolverBackend(solver="cg", precond=pre, use_stencil=False)
    slp = StationaryLinearProblemSolver(go, ls, reduction=1e-10, verbose=0)
    x = slp.apply(V.zero())
    return V, x, slp.result.linear_solver_iterations


@pytest.mark.parametrize("dim,sizes,problem", [
    (2, (16, 32, 64), SinCos2D()),
    (3, (8, 16), SinCos3D()),
])
def test_dg_two_level_iterations_flat(dim, sizes, problem):
    its = []
    for n in sizes:
        V, x, it = _solve(problem, n, dim)
        err = float(l2_difference(V, x, problem.exact))
        assert err < 1.0 / n, (n, err)   # sanity: converged solve
        its.append(it)
    # mesh-independent iteration counts (allow small drift)
    assert its[-1] <= its[0] + 4, its
    assert its[-1] <= 30, its


def test_dg_two_level_beats_block_jacobi():
    """Two-level coarse correction must beat plain block-Jacobi CG whose
    iteration count grows with the mesh."""
    p = SinCos2D()
    n = 32
    mesh = StructuredMesh([0, 0], [1, 1], (n, n))
    V = FunctionSpace(mesh, QkDGFEM(1, 2))
    go = GridOperator(V, ConvectionDiffusionDG(p, method=DGMethod.SIPG))

    pre = DGTwoLevel(go, ConvectionDiffusionFEM(p),
                     bctype=p.dirichlet_bctype())
    ls2 = LinearSolverBackend(solver="cg", precond=pre, use_stencil=False)
    s2 = StationaryLinearProblemSolver(go, ls2, reduction=1e-10, verbose=0)
    s2.apply(V.zero())

    lsbj = SEQ_CG_BlockJacobi(use_stencil=False)
    sbj = StationaryLinearProblemSolver(go, lsbj, reduction=1e-10, verbose=0)
    sbj.apply(V.zero())

    assert s2.result.linear_solver_iterations \
        < 0.5 * sbj.result.linear_solver_iterations, (
            s2.result.linear_solver_iterations,
            sbj.result.linear_solver_iterations)


def test_dg_two_level_simplex_amg_coarse():
    """Simplex SIPG through the DG->P1->AMG composition (the literal
    seq_amg_dg_backend.hh structure): iteration counts flat under
    refinement, coarse solver auto-selects AMG (no GMG on simplices)."""
    from dune_pdelab_tpu.mesh import SimplexMesh
    from dune_pdelab_tpu.fe import PkDGFEM
    from dune_pdelab_tpu.linalg.krylov import cg

    p = SinCos2D()
    its = []
    for n in (8, 16, 32):
        sm = SimplexMesh.from_structured(
            StructuredMesh([0, 0], [1, 1], (n, n)))
        V = FunctionSpace(sm, PkDGFEM(1, 2))
        go = GridOperator(V, ConvectionDiffusionDG(p, method=DGMethod.SIPG))
        tl = DGTwoLevel(go, ConvectionDiffusionFEM(p))
        assert tl.coarse_kind == "amg"
        tl.setup()
        b = jnp.asarray(
            np.random.default_rng(1).standard_normal(V.ndofs))
        x0 = V.zero()
        z, s = cg(lambda q: go.jacobian_apply(x0, q), b, M=tl.apply,
                  tol=1e-10)
        res = float(jnp.linalg.norm(go.jacobian_apply(x0, z) - b)) / float(
            jnp.linalg.norm(b))
        assert res < 1e-8, res
        its.append(int(s.iterations))
    assert its[-1] <= its[0] + 4, its
    assert its[-1] <= 25, its


def test_dg_two_level_modal_basis():
    """The quadrature-projection CG->DG embedding serves MODAL bases
    (Legendre; nodes=None) — nodal interpolation could not."""
    from dune_pdelab_tpu.fe import LegendreDGFEM
    from dune_pdelab_tpu.linalg.krylov import cg

    p = SinCos2D()
    mesh = StructuredMesh([0, 0], [1, 1], (16, 16))
    V = FunctionSpace(mesh, LegendreDGFEM(1, 2))
    go = GridOperator(V, ConvectionDiffusionDG(p, method=DGMethod.SIPG))
    tl = DGTwoLevel(go, ConvectionDiffusionFEM(p))
    tl.setup()
    b = jnp.asarray(np.random.default_rng(1).standard_normal(V.ndofs))
    x0 = V.zero()
    z, s = cg(lambda q: go.jacobian_apply(x0, q), b, M=tl.apply, tol=1e-10)
    res = float(jnp.linalg.norm(go.jacobian_apply(x0, z) - b)) / float(
        jnp.linalg.norm(b))
    assert res < 1e-8 and int(s.iterations) <= 15, (res, int(s.iterations))


def test_greedy_element_colors_valid():
    """Face-adjacent simplex elements never share a color, and the colors
    partition the element set."""
    from dune_pdelab_tpu.mesh import SimplexMesh
    from dune_pdelab_tpu.linalg.dgmultigrid import _greedy_element_colors

    sm = SimplexMesh.from_structured(StructuredMesh([0, 0], [1, 1], (6, 6)))
    colors = _greedy_element_colors(sm)
    allc = np.concatenate(colors)
    assert len(allc) == sm.nelements
    assert len(np.unique(allc)) == sm.nelements
    cmap = np.empty(sm.nelements, int)
    for c, idx in enumerate(colors):
        cmap[idx] = c
    f = sm.interior_faces()
    assert np.all(cmap[f["inside"]] != cmap[f["outside"]])


@pytest.mark.fast
def test_mm_resident_vcycle_parity():
    """The mode-major two-level V-cycle (plane-FMA block solves, corner
    slice-add transfers) matches the flat V-cycle to fp32 roundoff and
    preconditions CG to the same mesh-independent counts."""
    from dune_pdelab_tpu.assembly.blockstencil import compile_block_stencil
    from dune_pdelab_tpu.assembly.blockstencil_mm import (
        try_mm_block_stencil, MMBlockStencil,
    )
    from dune_pdelab_tpu.linalg.krylov import cg

    p = SinCos3D()
    mesh = StructuredMesh([0, 0, 0], [1, 1, 1], (8, 8, 8))
    V = FunctionSpace(mesh, QkDGFEM(1, 3))
    go = GridOperator(V, ConvectionDiffusionDG(p))
    Aop = compile_block_stencil(go)
    mm = try_mm_block_stencil(Aop, interpret=True)
    assert mm is not None
    tl_flat = DGTwoLevel(go, ConvectionDiffusionFEM(p))
    tl_flat.setup(operator=Aop)
    tl_mm = DGTwoLevel(go, ConvectionDiffusionFEM(p))
    tl_mm.setup(operator=MMBlockStencil(mm))
    r = jnp.asarray(np.random.default_rng(0).standard_normal(V.ndofs))
    z1, z2 = tl_flat.apply(r), tl_mm.apply(r)
    assert float(jnp.max(jnp.abs(z1 - z2)) / jnp.max(jnp.abs(z1))) < 1e-5
    b = -go.residual(V.zero())
    x, st = cg(Aop, b, M=tl_mm.apply, tol=1e-8, maxiter=40)
    assert bool(st.converged) and int(st.iterations) <= 12
