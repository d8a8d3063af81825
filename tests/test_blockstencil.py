"""DG block-stencil compilation (assembly/blockstencil.py — the FastDG
assembled-operator fast path as shift-matmuls; reference:
dune/pdelab/gridoperator/fastdg/, backend/istl/bcrsmatrix.hh). Oracles:
machine-precision operator parity vs the general jvp apply (interior AND
boundary rows), CG iteration parity on the SPD SIPG case, solver-backend
integration."""
import numpy as np
import jax.numpy as jnp
import pytest

from dune_pdelab_tpu import (
    StructuredMesh, FunctionSpace, GridOperator,
    StationaryLinearProblemSolver,
)
from dune_pdelab_tpu.assembly.blockstencil import compile_block_stencil
from dune_pdelab_tpu.fe import QkDGFEM, LegendreDGFEM
from dune_pdelab_tpu.ops import ConvectionDiffusionProblem
from dune_pdelab_tpu.ops.convectiondiffusiondg import ConvectionDiffusionDG
from dune_pdelab_tpu.ops.l2 import L2
from dune_pdelab_tpu.solvers import LinearSolverBackend
from dune_pdelab_tpu.space.functions import l2_difference

pytestmark = pytest.mark.fast


class Diff(ConvectionDiffusionProblem):
    """Pure diffusion (SPD SIPG)."""

    def exact(self, p):
        return np.sin(np.pi * p[:, 0]) * np.sin(np.pi * p[:, 1])

    def f(self, x):
        return 2 * jnp.pi**2 * jnp.sin(jnp.pi * x[..., 0]) * jnp.sin(
            jnp.pi * x[..., 1])

    def g(self, x):
        return jnp.zeros(x.shape[:-1])


class ConvDiff(Diff):
    def b(self, x):
        return jnp.asarray([1.0, 0.5])

    def f(self, x):
        s = jnp.sin(jnp.pi * x[..., 0]) * jnp.sin(jnp.pi * x[..., 1])
        dx = jnp.pi * jnp.cos(jnp.pi * x[..., 0]) * jnp.sin(jnp.pi * x[..., 1])
        dy = jnp.pi * jnp.sin(jnp.pi * x[..., 0]) * jnp.cos(jnp.pi * x[..., 1])
        return 2 * jnp.pi**2 * s + dx + 0.5 * dy


@pytest.mark.parametrize("fem,dim,cells", [
    (QkDGFEM(1, 2), 2, (9, 7)),
    (QkDGFEM(2, 2), 2, (8, 6)),
    (LegendreDGFEM(1, 2), 2, (7, 7)),
    (QkDGFEM(1, 3), 3, (6, 5, 5)),
])
def test_block_stencil_matches_general_apply(fem, dim, cells):
    mesh = StructuredMesh([0] * dim, [1] * dim, cells)
    V = FunctionSpace(mesh, fem)
    prob = ConvDiff() if dim == 2 else Diff()
    go = GridOperator(V, ConvectionDiffusionDG(prob))
    st = compile_block_stencil(go)
    assert st is not None
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.standard_normal(V.ndofs))
    diff = float(jnp.max(jnp.abs(go.jacobian_apply(V.zero(), z) - st(z))))
    assert diff < 1e-10, diff


def test_block_stencil_mass_operator():
    """DG mass matrix is block-diagonal: all off-diagonal taps vanish."""
    mesh = StructuredMesh([0, 0], [1, 1], (6, 6))
    V = FunctionSpace(mesh, QkDGFEM(1, 2))
    go = GridOperator(V, L2())
    st = compile_block_stencil(go)
    assert st is not None
    assert np.abs(st.W_taps[1:]).max() < 1e-14
    assert np.abs(st.dD_sides).max() < 1e-14


def test_block_stencil_cg_iteration_parity():
    """SPD SIPG + CG: identical iteration counts and solutions through the
    solver backend (use_stencil toggles the block-stencil fast path)."""
    mesh = StructuredMesh([0, 0], [1, 1], (20, 20))
    V = FunctionSpace(mesh, QkDGFEM(1, 2))
    go = GridOperator(V, ConvectionDiffusionDG(Diff()))
    out = {}
    for use_st in (False, True):
        ls = LinearSolverBackend(solver="cg", precond="block_jacobi",
                                 maxiter=5000, use_stencil=use_st)
        slp = StationaryLinearProblemSolver(go, ls, reduction=1e-11)
        x = slp.apply(V.zero())
        assert slp.result.converged
        if use_st:
            st = ls._setup_cache.get((id(go), "stencil"))
            assert type(st).__name__ == "BlockStencilOperator"
        out[use_st] = (slp.result.linear_solver_iterations, x)
    assert out[False][0] == out[True][0]
    assert float(jnp.max(jnp.abs(out[False][1] - out[True][1]))) < 1e-9
    err = float(l2_difference(V, out[True][1], Diff().exact))
    assert err < 5e-3


def test_block_stencil_rejects_nonqualifying():
    # C0 space -> handled by the scalar stencil, not this module
    mesh = StructuredMesh([0, 0], [1, 1], (8, 8))
    from dune_pdelab_tpu import QkFEM, constraints
    from dune_pdelab_tpu.ops import ConvectionDiffusionFEM
    V = FunctionSpace(mesh, QkFEM(1, 2))
    go = GridOperator(V, ConvectionDiffusionFEM(Diff()),
                      constraints=constraints(True, V))
    assert compile_block_stencil(go) is None
    # variable (x-dependent) coefficients -> translation check must fail
    class VarCoeff(Diff):
        def c(self, x):
            return 1.0 + x[..., 0]
    Vdg = FunctionSpace(mesh, QkDGFEM(1, 2))
    go2 = GridOperator(Vdg, ConvectionDiffusionDG(VarCoeff()))
    assert compile_block_stencil(go2) is None
    # coefficient constant near the probes but not globally (central
    # inclusion): only the whole-domain random-vector check catches this
    # (regression: the CCFV Darcy solve silently used a wrong stencil)
    class Inclusion(Diff):
        def A(self, x):
            inside = ((jnp.abs(x[..., 0] - 0.5) < 0.2)
                      & (jnp.abs(x[..., 1] - 0.5) < 0.2))
            return jnp.where(inside, 1e-3, 1.0)
    mesh16 = StructuredMesh([0, 0], [1, 1], (16, 16))
    Vdg16 = FunctionSpace(mesh16, QkDGFEM(1, 2))
    go3 = GridOperator(Vdg16, ConvectionDiffusionDG(Inclusion()))
    assert compile_block_stencil(go3) is None


def test_pallas_block_stencil_interpret_parity():
    """Pallas lowering (interpret mode on CPU): fp32 parity with the
    general apply for Q1 and Q2 DG, including the x-edge un-wrap and side
    corrections."""
    from dune_pdelab_tpu.assembly.blockstencil_pallas import (
        try_pallas_block_stencil,
    )

    for fem, cells in ((QkDGFEM(1, 2), (9, 7)), (QkDGFEM(2, 2), (8, 6)),
                       (QkDGFEM(1, 3), (6, 5, 5))):
        dim = len(cells)
        mesh = StructuredMesh([0] * dim, [1] * dim, cells)
        V = FunctionSpace(mesh, fem)
        prob = ConvDiff() if dim == 2 else Diff()
        go = GridOperator(V, ConvectionDiffusionDG(prob))
        st = compile_block_stencil(go)
        pk = try_pallas_block_stencil(st, interpret=True)
        assert pk is not None
        z = jnp.asarray(
            np.random.default_rng(0).standard_normal(V.ndofs), jnp.float32)
        y1 = np.asarray(go.jacobian_apply(
            jnp.zeros(V.ndofs, jnp.float32), z))
        y2 = np.asarray(pk(z))
        rel = np.abs(y1 - y2).max() / max(1.0, np.abs(y1).max())
        assert rel < 1e-5, (fem, rel)


class VarCoeffProblem(ConvectionDiffusionProblem):
    """Variable diffusion + rotation + reaction (not translation invariant)."""

    def A(self, x):
        return 1.0 + 0.5 * jnp.sin(2 * x[..., 0]) * jnp.cos(x[..., 1])

    def b(self, x):
        return jnp.stack([x[..., 1], -x[..., 0]], axis=-1)

    def c(self, x):
        return 1.0 + x[..., 0]

    def f(self, x):
        return jnp.ones(x.shape[:-1])

    def g(self, x):
        return jnp.zeros(x.shape[:-1])


@pytest.mark.parametrize("k", [1, 2])
def test_block_ell_variable_coefficients(k):
    """Assembled block-ELL matches the matrix-free apply exactly for
    variable-coefficient SIPG (where the block stencil refuses)."""
    from dune_pdelab_tpu.assembly.blockstencil import assemble_block_ell

    mesh = StructuredMesh([0, 0], [1, 1], (9, 7))
    V = FunctionSpace(mesh, QkDGFEM(k, 2))
    go = GridOperator(V, ConvectionDiffusionDG(VarCoeffProblem()))
    assert compile_block_stencil(go) is None     # not translation invariant
    bm = assemble_block_ell(go)
    assert bm is not None
    z = jnp.asarray(np.random.default_rng(0).standard_normal(V.ndofs))
    d = float(jnp.max(jnp.abs(go.jacobian_apply(V.zero(), z) - bm(z))))
    assert d < 1e-10, d
    stats = bm.pattern_stats()
    assert stats["rows"] == V.ndofs and stats["ntaps"] == 5


def test_block_ell_assembled_solve_matches_matrix_free():
    """Assembled (matrix_free=False) DG solve through the backend picks the
    block-ELL path and matches the matrix-free solve (the
    matrix_free_linear.cc oracle for DG)."""
    mesh = StructuredMesh([0, 0], [1, 1], (16, 16))
    V = FunctionSpace(mesh, QkDGFEM(1, 2))
    go = GridOperator(V, ConvectionDiffusionDG(VarCoeffProblem()))
    out = {}
    for mf in (True, False):
        ls = LinearSolverBackend(solver="bicgstab", precond="block_jacobi",
                                 maxiter=5000, matrix_free=mf,
                                 use_stencil=False)
        slp = StationaryLinearProblemSolver(go, ls, reduction=1e-11)
        x = slp.apply(V.zero())
        assert slp.result.converged
        if not mf:
            mat = ls._setup_cache.get((id(go), "matval"))
            assert type(mat).__name__ == "BlockEllMatrix"
        out[mf] = x
    assert float(jnp.max(jnp.abs(out[True] - out[False]))) < 1e-8


@pytest.mark.parametrize("mode", ["vpu", "mxu", "mxu2", "mxu3", "vreg"])
def test_mm_block_stencil_interpret_parity(mode):
    """Mode-major Pallas lowering (interpret mode): fp32 parity with the
    general apply for 3D Q1 DG, including all face corrections.
    (vreg requires ny % 8 == 0; 16 rows also exercises interior y-blocks.)"""
    from dune_pdelab_tpu.assembly.blockstencil_mm import try_mm_block_stencil

    cells = (6, 16, 5) if mode == "vreg" else (6, 5, 5)
    mesh = StructuredMesh([0, 0, 0], [1, 1, 1], cells)
    V = FunctionSpace(mesh, QkDGFEM(1, 3))
    go = GridOperator(V, ConvectionDiffusionDG(Diff()))
    st = compile_block_stencil(go)
    lowered = try_mm_block_stencil(st, interpret=True, mode=mode)
    assert lowered is not None
    apply_flat, apply_mm, to_mm, from_mm = lowered
    rng = np.random.default_rng(0)
    for _ in range(2):
        z = jnp.asarray(rng.standard_normal(V.ndofs), jnp.float32)
        y1 = np.asarray(go.jacobian_apply(jnp.zeros(V.ndofs, jnp.float32), z))
        y2 = np.asarray(apply_flat(z))
        rel = np.abs(y1 - y2).max() / max(1.0, np.abs(y1).max())
        assert rel < 1e-5, rel
    # mm roundtrip is exact
    z = jnp.asarray(rng.standard_normal(V.ndofs), jnp.float32)
    assert float(jnp.max(jnp.abs(from_mm(to_mm(z), z.dtype) - z))) == 0.0


def test_mm_block_stencil_zblock_ring():
    """z-blocked slab ring with multiple grid steps (bz=2 on nz=6 -> 3
    steps): parity with the general apply across block boundaries."""
    from dune_pdelab_tpu.assembly.blockstencil_mm import try_mm_block_stencil

    mesh = StructuredMesh([0, 0, 0], [1, 1, 1], (6, 5, 6))
    V = FunctionSpace(mesh, QkDGFEM(1, 3))
    go = GridOperator(V, ConvectionDiffusionDG(Diff()))
    st = compile_block_stencil(go)
    assert st is not None
    rng = np.random.default_rng(1)
    z = jnp.asarray(rng.standard_normal(V.ndofs), jnp.float32)
    y1 = np.asarray(go.jacobian_apply(jnp.zeros(V.ndofs, jnp.float32), z))
    for mode in ("vpu", "mxu"):
        lowered = try_mm_block_stencil(st, interpret=True, bz=2, mode=mode)
        assert lowered is not None
        y2 = np.asarray(lowered[0](z))
        rel = np.abs(y1 - y2).max() / max(1.0, np.abs(y1).max())
        assert rel < 1e-5, (mode, rel)


def test_mm_resident_solver_path():
    """LinearSolverBackend 'stencil_mm' branch: CG iterates in mode-major
    layout (diag transformed with the residual); iterations and solution
    match the flat-operator solve exactly."""
    from dune_pdelab_tpu.assembly.blockstencil_mm import (
        try_mm_block_stencil, MMBlockStencil,
    )
    from dune_pdelab_tpu.solvers.linear import LinearSolverBackend

    mesh = StructuredMesh([0, 0, 0], [1, 1, 1], (6, 16, 5))
    V = FunctionSpace(mesh, QkDGFEM(1, 3))
    go = GridOperator(V, ConvectionDiffusionDG(Diff()))
    st = compile_block_stencil(go)
    st_mm = MMBlockStencil(try_mm_block_stencil(st, interpret=True,
                                                mode="mxu"))
    ls = LinearSolverBackend(solver="cg", precond="jacobi")
    # fp32 throughout: the mm kernels are fp32 lowerings, so the flat
    # comparison runs through the SAME lowering (apply_flat) in fp32
    b = go.residual(V.zero()).astype(jnp.float32)
    x0 = jnp.zeros_like(b)
    setup = {"diag": go.jacobian_diagonal(V.zero()).astype(jnp.float32)}
    fn_mm = ls._build_solve(st_mm, assembled="stencil_mm")
    z1, s1 = fn_mm(b, setup, 1e-10, x0)
    fn_flat = ls._build_solve(st_mm, assembled="stencil")
    z2, s2 = fn_flat(b, setup, 1e-10, x0)
    assert int(s1.iterations) == int(s2.iterations), (
        int(s1.iterations), int(s2.iterations))
    rel = float(jnp.linalg.norm(z1 - z2) / jnp.linalg.norm(z2))
    assert rel < 1e-4, rel


def test_block_stencil_diagonal_matches_probed():
    """BlockStencilOperator.diagonal (diag of the zero-offset tap plus the
    per-side dD boundary diagonals) equals go.jacobian_diagonal exactly —
    it feeds the Jacobi/Chebyshev setup without the probing jit whose
    scatter maps exceed remote-compile limits at 128^3 DG."""
    for dim, cells in [(2, (6, 5)), (3, (6, 6, 6))]:
        mesh = StructuredMesh([0] * dim, [1] * dim, cells)
        V = FunctionSpace(mesh, QkDGFEM(1, dim))
        go = GridOperator(V, ConvectionDiffusionDG(Diff()))
        st = compile_block_stencil(go)
        assert st is not None, dim
        d1 = np.asarray(st.diagonal(dtype=jnp.result_type(float)))
        d2 = np.asarray(go.jacobian_diagonal(V.zero()))
        assert np.allclose(d1, d2, atol=1e-12), dim
