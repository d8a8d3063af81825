"""Hanging nodes + local refinement tests.

Oracles (mirroring the reference test strategy, SURVEY.md section 4):
  * lattice/topology unit checks of AdaptiveMesh (refinement closure,
    vertex dedup, hanging-constraint rows vs hand-computed values),
  * constraint consistency: interpolation of a linear function is
    hanging-consistent, and the Q1 solver reproduces linear solutions
    exactly on locally refined meshes,
  * matrix-free (jvp) vs assembled-Jacobian parity with the folded
    triple product P^T J P (reference: assemblerutilities.hh:501-586),
  * adaptive error-per-DOF beats uniform refinement on a corner
    singularity (the reference adaptivity value proposition,
    dune/pdelab/test/testadaptivity.cc).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from dune_pdelab_tpu import (
    StructuredMesh, FunctionSpace, QkFEM, GridOperator, constraints,
)
from dune_pdelab_tpu.mesh.adaptive import AdaptiveMesh
from dune_pdelab_tpu.ops import (
    ConvectionDiffusionProblem, ConvectionDiffusionFEM,
)
from dune_pdelab_tpu.solvers import SEQ_CG_Jacobi
from dune_pdelab_tpu.solvers.stationary import StationaryLinearProblemSolver
from dune_pdelab_tpu.space.functions import l2_difference
from dune_pdelab_tpu.adaptivity.local import (
    adapt_local, evaluate_fe, volume_residual_indicator,
)
from dune_pdelab_tpu.adaptivity.adaptivity import error_fraction


# ---------------------------------------------------------------- mesh ----
def test_refine_one_cell_2d():
    m = AdaptiveMesh([0, 0], [1, 1], (2, 2))
    assert m.nelements == 4
    m2 = m.refine([True, False, False, False])
    assert m2.nelements == 3 + 4
    assert m2.max_level == 1
    # volumes sum to 1
    cc = m2.element_corner_coords()
    vol = np.prod(cc[:, -1] - cc[:, 0], axis=1).sum()
    assert np.isclose(vol, 1.0)


def test_balance_closure_2d():
    m = AdaptiveMesh([0, 0], [1, 1], (4, 1))
    # refine cell 0 twice: cell 1 must be refined by closure on 2nd pass
    m1 = m.refine([True, False, False, False])
    marks = np.zeros(m1.nelements, bool)
    # mark one of the children of old cell 0 (level-1 cells)
    marks[np.nonzero(m1.levels == 1)[0][:1]] = True
    m2 = m1.refine(marks)
    # no leaf pair across a face may differ by 2+ levels
    verts, ev = m2.vertices()
    for e in range(m2.nelements):
        s = m2.cell_size(m2.levels[e])
        for d in range(m2.dim):
            for side in (-1, 1):
                probe = m2.origins[e].copy()
                probe[d] += -1 if side == -1 else s
                nb = m2.find_leaf(probe)
                if nb is not None:
                    assert abs(int(m2.levels[nb]) - int(m2.levels[e])) <= 1


def test_hanging_constraints_2d_values():
    m = AdaptiveMesh([0, 0], [1, 1], (2, 2)).refine([True, False, False,
                                                     False])
    rows, cols, w = m.hanging_constraints()
    verts, _ = m.vertices()
    coords = m.vertex_coords()
    # hanging vertices of this config: (0.5, 0.25) and (0.25, 0.5)
    hv = sorted(map(tuple, coords[np.unique(rows)].round(6).tolist()))
    assert hv == [(0.25, 0.5), (0.5, 0.25)]
    # each constrained to the midpoint-adjacent coarse edge endpoints, w=1/2
    for r in np.unique(rows):
        sel = rows == r
        assert np.allclose(w[sel], 0.5)
        pc = coords[cols[sel]]
        assert np.allclose(pc.mean(axis=0), coords[r])


def test_hanging_transitive_chain_2d():
    """Level-0/1/2 chain: constraints must resolve to non-hanging parents."""
    m = AdaptiveMesh([0, 0], [1, 1], (2, 1)).refine([True, False])
    marks = np.zeros(m.nelements, bool)
    # refine the two rightmost children of cell 0 (touching cell 1)... use
    # level-1 cells with max x-origin
    lvl1 = np.nonzero(m.levels == 1)[0]
    xs = m.origins[lvl1, 0]
    marks[lvl1[xs == xs.max()]] = True
    m2 = m.refine(marks)
    rows, cols, w = m2.hanging_constraints()
    assert not np.isin(cols, rows).any()
    # weights per row sum to 1 (partition of unity of interpolation)
    for r in np.unique(rows):
        assert np.isclose(w[rows == r].sum(), 1.0)


# --------------------------------------------------------- constraints ----
class LinearProblem(ConvectionDiffusionProblem):
    def g(self, x):
        return 2.0 * x[..., 0] - 3.0 * x[..., 1] + 1.0

    def exact(self, p):
        return 2.0 * p[:, 0] - 3.0 * p[:, 1] + 1.0


class SmoothProblem(ConvectionDiffusionProblem):
    def f(self, x):
        return 5 * np.pi**2 * jnp.sin(np.pi * x[..., 0]) * \
            jnp.cos(2 * np.pi * x[..., 1])

    def g(self, x):
        return jnp.sin(np.pi * x[..., 0]) * jnp.cos(2 * np.pi * x[..., 1])

    def exact(self, p):
        return np.sin(np.pi * p[:, 0]) * np.cos(2 * np.pi * p[:, 1])


def _solve(mesh, problem, reduction=1e-12):
    from dune_pdelab_tpu.constraints.dirichlet import interpolate_dirichlet
    V = FunctionSpace(mesh, QkFEM(1, mesh.dim))
    cg = constraints(problem.dirichlet_bctype(), V)
    go = GridOperator(V, ConvectionDiffusionFEM(problem), constraints=cg,
                      skip_boundary=True)
    x0 = interpolate_dirichlet(
        lambda q: np.asarray(problem.g(jnp.asarray(q))), V, cg, V.zero())
    x = StationaryLinearProblemSolver(go, SEQ_CG_Jacobi(), verbose=0,
                                      reduction=reduction).apply(x0)
    return V, cg, go, x


def _mesh_2d_refined():
    m = AdaptiveMesh([0, 0], [1, 1], (4, 4))
    marks = np.zeros(m.nelements, bool)
    marks[[0, 5, 10]] = True
    return m.refine(marks)


def test_linear_exactness_on_hanging_mesh_2d():
    mesh = _mesh_2d_refined()
    p = LinearProblem()
    V, cg, go, x = _solve(mesh, p)
    assert cg.has_affine
    err = float(l2_difference(V, x, p.exact))
    assert err < 1e-9, err


def test_linear_exactness_on_hanging_mesh_3d():
    m = AdaptiveMesh([0, 0, 0], [1, 1, 1], (2, 2, 2))
    mesh = m.refine([True] + [False] * 7)

    class Lin3(ConvectionDiffusionProblem):
        def g(self, x):
            return x[..., 0] + 2 * x[..., 1] - x[..., 2]

        def exact(self, p):
            return p[:, 0] + 2 * p[:, 1] - p[:, 2]

    p = Lin3()
    V, cg, go, x = _solve(mesh, p)
    assert cg.has_affine
    err = float(l2_difference(V, x, p.exact))
    assert err < 1e-9, err


def test_jvp_vs_assembled_parity_hanging():
    mesh = _mesh_2d_refined()
    p = SmoothProblem()
    V = FunctionSpace(mesh, QkFEM(1, 2))
    cg = constraints(p.dirichlet_bctype(), V)
    go = GridOperator(V, ConvectionDiffusionFEM(p), constraints=cg,
                      skip_boundary=True)
    A = go.jacobian(V.zero())
    rng = np.random.default_rng(3)
    for _ in range(3):
        z = jnp.asarray(rng.standard_normal(V.ndofs))
        y1 = go.jacobian_apply(V.zero(), z)
        y2 = A @ z
        assert float(jnp.linalg.norm(y1 - y2)) < 1e-10 * float(
            jnp.linalg.norm(y1))


def test_assembled_hanging_jacobian_symmetric():
    mesh = _mesh_2d_refined()
    p = SmoothProblem()
    V = FunctionSpace(mesh, QkFEM(1, 2))
    cg = constraints(p.dirichlet_bctype(), V)
    go = GridOperator(V, ConvectionDiffusionFEM(p), constraints=cg,
                      skip_boundary=True)
    A = np.asarray(go.jacobian(V.zero()).todense())
    assert np.abs(A - A.T).max() < 1e-11


def test_smooth_convergence_adaptive_matches_uniform():
    """All-marked adaptive refinement == uniform: same L2 error."""
    p = SmoothProblem()
    m0 = AdaptiveMesh([0, 0], [1, 1], (8, 8))
    m1 = m0.refine(np.ones(m0.nelements, bool))
    V1, _, _, x1 = _solve(m1, p)
    e_adapt = float(l2_difference(V1, x1, p.exact))

    mu = StructuredMesh([0, 0], [1, 1], (16, 16))
    Vu, _, _, xu = _solve(mu, p)
    e_unif = float(l2_difference(Vu, xu, p.exact))
    assert np.isclose(e_adapt, e_unif, rtol=1e-6), (e_adapt, e_unif)


class CornerSingularity(ConvectionDiffusionProblem):
    """u = r^lam (singular gradient at the origin corner), f = -lap u."""
    lam = 0.6

    def _r(self, x):
        return jnp.sqrt(x[..., 0]**2 + x[..., 1]**2 + 1e-30)

    def f(self, x):
        # -lap r^lam = -lam^2 r^(lam-2)
        r = self._r(x)
        return -self.lam**2 * r**(self.lam - 2.0)

    def g(self, x):
        return self._r(x)**self.lam

    def exact(self, p):
        return (np.sqrt(p[:, 0]**2 + p[:, 1]**2) + 1e-30)**self.lam


def test_adaptive_beats_uniform_error_per_dof():
    """Corner singularity: Doerfler-marked local refinement reaches lower
    L2 error than uniform refinement at comparable DOF count."""
    p = CornerSingularity()

    # reference: uniform 16x16 (289 DOFs)
    Vu, _, _, xu = _solve(StructuredMesh([0, 0], [1, 1], (16, 16)), p,
                          reduction=1e-10)
    e_unif = float(l2_difference(Vu, xu, p.exact))

    # adaptive loop from 8x8 until DOF parity with the uniform mesh
    mesh = AdaptiveMesh([0, 0], [1, 1], (8, 8))
    V, cg, go, x = _solve(mesh, p, reduction=1e-10)
    for _ in range(12):
        if V.ndofs >= Vu.ndofs:
            break
        eta2 = volume_residual_indicator(go, p, x)
        thr = error_fraction(np.asarray(eta2), 0.7)
        marks = np.asarray(eta2) >= thr
        V, x = adapt_local(V, x, marks)
        mesh = V.mesh
        V, cg, go, x = _solve(mesh, p, reduction=1e-10)
    e_adapt = float(l2_difference(V, x, p.exact))
    assert V.ndofs <= 1.6 * Vu.ndofs, (V.ndofs, Vu.ndofs)
    assert e_adapt < e_unif, (e_adapt, V.ndofs, e_unif, Vu.ndofs)


def test_transfer_preserves_linear():
    mesh = _mesh_2d_refined()
    V = FunctionSpace(mesh, QkFEM(1, 2))
    x = V.interpolate(lambda q: 3.0 * q[:, 0] - q[:, 1])
    marks = np.zeros(mesh.nelements, bool)
    marks[:4] = True
    V2, x2 = adapt_local(V, x, marks)
    xref = V2.interpolate(lambda q: 3.0 * q[:, 0] - q[:, 1])
    assert float(jnp.abs(x2 - xref).max()) < 1e-12


@pytest.mark.fast
def test_coarsen_roundtrip_and_balance():
    """Coarsening merges sibling-complete marked groups, cancels merges
    that would break 2:1 balance (reference: mark_grid coarsen direction,
    adaptivity.hh:1029)."""
    m0 = AdaptiveMesh([0, 0], [1, 1], (4, 4))
    marks = np.zeros(m0.nelements, bool)
    marks[:4] = True
    m1 = m0.refine(marks)
    # full coarsen returns to the base mesh
    m2 = m1.coarsen(np.ones(m1.nelements, bool))
    assert m2.nelements == m0.nelements
    assert m2.max_level == 0
    # two-level mesh: coarsening level-1 groups adjacent to level-2 leaves
    # is cancelled; elsewhere it proceeds
    marks = np.zeros(m1.nelements, bool)
    marks[np.nonzero(m1.levels == 1)[0][:1]] = True
    m3 = m1.refine(marks)
    m4 = m3.coarsen(m3.levels == 1)
    assert m4.nelements < m3.nelements        # some merges applied
    assert (m4.levels == 2).sum() == 4        # finest cells untouched
    assert (m4.levels == 1).sum() > 0         # balance guard kept some L1


@pytest.mark.fast
def test_adapt_local_with_coarsening_transfer():
    """Mixed refine+coarsen through adapt_local transfers P1 exactly."""
    from dune_pdelab_tpu.adaptivity.local import adapt_local

    m0 = AdaptiveMesh([0, 0], [1, 1], (4, 4))
    marks = np.zeros(m0.nelements, bool)
    marks[:4] = True
    m1 = m0.refine(marks)
    V1 = FunctionSpace(m1, QkFEM(1, 2))
    lin = lambda p: 2 * np.atleast_2d(p)[:, 0] - 0.5 * np.atleast_2d(p)[:, 1] + 1
    x1 = V1.interpolate(lambda q: lin(q))
    rm = np.zeros(m1.nelements, bool)
    rm[-2:] = True
    cm = np.zeros(m1.nelements, bool)
    cm[:8] = True
    Vm, xm = adapt_local(V1, x1, rm, coarsen_marks=cm)
    xe = Vm.interpolate(lambda q: lin(q))
    assert float(jnp.max(jnp.abs(xm - xe))) < 1e-12
