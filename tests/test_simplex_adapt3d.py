"""3D newest-vertex (Traxler typed) bisection: conforming closure,
exact P1 transfer, and an adaptive Fichera-corner solve beating uniform
refinement per DOF.

reference counterpart: dimension-generic adapt_grid on simplicial grids
(dune/pdelab/adaptivity/adaptivity.hh:632) — this closes the last
adaptivity restriction (bisection was 2D-only through round 3).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from dune_pdelab_tpu import FunctionSpace, GridOperator, constraints
from dune_pdelab_tpu.fe.basis import PkFEM
from dune_pdelab_tpu.mesh.simplex import SimplexMesh
from dune_pdelab_tpu.mesh.structured import StructuredMesh
from dune_pdelab_tpu.ops import (
    ConvectionDiffusionProblem, ConvectionDiffusionFEM,
)
from dune_pdelab_tpu.space.functions import l2_difference


def _tet_box(n):
    return SimplexMesh.from_structured(
        StructuredMesh([0, 0, 0], [1, 1, 1], (n, n, n))
    ).oriented_for_bisection()


def _conforming(m):
    _, _, counts = m.faces()
    return int(counts.max()) <= 2


def _total_volume(m):
    cc = m.element_corner_coords()
    J = np.stack([cc[:, 3 - i] - cc[:, 0] for i in range(3)], axis=-1)
    return float(np.abs(np.linalg.det(J)).sum() / 6)


@pytest.mark.fast
def test_bisection3d_conforming_and_conservative():
    m = _tet_box(3)
    v0 = _total_volume(m)
    rng = np.random.default_rng(0)
    for _ in range(3):
        marks = rng.random(m.nelements) < 0.3
        m, _tr = m.refine_bisection(marks)
        assert _conforming(m)
        assert abs(_total_volume(m) - v0) < 1e-12
    # no degenerate children (Maubach: finitely many similarity classes)
    cc = m.element_corner_coords()
    J = np.stack([cc[:, 3 - i] - cc[:, 0] for i in range(3)], axis=-1)
    assert float(np.abs(np.linalg.det(J)).min()) > 1e-12


@pytest.mark.fast
def test_bisection3d_p1_transfer_exact():
    """P1 transfer (sequential midpoint resolution) reproduces affine
    functions exactly, even through multi-level closure chains."""
    from dune_pdelab_tpu.adaptivity.local import adapt_local_simplex
    m = _tet_box(2)
    V = FunctionSpace(m, PkFEM(1, 3))
    f = lambda p: 2.0 * p[:, 0] - 0.7 * p[:, 1] + 0.3 * p[:, 2] + 1.0
    x = V.interpolate(f)
    rng = np.random.default_rng(1)
    for _ in range(2):
        marks = rng.random(V.mesh.nelements) < 0.4
        V, x = adapt_local_simplex(V, x, marks)
    assert np.allclose(np.asarray(x), np.asarray(V.interpolate(f)),
                       atol=1e-13)


@pytest.mark.fast
def test_bisection3d_solve_on_adapted_mesh():
    """A Poisson solve on an adapted tet mesh matches the analytic
    solution at the expected rate (the mesh stays a valid assembly
    substrate through bisection: orientation-free geometry paths)."""
    class P(ConvectionDiffusionProblem):
        def exact(self, p):
            return p[:, 0] ** 2 + p[:, 1] ** 2 + p[:, 2] ** 2

        def f(self, x):
            return -6.0 * jnp.ones(x.shape[:-1], x.dtype)

        def g(self, x):
            return (x[..., 0] ** 2 + x[..., 1] ** 2 + x[..., 2] ** 2)

    from dune_pdelab_tpu import (
        StationaryLinearProblemSolver, interpolate_dirichlet,
    )
    from dune_pdelab_tpu.solvers import LinearSolverBackend
    p = P()
    m = _tet_box(3)

    def solve(mm):
        V = FunctionSpace(mm, PkFEM(1, 3))
        cg_ = constraints(p.dirichlet_bctype(), V)
        go = GridOperator(V, ConvectionDiffusionFEM(p), constraints=cg_)
        ls = LinearSolverBackend(solver="cg", precond="jacobi",
                                 maxiter=6000)
        slp = StationaryLinearProblemSolver(go, ls, reduction=1e-11,
                                            verbose=0)
        x0 = interpolate_dirichlet(
            lambda q: np.asarray(p.g(jnp.asarray(q))), V, cg_, V.zero())
        x = slp.apply(x0)
        assert slp.result.converged
        return float(l2_difference(V, x, p.exact))

    # d=3 all-marked bisection generations halve h (2^d volume); compare
    # two successive halvings in the asymptotic regime: O(h^2) => ~4x
    errs = []
    for gen in range(7):
        if gen in (0, 3, 6):
            errs.append(solve(m))
        if gen < 6:
            m, _tr = m.refine_bisection(np.ones(m.nelements, bool))
            assert _conforming(m)
    assert errs[2] < 0.35 * errs[1], errs


@pytest.mark.fast
@pytest.mark.slow
def test_bisection3d_adaptive_beats_uniform_fichera():
    """Fichera-corner Poisson (singular at the reentrant corner):
    residual-driven adaptive bisection reaches a lower L2 error than
    uniform refinement at comparable DOF count."""
    from dune_pdelab_tpu import (
        StationaryLinearProblemSolver, interpolate_dirichlet,
    )
    from dune_pdelab_tpu.adaptivity.local import adapt_local_simplex
    from dune_pdelab_tpu.solvers import LinearSolverBackend

    # u = r^alpha-ish singular profile via the distance to the corner at
    # the reentrant edge of the Fichera domain [-1,1]^3 \\ [0,1]^3
    alpha = 0.3

    def u_exact(p):
        r = np.linalg.norm(p, axis=-1)
        return r ** alpha

    class P(ConvectionDiffusionProblem):
        def exact(self, p):
            return u_exact(p)

        def f(self, x):
            # -Laplace(r^a) = -a(a+1) r^(a-2)  (3D radial)
            r = jnp.sqrt(jnp.sum(x * x, axis=-1) + 1e-30)
            return -alpha * (alpha + 1.0) * r ** (alpha - 2.0)

        def g(self, x):
            r = jnp.sqrt(jnp.sum(x * x, axis=-1))
            return r ** alpha

    def fichera(n):
        sm = StructuredMesh([-1, -1, -1], [1, 1, 1], (n, n, n))
        m = SimplexMesh.from_structured(sm)
        keep = ~np.all(m.element_centers() > 0.0, axis=1)
        return m.submesh(keep).oriented_for_bisection()

    def solve(V):
        p = P()
        cg_ = constraints(p.dirichlet_bctype(), V)
        go = GridOperator(V, ConvectionDiffusionFEM(p), constraints=cg_)
        ls = LinearSolverBackend(solver="cg", precond="jacobi",
                                 maxiter=6000)
        slp = StationaryLinearProblemSolver(go, ls, reduction=1e-10,
                                            verbose=0)
        x0 = interpolate_dirichlet(
            lambda q: np.asarray(p.g(jnp.asarray(q))), V, cg_, V.zero())
        x = slp.apply(x0)
        return x, float(l2_difference(V, x, u_exact))

    # adaptive: estimator-driven Doerfler marking (3D facet-jump + source
    # indicator)
    from dune_pdelab_tpu.adaptivity.local import p1_edge_jump_indicator
    p = P()
    V = FunctionSpace(fichera(2), PkFEM(1, 3))
    x, _ = solve(V)
    for _ in range(8):
        eta2 = p1_edge_jump_indicator(
            V, x, f=lambda c: np.asarray(p.f(jnp.asarray(c))))
        order = np.argsort(eta2)[::-1]
        csum = np.cumsum(eta2[order])
        nmark = int(np.searchsorted(csum, 0.6 * csum[-1])) + 1
        marks = order[:nmark]
        V, x = adapt_local_simplex(V, x, marks)
        x, _ = solve(V)
    x_ad, err_ad = solve(V)
    nd_ad = V.ndofs

    # uniform at comparable (>=) DOF count
    n_uni = 4
    Vu = FunctionSpace(fichera(n_uni), PkFEM(1, 3))
    while Vu.ndofs < nd_ad:
        n_uni += 2
        Vu = FunctionSpace(fichera(n_uni), PkFEM(1, 3))
    _, err_uni = solve(Vu)
    assert err_ad < err_uni, (err_ad, err_uni, nd_ad, Vu.ndofs)


@pytest.mark.fast
def test_bisection3d_traxler_compatibility():
    """Kuhn-ordered type-0 meshes are reflection-compatible: uniform
    bisection grows by EXACTLY 2x per generation (no closure cascade) and
    the worst shape measure vol/h^3 stays constant (finitely many
    similarity classes) — the property the (wrong) half-remembered child
    ordering violated (shapes degenerated 10x per 3 generations)."""
    m = _tet_box(2)
    cc = m.element_corner_coords()
    J = np.stack([cc[:, 3 - i] - cc[:, 0] for i in range(3)], axis=-1)
    import itertools
    def minshape(mm):
        c2 = mm.element_corner_coords()
        J2 = np.stack([c2[:, 3 - i] - c2[:, 0] for i in range(3)], axis=-1)
        vol = np.abs(np.linalg.det(J2)) / 6
        emax = np.zeros(mm.nelements)
        for a, b in itertools.combinations(range(4), 2):
            emax = np.maximum(emax,
                              np.linalg.norm(c2[:, a] - c2[:, b], axis=1))
        return float((vol / emax**3).min())

    q0 = minshape(m)
    for gen in range(6):
        E0 = m.nelements
        m, _ = m.refine_bisection(np.ones(m.nelements, bool))
        assert m.nelements == 2 * E0, (gen, E0, m.nelements)
    assert minshape(m) > 0.9 * q0, (minshape(m), q0)
