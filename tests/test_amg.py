"""Algebraic multigrid (smoothed aggregation) tests.

The reference reaches AMG through dune-istl (ISTLBackend_SEQ_CG_AMG_*,
seqistlsolverbackend.hh:829-1060); its defining property is mesh-
independence: bounded Krylov iterations on ANY assembled operator. These
tests pin that property on the three mesh families where the framework's
GeometricMultigrid does not apply (simplex, adaptive/hanging-node,
unstructured-style), plus iteration flatness under refinement and the
near-nullspace mechanism (rigid body modes for elasticity).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from dune_pdelab_tpu import (
    StructuredMesh, FunctionSpace, GridOperator, constraints,
    StationaryLinearProblemSolver, QkFEM,
)
from dune_pdelab_tpu.space.space import VectorSpace
from dune_pdelab_tpu.mesh import SimplexMesh
from dune_pdelab_tpu.mesh.adaptive import AdaptiveMesh
from dune_pdelab_tpu.fe import PkFEM
from dune_pdelab_tpu.ops import ConvectionDiffusionProblem, ConvectionDiffusionFEM
from dune_pdelab_tpu.ops.elasticity import (
    LinearElasticity, LinearElasticityParameters,
)
from dune_pdelab_tpu.linalg.amg import AlgebraicMultigrid
from dune_pdelab_tpu.linalg.krylov import cg
from dune_pdelab_tpu.solvers import SEQ_CG_AMG
from dune_pdelab_tpu.space.functions import l2_difference

pytestmark = pytest.mark.fast


class _Problem(ConvectionDiffusionProblem):
    def f(self, x):
        return 5 * np.pi**2 * jnp.sin(np.pi * x[..., 0]) * jnp.cos(
            2 * np.pi * x[..., 1])

    def g(self, x):
        return jnp.sin(np.pi * x[..., 0]) * jnp.cos(
            2 * np.pi * x[..., 1]) + x[..., 0]

    def exact(self, p):
        return np.sin(np.pi * p[:, 0]) * np.cos(2 * np.pi * p[:, 1]) + p[:, 0]


def _poisson_go(mesh, fem, **kw):
    p = _Problem()
    V = FunctionSpace(mesh, fem)
    cg_ = constraints(p.dirichlet_bctype(), V)
    return V, GridOperator(V, ConvectionDiffusionFEM(p),
                           constraints=cg_, **kw)


def _amg_cg_iters(go, amg=None):
    amg = amg or AlgebraicMultigrid().setup_from_grid_operator(go)
    x0 = go.space.zero()
    b = jnp.asarray(np.random.default_rng(1).standard_normal(go.space.ndofs))
    z, s = cg(lambda q: go.jacobian_apply(x0, q), b, M=amg.apply, tol=1e-10)
    res = float(jnp.linalg.norm(go.jacobian_apply(x0, z) - b)
                ) / float(jnp.linalg.norm(b))
    assert res < 1e-8, res
    return int(s.iterations)


def test_iterations_flat_under_refinement():
    """The AMG property: Krylov iterations stay bounded as h -> 0
    (Jacobi grows ~1/h)."""
    iters = []
    for n in (16, 32, 64, 128):
        V, go = _poisson_go(StructuredMesh([0, 0], [1, 1], (n, n)),
                            QkFEM(1, 2))
        iters.append(_amg_cg_iters(go))
    assert max(iters) <= 25, iters
    assert max(iters) - min(iters) <= 4, iters


def test_hierarchy_coarsens_geometrically():
    """Aggregation must actually coarsen (~9x/level for Q1 2D) and the
    Galerkin hierarchy must stay sparse (operator complexity < 1.5);
    Dirichlet identity rows must NOT pile up as permanent singletons."""
    V, go = _poisson_go(StructuredMesh([0, 0], [1, 1], (64, 64)), QkFEM(1, 2))
    amg = AlgebraicMultigrid().setup_from_grid_operator(go)
    info = amg.hierarchy_info()
    sizes = info["sizes"]
    assert len(sizes) >= 3
    for a, b in zip(sizes, sizes[1:]):
        assert b <= a / 3, sizes
    assert info["operator_complexity"] < 1.5, info


def test_simplex_p1_bounded_iterations():
    """Simplex meshes have no GeometricMultigrid — AMG is the scalable
    preconditioner there. Iterations flat across refinement."""
    iters = []
    for n in (16, 32, 64):
        sm = SimplexMesh.from_structured(
            StructuredMesh([0, 0], [1, 1], (n, n)))
        V, go = _poisson_go(sm, PkFEM(1, 2))
        iters.append(_amg_cg_iters(go))
    assert max(iters) <= 25, iters
    assert iters[-1] - iters[0] <= 5, iters


def test_adaptive_hanging_nodes():
    """AMG on the hanging-node-constrained operator (P^T A P with affine
    rows folded in): still bounded iterations."""
    m = AdaptiveMesh([0, 0], [1, 1], (8, 8))
    for _ in range(3):
        c = m.element_centers()
        m = m.refine((c[:, 0] < 0.4) & (c[:, 1] < 0.4))
    V, go = _poisson_go(m, QkFEM(1, 2), skip_boundary=True)
    assert _amg_cg_iters(go) <= 25


def test_backend_solves_simplex_poisson():
    """End-to-end: SEQ_CG_AMG through StationaryLinearProblemSolver on a
    simplex mesh, checked against the analytic solution."""
    p = _Problem()
    sm = SimplexMesh.from_structured(StructuredMesh([0, 0], [1, 1], (32, 32)))
    V = FunctionSpace(sm, PkFEM(1, 2))
    cg_ = constraints(p.dirichlet_bctype(), V)
    go = GridOperator(V, ConvectionDiffusionFEM(p), constraints=cg_)
    from dune_pdelab_tpu import interpolate_dirichlet
    x0 = interpolate_dirichlet(lambda q: np.asarray(p.g(jnp.asarray(q))),
                               V, cg_, V.zero())
    slp = StationaryLinearProblemSolver(go, SEQ_CG_AMG(), reduction=1e-10)
    x = slp.apply(x0)
    err = float(l2_difference(V, x, p.exact))
    assert err < 5e-3, err          # P1 on 32x32: C*h^2 ~ 1e-3
    assert slp.result.converged


def test_elasticity_rigid_body_modes_help():
    """Near-nullspace mechanism: for elasticity, rigid body modes
    (2 translations + rotation) as B give a markedly better coarse space
    than the default constants (the reason ISTL AMG on elasticity needs
    its vector-aware aggregation)."""
    mesh = StructuredMesh([0, 0], [1, 1], (24, 24))
    W = VectorSpace(mesh, QkFEM(1, 2))

    class P(LinearElasticityParameters):
        def g(self, x):
            return jnp.zeros_like(x)

        def f(self, x):
            return jnp.stack([jnp.ones_like(x[..., 0]),
                              jnp.zeros_like(x[..., 0])], axis=-1)

    prm = P(lam=10.0, mu=1.0)
    cg_ = constraints((True, True), W)
    go = GridOperator(W, LinearElasticity(prm), constraints=cg_)

    # rigid body modes on the child-major (component-stacked) DOF layout
    n1 = W.children[0].ndofs
    xy = W.children[0].dof_coords()
    B = np.zeros((W.ndofs, 3))
    B[:n1, 0] = 1.0                      # translate x
    B[n1:, 1] = 1.0                      # translate y
    B[:n1, 2] = -xy[:, 1]                # rotation (-y, x)
    B[n1:, 2] = xy[:, 0]

    it_rbm = _amg_cg_iters(go, AlgebraicMultigrid(
        near_nullspace=B).setup_from_grid_operator(go))
    it_const = _amg_cg_iters(go, AlgebraicMultigrid(
    ).setup_from_grid_operator(go))
    assert it_rbm < it_const, (it_rbm, it_const)
    assert it_rbm <= 35, it_rbm


def test_chebyshev_smoother():
    """Chebyshev-smoothed AMG converges at least as well as damped
    Jacobi smoothing (and stays SPD for CG)."""
    V, go = _poisson_go(StructuredMesh([0, 0], [1, 1], (64, 64)), QkFEM(1, 2))
    it_cheb = _amg_cg_iters(go, AlgebraicMultigrid(
        smoother="chebyshev").setup_from_grid_operator(go))
    it_jac = _amg_cg_iters(go)
    assert it_cheb <= it_jac, (it_cheb, it_jac)


def test_vcycle_is_linear_and_spd():
    """M must be linear and symmetric positive definite for use inside CG:
    check M(a r1 + b r2) == a M r1 + b M r2 and <M r1, r2> == <r1, M r2>,
    <r, M r> > 0 on random vectors."""
    V, go = _poisson_go(StructuredMesh([0, 0], [1, 1], (16, 16)), QkFEM(1, 2))
    amg = AlgebraicMultigrid().setup_from_grid_operator(go)
    rng = np.random.default_rng(3)
    r1 = jnp.asarray(rng.standard_normal(V.ndofs))
    r2 = jnp.asarray(rng.standard_normal(V.ndofs))
    lin = amg.apply(2.0 * r1 - 3.0 * r2) - (
        2.0 * amg.apply(r1) - 3.0 * amg.apply(r2))
    assert float(jnp.linalg.norm(lin)) < 1e-10
    s12 = float(jnp.dot(amg.apply(r1), r2))
    s21 = float(jnp.dot(r1, amg.apply(r2)))
    assert abs(s12 - s21) < 1e-8 * max(abs(s12), 1.0), (s12, s21)
    assert float(jnp.dot(r1, amg.apply(r1))) > 0


def test_tet_p1_amg():
    """3D tetrahedral P1 Poisson: AMG stays bounded (no GMG on tets)."""
    sm = SimplexMesh.from_structured(
        StructuredMesh([0, 0, 0], [1, 1, 1], (8, 8, 8)))
    p = _Problem()
    V = FunctionSpace(sm, PkFEM(1, 3))
    cg_ = constraints(True, V)
    go = GridOperator(V, ConvectionDiffusionFEM(p), constraints=cg_,
                      skip_boundary=True)
    it = _amg_cg_iters(go)
    assert it <= 30, it


def test_amg_inside_newton_nonlinear():
    """AMG as the Newton linear-solver preconditioner on a NONLINEAR
    problem: the hierarchy rebuilds per linearization point (is_linear
    False -> no stale-hierarchy reuse) and Newton converges quadratically
    to the manufactured solution."""
    from dune_pdelab_tpu import interpolate_dirichlet
    from dune_pdelab_tpu.ops import (
        NonlinearConvectionDiffusionProblem, NonlinearConvectionDiffusionFEM,
    )
    from dune_pdelab_tpu.solvers import NewtonMethod

    class Porous(NonlinearConvectionDiffusionProblem):
        C = 1.5

        def w(self, x, u):
            return u * u

        def f(self, x, u):
            a = np.pi
            s0, c0 = jnp.sin(a * x[..., 0]), jnp.cos(a * x[..., 0])
            s1, c1 = jnp.sin(a * x[..., 1]), jnp.cos(a * x[..., 1])
            ue = s0 * s1 + self.C
            grad2 = a**2 * (c0**2 * s1**2 + s0**2 * c1**2)
            return -2 * grad2 + 4 * a**2 * ue * (ue - self.C)

        def g(self, x):
            return jnp.sin(np.pi * x[..., 0]) * jnp.sin(
                np.pi * x[..., 1]) + self.C

        def exact(self, p):
            return np.sin(np.pi * p[:, 0]) * np.sin(
                np.pi * p[:, 1]) + self.C

    p = Porous()
    mesh = StructuredMesh([0, 0], [1, 1], (16, 16))
    V = FunctionSpace(mesh, QkFEM(1, 2))
    cg_ = constraints(p.dirichlet_bctype(), V)
    go = GridOperator(V, NonlinearConvectionDiffusionFEM(p),
                      constraints=cg_)
    xc = V.interpolate(lambda pts: np.full(len(pts), p.C))
    x0 = interpolate_dirichlet(p.g, V, cg_, xc)
    newton = NewtonMethod(go, SEQ_CG_AMG(matrix_free=True), reduction=1e-11,
                          verbose=0)
    x = newton.apply(x0)
    assert newton.result.converged
    err = float(l2_difference(V, x, p.exact))
    assert err < 2e-2, err


def test_native_aggregation_matches_python():
    """The C++ aggregation (linalg/native/amg_setup.cc) and the Python
    reference implementation produce bit-identical aggregate arrays on
    the same strength graph (the Python loop is the behavioral spec)."""
    import dune_pdelab_tpu.linalg.amg as amg_mod
    from dune_pdelab_tpu.linalg.amg import (
        _strength_graph, _aggregate, _native_aggregate,
    )
    import scipy.sparse as sp

    if _native_aggregate() is None:
        pytest.skip("no native toolchain")
    V, go = _poisson_go(StructuredMesh([0, 0], [1, 1], (32, 32)),
                        QkFEM(1, 2))
    Ab = go.jacobian(V.zero())
    ind = np.asarray(Ab.indices)
    A = sp.coo_matrix((np.asarray(Ab.data), (ind[:, 0], ind[:, 1])),
                      shape=Ab.shape).tocsr()
    S = _strength_graph(A, 0.02)
    off = A - sp.diags(A.diagonal())
    off.eliminate_zeros()
    dec = np.diff(off.tocsr().indptr) == 0
    agg_native, n_native = _aggregate(S, dec)
    # force the Python path
    saved = amg_mod._NATIVE_AGG
    amg_mod._NATIVE_AGG = False
    try:
        agg_py, n_py = _aggregate(S, dec)
    finally:
        amg_mod._NATIVE_AGG = saved
    assert n_native == n_py
    assert np.array_equal(agg_native, agg_py)


@pytest.mark.fast
def test_partitioned_setup_quality_and_scaling():
    """Distributed (decoupled per-block) AMG setup: iteration counts within
    +3 of the coupled setup, and the per-block critical path is a proper
    fraction of the serial wall (reference: the ParallelIndexSet-based
    distributed setup, dune/pdelab/backend/istl/parallelhelper.hh:273-440)."""
    import dune_pdelab_tpu as pt
    from dune_pdelab_tpu.ops import (
        ConvectionDiffusionProblem, ConvectionDiffusionFEM,
    )
    from dune_pdelab_tpu.linalg.amg import AlgebraicMultigrid
    from dune_pdelab_tpu.linalg.krylov import cg

    class P(ConvectionDiffusionProblem):
        def f(self, x):
            return jnp.ones(x.shape[:-1], x.dtype)

    mesh = pt.StructuredMesh([0, 0], [1, 1], (96, 96))
    V = pt.FunctionSpace(mesh, pt.QkFEM(1, 2))
    p = P()
    go = pt.GridOperator(V, ConvectionDiffusionFEM(p),
                         constraints=pt.constraints(p.dirichlet_bctype(), V),
                         skip_boundary=True)
    b = -go.residual(V.zero())
    its = {}
    for parts in (None, 8):
        amg = AlgebraicMultigrid().setup_from_grid_operator(go, parts=parts)
        x, st = cg(lambda z: go.jacobian_apply(V.zero(), z), b,
                   M=amg.apply, tol=1e-10)
        assert bool(st.converged)
        its[parts] = int(st.iterations)
    assert its[8] <= its[None] + 3
    rep = amg.setup_parts_report(target_n=100_000_000)
    assert rep["parts"] == 8
    assert rep["critical_path_s"] < rep["serial_equivalent_s"]


@pytest.mark.fast
def test_sharded_amg_with_partitioned_setup():
    """ShardedAMG built THROUGH the distributed setup still matches the
    sequential V-cycle arithmetic (same-iterations CG contract)."""
    import jax
    import dune_pdelab_tpu as pt
    from dune_pdelab_tpu.ops import (
        ConvectionDiffusionProblem, ConvectionDiffusionFEM,
    )
    from dune_pdelab_tpu.parallel.shardedamg import ShardedAMG
    from dune_pdelab_tpu.linalg.krylov import cg

    class P(ConvectionDiffusionProblem):
        def f(self, x):
            return jnp.ones(x.shape[:-1], x.dtype)

    mesh = pt.StructuredMesh([0, 0], [1, 1], (48, 48))
    V = pt.FunctionSpace(mesh, pt.QkFEM(1, 2))
    p = P()
    go = pt.GridOperator(V, ConvectionDiffusionFEM(p),
                         constraints=pt.constraints(p.dirichlet_bctype(), V),
                         skip_boundary=True)
    b = -go.residual(V.zero())
    sh = ShardedAMG.from_grid_operator(go, devices=jax.devices()[:8])
    assert sh.amg.setup_parts == 8       # partitioned by default now
    x_sh, st_sh = sh.solve_cg(b, tol=1e-10)
    x_sq, st_sq = cg(lambda z: go.jacobian_apply(V.zero(), z), b,
                     M=sh.amg.apply, tol=1e-10)
    assert int(st_sh.iterations) == int(st_sq.iterations)
    assert float(jnp.max(jnp.abs(x_sh - x_sq))) < 1e-8
