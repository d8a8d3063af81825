"""Distributed tests on the 8-device virtual CPU mesh (MPI_RANKS 1 2 4
analog, reference: dune/pdelab/test/CMakeLists.txt:46 and testdatahandle.cc:
sharded assembly must reproduce sequential assembly exactly)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dune_pdelab_tpu import (
    StructuredMesh, FunctionSpace, QkFEM, GridOperator, constraints,
)
from dune_pdelab_tpu.ops import (
    ConvectionDiffusionProblem, ConvectionDiffusionFEM,
)
from dune_pdelab_tpu.linalg import cg
from dune_pdelab_tpu.parallel import ShardedGridOperator, pad_partition


class Problem(ConvectionDiffusionProblem):
    def f(self, x):
        return jnp.sin(3 * x[..., 0]) * x[..., 1] + 1.0

    def j(self, x):
        return 0.1 * x[..., 0]


def _ops(n=10, dim=2, k=2):
    mesh = StructuredMesh([0] * dim, [1] * dim, (n,) * dim)
    V = FunctionSpace(mesh, QkFEM(k, dim))
    p = Problem()
    cg_ = constraints(p.dirichlet_bctype(), V)
    go = GridOperator(V, ConvectionDiffusionFEM(p), constraints=cg_)
    return V, go


def test_pad_partition_mask():
    a = np.arange(10)[:, None]
    (ap,), mask = pad_partition([a], 4)
    assert ap.shape == (4, 3, 1)
    assert mask.sum() == 10
    assert mask[-1, -1] == 0.0  # padded entries masked


@pytest.mark.parametrize("ndev", [1, 2, 4, 8])
def test_sharded_residual_matches(ndev):
    V, go = _ops()
    sgo = ShardedGridOperator(go, devices=jax.devices()[:ndev])
    x = jnp.asarray(np.random.default_rng(0).standard_normal(V.ndofs))
    r_seq = go.residual(x)
    r_par = sgo.residual(x)
    assert float(jnp.linalg.norm(r_seq - r_par)) < 1e-12


def test_sharded_jacobian_apply_matches():
    V, go = _ops(n=8, k=1)
    sgo = ShardedGridOperator(go)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(V.ndofs))
    z = jnp.asarray(rng.standard_normal(V.ndofs))
    assert float(jnp.linalg.norm(
        go.jacobian_apply(x, z) - sgo.jacobian_apply(x, z))) < 1e-12


def test_sharded_cg_solve_matches_sequential():
    """Solver iteration parity between sequential and sharded operator
    (the matrix-free vs matrix-based parity oracle pattern, reference:
    dune/pdelab/test/matrixfree/matrix_free_linear.cc:4-8)."""
    V, go = _ops(n=8, k=1)
    sgo = ShardedGridOperator(go)
    x0 = V.zero()
    b = go.residual(x0)
    d = go.jacobian_diagonal(x0)
    M = lambda r: r / d
    z1, s1 = cg(lambda p: go.jacobian_apply(x0, p), b, M=M, tol=1e-12)
    z2, s2 = cg(lambda p: sgo.jacobian_apply(x0, p), b, M=M, tol=1e-12)
    assert int(s1.iterations) == int(s2.iterations)
    assert float(jnp.linalg.norm(z1 - z2)) < 1e-10


def test_graft_entry_dryrun():
    import sys, pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == args[0].shape
    ge.dryrun_multichip(8)


def _stencil_setup(cells, k):
    from dune_pdelab_tpu.assembly.stencil import compile_stencil
    from dune_pdelab_tpu.ops import ConvectionDiffusionFEM

    p = Problem()
    dim = len(cells)
    mesh = StructuredMesh([0] * dim, [1] * dim, cells)
    V = FunctionSpace(mesh, QkFEM(k, dim))
    cg_mask = constraints(True, V)
    go = GridOperator(V, ConvectionDiffusionFEM(p), constraints=cg_mask)
    st = compile_stencil(go)
    assert st is not None
    return V, go, st


@pytest.mark.parametrize("cells,k,mesh_shape", [
    ((15, 15, 15), 1, None),       # divisible slabs, k=1
    ((13, 11, 9), 1, None),        # non-divisible slowest axis (padding)
    ((9, 9, 9), 2, None),          # Q2 residue classes, non-divisible
    ((11, 13, 9), 1, (4, 2)),      # 2D device mesh (corner halo exchange)
    ((7, 9, 7), 2, (2, 2)),        # Q2 on 2D device mesh
])
def test_dof_sharded_stencil_matches(cells, k, mesh_shape):
    """Lattice-sharded halo-exchange stencil == sequential stencil, and the
    sharded CG solve matches the sequential one (novlp backend analog,
    reference: dune/pdelab/backend/istl/novlpistlsolverbackend.hh:96)."""
    from dune_pdelab_tpu.parallel.dofsharded import (
        DofShardedStencil, sharded_cg_solve,
    )

    V, go, st = _stencil_setup(cells, k)
    sh = DofShardedStencil(st, devices=jax.devices()[:8],
                           mesh_shape=mesh_shape)
    rng = np.random.default_rng(3)
    z = jnp.asarray(rng.standard_normal(V.ndofs))
    y1 = st(z)
    y2 = sh.gather(sh(sh.device_put(z)))
    assert float(jnp.linalg.norm(y1 - y2)) < 1e-11

    b = go.residual(V.zero())
    d = go.jacobian_diagonal(V.zero())
    x_seq, s_seq = cg(lambda q: st(q), b, M=lambda r: r / d, tol=1e-12)
    x_sh, s_sh = sharded_cg_solve(sh, b, diag=d, tol=1e-12)
    assert int(s_seq.iterations) == int(s_sh.iterations)
    assert float(jnp.linalg.norm(x_seq - x_sh)) < 1e-9


@pytest.mark.parametrize("ndev", [1, 3, 8])
def test_novlp_residual_jvp_matches(ndev):
    """Nonoverlapping (block-DOF-sharded, halo-only comm) assembly ==
    sequential, Q2 with boundary terms (novlpistlsolverbackend.hh analog)."""
    from dune_pdelab_tpu.parallel.novlp import NonoverlappingShardedGridOperator

    V, go = _ops(n=10, dim=2, k=2)
    ngo = NonoverlappingShardedGridOperator(go, devices=jax.devices()[:ndev])
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal(V.ndofs))
    z = jnp.asarray(rng.standard_normal(V.ndofs))
    assert float(jnp.linalg.norm(go.residual(x) - ngo.residual(x))) < 1e-11
    assert float(jnp.linalg.norm(
        go.jacobian_apply(x, z) - ngo.jacobian_apply(x, z))) < 1e-11


def test_novlp_dg_skeleton_matches():
    """DG skeleton + boundary terms through the halo-window path."""
    from dune_pdelab_tpu.fe import QkDGFEM
    from dune_pdelab_tpu.ops.convectiondiffusiondg import (
        ConvectionDiffusionDG, DGMethod,
    )
    from dune_pdelab_tpu.parallel.novlp import NonoverlappingShardedGridOperator

    p = Problem()
    mesh = StructuredMesh([0, 0], [1, 1], (12, 12))
    V = FunctionSpace(mesh, QkDGFEM(1, 2))
    go = GridOperator(V, ConvectionDiffusionDG(p, method=DGMethod.SIPG))
    ngo = NonoverlappingShardedGridOperator(go, devices=jax.devices()[:4])
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal(V.ndofs))
    z = jnp.asarray(rng.standard_normal(V.ndofs))
    assert float(jnp.linalg.norm(go.residual(x) - ngo.residual(x))) < 1e-11
    assert float(jnp.linalg.norm(
        go.jacobian_apply(x, z) - ngo.jacobian_apply(x, z))) < 1e-11


def test_novlp_cg_iteration_parity():
    """Sharded CG on block-sharded vectors: same iterations as sequential."""
    from dune_pdelab_tpu.parallel.novlp import NonoverlappingShardedGridOperator

    V, go = _ops(n=12, dim=2, k=2)
    ngo = NonoverlappingShardedGridOperator(go, devices=jax.devices()[:4])
    x0 = V.zero()
    b = go.residual(x0)
    d = go.jacobian_diagonal(x0)
    z1, s1 = cg(lambda p_: go.jacobian_apply(x0, p_), b, M=lambda r: r / d,
                tol=1e-12)
    z2, s2 = ngo.solve_cg(x0, b, diag=d, tol=1e-12)
    assert int(s1.iterations) == int(s2.iterations)
    assert float(jnp.linalg.norm(z1 - z2)) < 1e-9


def test_sharded_gmg_iteration_parity():
    """Sharded GMG V-cycle (halo-only smoother comm) == sequential GMG:
    identical preconditioned-CG iteration counts and solutions."""
    from dune_pdelab_tpu import StationaryLinearProblemSolver, interpolate_dirichlet
    from dune_pdelab_tpu.linalg.multigrid import GeometricMultigrid
    from dune_pdelab_tpu.parallel.gmg import ShardedGeometricMultigrid
    from dune_pdelab_tpu.solvers import LinearSolverBackend

    p = Problem()
    mesh = StructuredMesh([0, 0], [1, 1], (32, 32))
    fem = QkFEM(1, 2)
    V = FunctionSpace(mesh, fem)
    bctype = p.dirichlet_bctype()
    cg_ = constraints(bctype, V)
    go = GridOperator(V, ConvectionDiffusionFEM(p), constraints=cg_)
    x0 = V.zero()
    its, xs = [], []
    for gmg in (GeometricMultigrid(ConvectionDiffusionFEM(p), mesh, fem,
                                   bctype=bctype),
                ShardedGeometricMultigrid(ConvectionDiffusionFEM(p), mesh, fem,
                                          bctype=bctype,
                                          devices=jax.devices()[:4])):
        slp = StationaryLinearProblemSolver(
            go, LinearSolverBackend(solver="cg", precond=gmg),
            reduction=1e-10, verbose=0)
        xs.append(slp.apply(x0))
        assert slp.result.converged
        its.append(slp.result.linear_solver_iterations)
    assert its[0] == its[1], its
    assert float(jnp.linalg.norm(xs[0] - xs[1])) < 1e-8


def test_comm_policies():
    """Data-handle policy analogs: add/copy/min/max plane exchange + masked
    dots (genericdatahandle.hh policies, parallelhelper.hh disjointDot)."""
    from jax.sharding import Mesh, PartitionSpec as P
    from dune_pdelab_tpu.parallel.comm import (
        allreduce, exchange_planes, masked_dot,
    )
    nd = 4
    mesh = Mesh(np.array(jax.devices()[:nd]), ("s",))
    data = jnp.arange(nd * 4.0).reshape(nd * 4)

    def kernel(loc):
        loc2 = loc.reshape(-1, 1)
        prev, nxt = exchange_planes(loc2, "s", nd, policy="copy")
        total = allreduce(jnp.sum(loc), "s", "sum")
        mx = allreduce(jnp.max(loc), "s", "max")
        return (prev.reshape(-1), nxt.reshape(-1),
                jnp.full_like(loc, total), jnp.full_like(loc, mx))

    prev, nxt, tot, mx = jax.shard_map(
        kernel, mesh=mesh, in_specs=P("s"),
        out_specs=(P("s"), P("s"), P("s"), P("s")))(data)
    prev = np.asarray(prev).reshape(nd, 1)
    nxt = np.asarray(nxt).reshape(nd, 1)
    assert prev[0, 0] == 0.0            # chain end: zeros
    assert prev[1, 0] == 3.0            # last entry of shard 0
    assert nxt[0, 0] == 4.0             # first entry of shard 1
    assert np.allclose(np.asarray(tot), np.arange(16.0).sum())
    assert np.allclose(np.asarray(mx), 15.0)
    # masked dot: mask half the entries
    mask = jnp.arange(16) % 2 == 0
    md = masked_dot(data, data, mask)
    assert np.isclose(float(md), float((data[::2] ** 2).sum()))


def test_partition_weighted():
    """Prefix-sum load balancing: skewed costs end up near-balanced, equal
    costs reproduce equal slabs (loadbalance.hh policy analog)."""
    from dune_pdelab_tpu.parallel.loadbalance import (
        partition_weighted, imbalance,
    )
    w = np.ones(100)
    r = partition_weighted(w, 4)
    assert r == [(0, 25), (25, 50), (50, 75), (75, 100)]
    # quadratic cost skew: equal-count slabs would be 1.75x imbalanced
    w2 = (np.arange(100) + 1.0) ** 2
    r2 = partition_weighted(w2, 4)
    assert imbalance(r2, w2) < 1.15
    eq = [(0, 25), (25, 50), (50, 75), (75, 100)]
    assert imbalance(eq, w2) > 1.5


def test_rebalance_mid_solve():
    """Redistribute a DOF-sharded CG state onto a different device mesh and
    continue: final solution matches the uninterrupted sequential solve
    (loadBalance(grid, gfs, x) analog)."""
    from dune_pdelab_tpu.parallel.dofsharded import (
        DofShardedStencil, sharded_cg_solve,
    )
    from dune_pdelab_tpu.parallel.loadbalance import rebalance, redistribute

    V, go, st = _stencil_setup((12, 12, 12), 1)
    b = go.residual(V.zero())
    d = go.jacobian_diagonal(V.zero())
    x_ref, s_ref = cg(lambda q: st(q), b, M=lambda r: r / d, tol=1e-11)

    src = DofShardedStencil(st, devices=jax.devices()[:4])
    x_half, _ = sharded_cg_solve(src, b, diag=d, tol=0.0, maxiter=10)
    dst = rebalance(src, devices=jax.devices()[:8], mesh_shape=(4, 2))
    xg = redistribute(src.device_put(x_half), src, dst)
    x_fin, s_fin = sharded_cg_solve(dst, b, diag=d, tol=1e-11,
                                    x0=xg)
    assert float(jnp.linalg.norm(x_fin - x_ref)) < 1e-8


def test_data_handle_policies():
    """Generic data-handle reduction policies (Add/Copy/Min/Max,
    reference: gridfunctionspace/genericdatahandle.hh:646-790) through the
    comm module's neighborwise plane exchange under shard_map, plus the
    windowed operator's owner-window Copy roundtrip."""
    from functools import partial
    from jax.sharding import Mesh, PartitionSpec as P
    from jax.experimental.shard_map import shard_map
    from dune_pdelab_tpu.parallel.comm import exchange_planes
    from dune_pdelab_tpu.parallel.windowed import WindowShardedGridOperator

    nd = 4
    devs = np.asarray(jax.devices()[:nd])
    mesh_dev = Mesh(devs, ("blk",))
    x = jnp.arange(nd * 3, dtype=jnp.float64)

    def run(policy):
        @partial(shard_map, mesh=mesh_dev, in_specs=P("blk"),
                 out_specs=(P("blk"), P("blk")))
        def f(loc):
            rp, rn = exchange_planes(loc, "blk", nd, policy=policy)
            return rp, rn
        return f(x)

    rp, rn = run("copy")
    # shard d receives prev shard's LAST plane and next shard's FIRST
    rp, rn = np.asarray(rp), np.asarray(rn)
    for d in range(nd):
        expect_prev = (3 * d - 1) if d > 0 else 0.0
        expect_next = (3 * (d + 1)) if d < nd - 1 else 0.0
        assert rp[d] == expect_prev and rn[d] == expect_next
    rp_min, rn_min = run("min")
    rp_min, rn_min = np.asarray(rp_min), np.asarray(rn_min)
    for d in range(nd):
        own_first, own_last = 3 * d, 3 * d + 2
        expect_prev = min((3 * d - 1) if d > 0 else 0.0, own_first)
        expect_next = min((3 * (d + 1)) if d < nd - 1 else 0.0, own_last)
        assert rp_min[d] == expect_prev and rn_min[d] == expect_next

    # windowed owner-window roundtrip: Copy semantics are the identity
    V, go = _ops(n=8, dim=2, k=1)
    w = WindowShardedGridOperator(go, devices=jax.devices()[:4])
    rng = np.random.default_rng(7)
    xx = rng.standard_normal(V.ndofs)
    assert np.allclose(np.asarray(w.gather(w.device_put(xx))), xx)


def test_novlp_newton_nonlinear_parity():
    """Full nonlinear Newton solve THROUGH the block-sharded operator:
    same Newton iterations and solution as the sequential GridOperator
    (distributed solver stack end-to-end)."""
    from dune_pdelab_tpu.ops.base import LocalOperator
    from dune_pdelab_tpu.parallel.novlp import NonoverlappingShardedGridOperator
    from dune_pdelab_tpu.solvers import NewtonMethod, SEQ_CG_Jacobi

    class NL(LocalOperator):
        def alpha_volume(self, ctx, u):
            tab = ctx.tab
            gu = self.gradient_at_qp(tab, u)
            uq = self.value_at_qp(tab, u)
            return (self.accumulate_gradient(tab, ctx.factor, gu)
                    + self.accumulate_value(tab, ctx.factor, uq ** 3))

        def lambda_volume(self, ctx):
            ue = jnp.sin(np.pi * ctx.x[..., 0]) * jnp.sin(np.pi * ctx.x[..., 1])
            f = 2 * np.pi ** 2 * ue + ue ** 3
            return self.accumulate_value(ctx.tab, ctx.factor, -f)

    mesh = StructuredMesh([0, 0], [1, 1], (12, 12))
    V = FunctionSpace(mesh, QkFEM(1, 2))
    cg_ = constraints(True, V)
    go = GridOperator(V, NL(), constraints=cg_)
    ngo = NonoverlappingShardedGridOperator(go, devices=jax.devices()[:4])
    n_seq = NewtonMethod(go, SEQ_CG_Jacobi(), reduction=1e-10, verbose=0)
    x_seq = n_seq.apply(V.zero())
    n_par = NewtonMethod(ngo, SEQ_CG_Jacobi(), reduction=1e-10, verbose=0)
    x_par = n_par.apply(V.zero())
    assert n_seq.result.converged and n_par.result.converged
    assert n_seq.result.iterations == n_par.result.iterations
    assert float(jnp.linalg.norm(x_seq - x_par)) < 1e-8
