"""Window-sharded assembly (parallel/windowed.py): the general distributed
path — composite spaces, simplex and adaptive meshes, 2D device meshes.
Oracle: sharded residual / jacobian_apply / solves must reproduce the
sequential GridOperator exactly (the MPI_RANKS 1 2 4 strategy, reference:
dune/pdelab/test/CMakeLists.txt:46; novlpistlsolverbackend.hh SpMV +
border add-exchange)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dune_pdelab_tpu import (
    StructuredMesh, FunctionSpace, QkFEM, GridOperator, constraints,
)
from dune_pdelab_tpu.linalg import cg
from dune_pdelab_tpu.ops import (
    ConvectionDiffusionProblem, ConvectionDiffusionFEM,
)
from dune_pdelab_tpu.parallel.windowed import (
    WindowShardedGridOperator, block_partition,
)

pytestmark = pytest.mark.fast


class Problem(ConvectionDiffusionProblem):
    def f(self, x):
        return jnp.sin(3 * x[..., 0]) * x[..., 1] + 1.0

    def j(self, x):
        return 0.1 * x[..., 0]


def _cd_go(n=10, dim=2, k=2):
    mesh = StructuredMesh([0] * dim, [1] * dim, (n,) * dim)
    V = FunctionSpace(mesh, QkFEM(k, dim))
    p = Problem()
    cg_ = constraints(p.dirichlet_bctype(), V)
    return V, GridOperator(V, ConvectionDiffusionFEM(p), constraints=cg_)


def _parity(V, go, wgo, tol=1e-11, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal(V.ndofs))
    z = jnp.asarray(rng.standard_normal(V.ndofs))
    r_seq = go.residual(x)
    r_par = wgo.residual(x)
    nr = max(1.0, float(jnp.linalg.norm(r_seq)))
    assert float(jnp.linalg.norm(r_seq - r_par)) < tol * nr
    j_seq = go.jacobian_apply(x, z)
    j_par = wgo.jacobian_apply(x, z)
    nj = max(1.0, float(jnp.linalg.norm(j_seq)))
    assert float(jnp.linalg.norm(j_seq - j_par)) < tol * nj


@pytest.mark.parametrize("ndev", [1, 3, 8])
def test_windowed_cd_q2_parity(ndev):
    V, go = _cd_go()
    wgo = WindowShardedGridOperator(go, devices=jax.devices()[:ndev])
    _parity(V, go, wgo)


def test_windowed_2d_device_mesh_block_partition():
    """2D device grid (2, 4) with torus-aligned block partition."""
    V, go = _cd_go(n=12, k=1)
    owner = block_partition(go.mesh, (2, 4))
    assert owner.min() == 0 and owner.max() == 7
    wgo = WindowShardedGridOperator(go, element_owner=owner)
    _parity(V, go, wgo)
    # exchange classes exist and are halo-sized, not full-vector
    assert len(wgo._plan) >= 2
    assert wgo.Wmax < V.ndofs


def test_windowed_cg_iteration_parity():
    V, go = _cd_go(n=8, k=1)
    wgo = WindowShardedGridOperator(go)
    x0 = V.zero()
    b = go.residual(x0)
    d = go.jacobian_diagonal(x0)
    z1, s1 = cg(lambda p: go.jacobian_apply(x0, p), b,
                M=lambda r: r / d, tol=1e-12)
    z2, s2 = wgo.solve_cg(x0, b, diag=np.asarray(d), tol=1e-12)
    assert int(s1.iterations) == int(s2.iterations)
    assert float(jnp.linalg.norm(z1 - jnp.asarray(z2))) < 1e-10


def test_windowed_taylor_hood_stokes():
    """Composite (Taylor-Hood) space under the window sharding — the
    reference runs Stokes on MPI ranks (ovlpistlsolverbackend.hh); round 2
    could not shard composite spaces at all."""
    from dune_pdelab_tpu.solvers.stokes import (
        taylor_hood_space, stokes_constraints,
    )
    from dune_pdelab_tpu.ops import TaylorHoodNavierStokes
    from dune_pdelab_tpu.ops.stokes import NavierStokesParameters

    mesh = StructuredMesh([0, 0], [1, 1], (8, 8))
    W = taylor_hood_space(mesh, degree=2)
    cg_ = stokes_constraints(W, bctype=True, pin_pressure=True)
    go = GridOperator(W, TaylorHoodNavierStokes(
        NavierStokesParameters(mu=1.0, rho=0.0)), constraints=cg_)
    wgo = WindowShardedGridOperator(go)
    _parity(W, go, wgo)


def test_windowed_stokes_outflow_bc():
    """Mixed boundary-condition Stokes (Dirichlet inflow/walls +
    stress-Neumann outflow traction) under window sharding: the boundary
    face groups carry bctype-dependent alpha AND lambda terms that must
    land in the correct shard windows."""
    from dune_pdelab_tpu.solvers.stokes import taylor_hood_space
    from dune_pdelab_tpu.ops import TaylorHoodNavierStokes
    from tests.test_stokes_bc import Poiseuille, P0

    prm = Poiseuille(p_out=P0)
    mesh = StructuredMesh([0, 0], [2.0, 1], (8, 4))
    W = taylor_hood_space(mesh, degree=2)
    cg_ = constraints((prm.velocity_bctype(), None), W)
    go = GridOperator(W, TaylorHoodNavierStokes(prm), constraints=cg_)
    wgo = WindowShardedGridOperator(go)
    _parity(W, go, wgo)


def test_windowed_simplex_sipg():
    """Simplex mesh + DG skeleton terms (per-face geometry/tabs sharded)."""
    from dune_pdelab_tpu.mesh import SimplexMesh
    from dune_pdelab_tpu.fe import PkDGFEM
    from dune_pdelab_tpu.ops.convectiondiffusiondg import ConvectionDiffusionDG

    sm = SimplexMesh.from_structured(StructuredMesh([0, 0], [1, 1], (5, 5)))
    V = FunctionSpace(sm, PkDGFEM(1, 2))
    go = GridOperator(V, ConvectionDiffusionDG(Problem()))
    wgo = WindowShardedGridOperator(go)
    _parity(V, go, wgo, tol=1e-10)


def test_windowed_adaptive_hanging_nodes():
    """Adaptive mesh with hanging-node (affine) constraints: window-local
    prolong / restrict-transpose must reproduce the sequential P/P^T
    application exactly."""
    from dune_pdelab_tpu.mesh.adaptive import AdaptiveMesh

    m = AdaptiveMesh([0, 0], [1, 1], (4, 4))
    marks = np.zeros(m.nelements, bool)
    marks[[0, 5, 6]] = True
    m = m.refine(marks)
    marks = np.zeros(m.nelements, bool)
    marks[[0, 1]] = True
    m = m.refine(marks)
    V = FunctionSpace(m, QkFEM(1, 2))
    p = Problem()
    cg_ = constraints(p.dirichlet_bctype(), V)
    assert cg_.has_affine     # the fixture must actually have hanging nodes
    go = GridOperator(V, ConvectionDiffusionFEM(p), constraints=cg_,
                      skip_boundary=True)
    wgo = WindowShardedGridOperator(go)
    _parity(V, go, wgo)


def test_windowed_adaptive_solve_parity():
    """End-to-end CG on a locally refined mesh: sharded == sequential."""
    from dune_pdelab_tpu.mesh.adaptive import AdaptiveMesh

    m = AdaptiveMesh([0, 0], [1, 1], (4, 4))
    marks = np.zeros(m.nelements, bool)
    marks[[5, 10]] = True
    m = m.refine(marks)
    V = FunctionSpace(m, QkFEM(1, 2))
    p = Problem()
    cg_ = constraints(p.dirichlet_bctype(), V)
    go = GridOperator(V, ConvectionDiffusionFEM(p), constraints=cg_,
                      skip_boundary=True)
    wgo = WindowShardedGridOperator(go)
    x0 = V.zero()
    b = go.residual(x0)
    d = go.jacobian_diagonal(x0)
    z1, s1 = cg(lambda q: go.jacobian_apply(x0, q), b,
                M=lambda r: r / d, tol=1e-12)
    z2, s2 = wgo.solve_cg(x0, b, diag=np.asarray(d), tol=1e-12)
    assert int(s1.iterations) == int(s2.iterations)
    assert float(jnp.linalg.norm(z1 - jnp.asarray(z2))) < 1e-9


def test_windowed_comm_is_halo_only():
    """Jaxpr inspection: a distributed apply communicates with ppermutes
    only — no full-vector psum / all_gather (VERDICT round-2 item 8: no
    shipped path may do O(N) collectives per operator application)."""
    V, go = _cd_go(n=8, k=1)
    wgo = WindowShardedGridOperator(go)
    xp = wgo.device_put(np.zeros(V.ndofs))
    jaxpr = str(jax.make_jaxpr(
        lambda x: wgo.residual_padded(x))(xp))
    assert "ppermute" in jaxpr
    assert "psum" not in jaxpr
    assert "all_gather" not in jaxpr
    # and the buffers moved are halo-sized, not vector-sized
    assert wgo.Wmax < V.ndofs


def test_sharded_alias_is_windowed():
    """ShardedGridOperator (the package entry point) is the windowed
    implementation — the round-1 full-psum path is retired."""
    from dune_pdelab_tpu.parallel import ShardedGridOperator
    assert issubclass(ShardedGridOperator, WindowShardedGridOperator)
    V, go = _cd_go(n=6, k=1)
    sgo = ShardedGridOperator(go)
    d1 = go.jacobian_diagonal(V.zero())
    d2 = sgo.jacobian_diagonal(V.zero())
    assert float(jnp.linalg.norm(d1 - d2)) == 0.0


def test_windowed_adjoint_gradient_parity():
    """Distributed differentiable solve: adjoint gradients computed with
    the window-sharded residual (vjp THROUGH shard_map, 8 devices) match
    the sequential adjoint gradients to fp64 tolerance — sensitivity
    analysis composes with domain decomposition."""
    from dune_pdelab_tpu.ops import (
        ConvectionDiffusionProblem, ConvectionDiffusionFEM,
    )
    from dune_pdelab_tpu.solvers import implicit_solve
    from dune_pdelab_tpu.linalg.krylov import cg

    mesh = StructuredMesh([0, 0], [1, 1], (8, 8))
    V = FunctionSpace(mesh, QkFEM(1, 2))
    cons = constraints(True, V)

    def factory(theta):
        class P(ConvectionDiffusionProblem):
            def A(self, x):
                a = theta[0] + theta[1] * x[..., 0]
                return (a[..., None, None]
                        * jnp.eye(x.shape[-1], dtype=x.dtype))

            def f(self, x):
                return jnp.ones(x.shape[:-1], x.dtype)
        return ConvectionDiffusionFEM(P())

    def R_seq(x, theta):
        go = GridOperator(V, factory(theta), constraints=cons)
        return go.residual(x)

    def R_shard(x, theta):
        go = GridOperator(V, factory(theta), constraints=cons)
        return WindowShardedGridOperator(go).residual(x)

    def forward(theta):
        go = GridOperator(V, factory(theta), constraints=cons)
        x0 = jnp.zeros(V.ndofs)
        r = go.residual(x0)
        z, _ = cg(lambda p: go.jacobian_apply(x0, p), r, tol=1e-13,
                  maxiter=2000)
        return x0 - z

    theta0 = jnp.array([1.0, 0.5])
    grads = {}
    for name, R in (("seq", R_seq), ("shard", R_shard)):
        f = implicit_solve(R, forward, constraints=cons,
                           adjoint_tol=1e-13)
        grads[name] = jax.grad(lambda t: jnp.sum(f(t) ** 2))(theta0)
    diff = float(jnp.max(jnp.abs(grads["seq"] - grads["shard"])))
    scale = float(jnp.max(jnp.abs(grads["seq"])))
    assert diff < 1e-10 * max(1.0, scale), (grads, diff)


def test_windowed_ccfv_p0_parity():
    """Cell-centered FV (P0 + two-point skeleton fluxes) under the window
    sharding. Also the regression test for the eager-shard_map stall: the
    first CCFV apply never finished before residual_unconstrained_padded
    was jitted (primitive-by-primitive eager compilation)."""
    from dune_pdelab_tpu.fe import P0FEM
    from dune_pdelab_tpu.ops.ccfv import ConvectionDiffusionCCFV

    mesh = StructuredMesh([0, 0], [1, 1], (6, 6))
    V = FunctionSpace(mesh, P0FEM(2))
    go = GridOperator(V, ConvectionDiffusionCCFV(Problem()))
    wgo = WindowShardedGridOperator(go, devices=jax.devices()[:2])
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(V.ndofs))
    r1 = go.residual_unconstrained(x)
    r2 = wgo.residual(x)
    assert float(jnp.linalg.norm(r1 - r2)) < 1e-12 * float(
        jnp.linalg.norm(r1))


def test_windowed_twophase_parity():
    """Nonlinear two-phase CCFV on PowerSpace(P0, 2) — heterogeneous K,
    gravity, Dirichlet + no-flow BCs — under 8-device window sharding:
    residual AND jacobian_apply match the sequential operator (the
    reference runs twophaseccfv.hh on MPI ranks through the same
    nonoverlapping machinery, novlpistlsolverbackend.hh)."""
    from dune_pdelab_tpu.fe import P0FEM
    from dune_pdelab_tpu.space.space import PowerSpace
    from dune_pdelab_tpu.ops.twophase import TwoPhaseParameters, TwoPhaseCCFV

    class Disp(TwoPhaseParameters):
        def is_dirichlet(self, x):
            return (x[..., 0] < 1e-9) | (x[..., 0] > 1 - 1e-9)

        def g_l(self, x):
            return jnp.where(x[..., 0] < 0.5, 2.0, 0.0)

        def g_g(self, x):
            return jnp.full(x.shape[:-1], 1.5)

    prm = Disp(phi=0.2, K=lambda x: 1.0 + x[..., 0], mu_l=1.0, mu_g=0.2,
               gravity=(0.1, -0.3))
    mesh = StructuredMesh([0, 0], [1, 1], (12, 12))
    W = PowerSpace(FunctionSpace(mesh, P0FEM(2)), 2)
    go = GridOperator(W, TwoPhaseCCFV(prm))
    wgo = WindowShardedGridOperator(go)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0.5, 0.3, W.ndofs))
    z = jnp.asarray(rng.standard_normal(W.ndofs))
    ra = go.residual_unconstrained(x)
    rb = wgo.residual(x)
    assert float(jnp.linalg.norm(ra - rb)) < 1e-12 * float(
        jnp.linalg.norm(ra))
    ja = go.jacobian_apply(x, z)
    jb = wgo.jacobian_apply(x, z)
    assert float(jnp.linalg.norm(ja - jb)) < 1e-12 * float(
        jnp.linalg.norm(ja))


def test_windowed_instationary_trajectory_parity():
    """Distributed time integration: OneStepMethod + Newton + CG drive
    window-sharded go0/go1 UNCHANGED (the stage machinery only needs
    residual_unconstrained / jacobian_diagonal, which the windowed
    operator provides) — 3 implicit-Euler steps of the heat equation on
    8 devices reproduce the sequential trajectory to machine precision
    (reference: implicitonestep.hh driving MPI-parallel grid operators)."""
    from dune_pdelab_tpu import FunctionSpace, QkFEM, constraints
    from dune_pdelab_tpu.ops import ConvectionDiffusionFEM, L2
    from dune_pdelab_tpu.instationary import OneStepMethod, implicit_euler
    from dune_pdelab_tpu.solvers import SEQ_CG_Jacobi

    class Heat(Problem):
        def g(self, x):
            return x[..., 0] * 0.0

    p = Heat()
    mesh = StructuredMesh([0, 0], [1, 1], (8, 8))
    V = FunctionSpace(mesh, QkFEM(1, 2))
    cg_ = constraints(p.dirichlet_bctype(), V)
    go0 = GridOperator(V, ConvectionDiffusionFEM(p), constraints=cg_)
    go1 = GridOperator(V, L2(), constraints=cg_)

    def run(g0, g1):
        osm = OneStepMethod(implicit_euler(), g0, g1,
                            SEQ_CG_Jacobi(use_stencil=False),
                            pdesolver="newton", reduction=1e-10,
                            max_iterations=20, min_linear_reduction=1e-6)
        x = V.zero()
        t, dt = 0.0, 0.05
        for _ in range(3):
            x = osm.apply(t, dt, x)
            t += dt
        return np.asarray(x)

    x_seq = run(go0, go1)
    x_par = run(WindowShardedGridOperator(go0),
                WindowShardedGridOperator(go1))
    assert np.abs(x_seq - x_par).max() < 1e-13
