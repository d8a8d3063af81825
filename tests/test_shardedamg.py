"""Distributed smoothed-aggregation AMG (parallel/shardedamg.py).

Reference analog: dune-istl AMG over a ParallelIndexSet through the
NOVLP/OVLP backends (novlpistlsolverbackend.hh:330-1128,
parallelhelper.hh:273-440). Contract: the sharded V-cycle runs the SAME
arithmetic as the sequential AlgebraicMultigrid it is built from, so
outputs match to roundoff and preconditioned-CG iteration counts match
exactly; comm is grouped ppermute window exchanges plus exactly ONE
O(n_coarse) all_gather for the redundant coarse solve.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dune_pdelab_tpu import (
    StructuredMesh, FunctionSpace, GridOperator, constraints, QkFEM,
)
from dune_pdelab_tpu.mesh import SimplexMesh
from dune_pdelab_tpu.fe import PkFEM
from dune_pdelab_tpu.ops import ConvectionDiffusionProblem, ConvectionDiffusionFEM
from dune_pdelab_tpu.linalg.amg import AlgebraicMultigrid
from dune_pdelab_tpu.linalg.krylov import cg
from dune_pdelab_tpu.parallel.shardedamg import ShardedAMG

pytestmark = pytest.mark.fast


class _Problem(ConvectionDiffusionProblem):
    def f(self, x):
        return 5 * np.pi**2 * jnp.sin(np.pi * x[..., 0]) * jnp.cos(
            2 * np.pi * x[..., 1])

    def g(self, x):
        return jnp.sin(np.pi * x[..., 0]) * jnp.cos(
            2 * np.pi * x[..., 1]) + x[..., 0]


def _go(mesh, fem):
    p = _Problem()
    V = FunctionSpace(mesh, fem)
    cg_ = constraints(p.dirichlet_bctype(), V)
    return V, GridOperator(V, ConvectionDiffusionFEM(p), constraints=cg_)


def _pair(mesh, fem, ndev=8):
    V, go = _go(mesh, fem)
    amg = AlgebraicMultigrid().setup_from_grid_operator(go, keep_host=True)
    samg = ShardedAMG(amg, devices=jax.devices()[:ndev])
    return V, go, amg, samg


@pytest.mark.parametrize("ndev", [2, 8])
def test_vcycle_parity(ndev):
    """Sharded V-cycle == sequential V-cycle to roundoff (same hierarchy,
    same smoothers, same coarse LU)."""
    V, go, amg, samg = _pair(StructuredMesh([0, 0], [1, 1], (48, 48)),
                             QkFEM(1, 2), ndev)
    r = jnp.asarray(np.random.default_rng(2).standard_normal(V.ndofs))
    d = float(jnp.max(jnp.abs(amg.apply(r) - samg.apply(r))))
    assert d < 1e-12, d


def test_cg_iteration_parity():
    """Preconditioned-CG iteration counts identical seq vs 8-device."""
    V, go, amg, samg = _pair(StructuredMesh([0, 0], [1, 1], (48, 48)),
                             QkFEM(1, 2))
    x0 = V.zero()
    b = jnp.asarray(np.random.default_rng(1).standard_normal(V.ndofs))
    z1, s1 = cg(lambda q: go.jacobian_apply(x0, q), b, M=amg.apply,
                tol=1e-10)
    z2, s2 = cg(lambda q: go.jacobian_apply(x0, q), b, M=samg.apply,
                tol=1e-10)
    assert int(s1.iterations) == int(s2.iterations)
    assert float(jnp.linalg.norm(z1 - z2)) < 1e-8


def test_simplex_parity():
    """Same contract on a simplex-mesh operator (where no geometric
    multigrid exists)."""
    sm = SimplexMesh.from_structured(StructuredMesh([0, 0], [1, 1],
                                                    (24, 24)))
    V, go, amg, samg = _pair(sm, PkFEM(1, 2))
    r = jnp.asarray(np.random.default_rng(3).standard_normal(V.ndofs))
    d = float(jnp.max(jnp.abs(amg.apply(r) - samg.apply(r))))
    assert d < 1e-12, d


def test_comm_is_ppermute_plus_one_coarse_gather():
    """jaxpr inspection: the distributed V-cycle's comm is ppermute window
    exchanges + exactly ONE all_gather (the O(n_coarse) coarse-solve
    gather) — never a full-fine-vector collective."""
    V, go, amg, samg = _pair(StructuredMesh([0, 0], [1, 1], (32, 32)),
                             QkFEM(1, 2))
    jaxpr = str(jax.make_jaxpr(
        lambda r: samg._apply_padded(r, samg._ops))(
            jax.device_put(jnp.zeros(samg.NP), samg.sharding)))
    n_gather_eqns = sum(1 for ln in jaxpr.splitlines()
                        if "all_gather[" in ln)
    assert n_gather_eqns == 1, n_gather_eqns
    assert jaxpr.count("ppermute") > 0
    # the gathered operand is coarse-sized, not fine-sized
    import re
    m = [ln for ln in jaxpr.splitlines() if "all_gather[" in ln][0]
    size = int(re.search(r"f\d+\[(\d+)\]", m).group(1))
    assert size <= 4 * samg.sizes[-1] + samg.ndev, (size, samg.sizes)


def test_from_grid_operator_constructor():
    V, go = _go(StructuredMesh([0, 0], [1, 1], (24, 24)), QkFEM(1, 2))
    samg = ShardedAMG.from_grid_operator(go, devices=jax.devices()[:4])
    r = jnp.asarray(np.random.default_rng(4).standard_normal(V.ndofs))
    z = samg.apply(r)
    assert z.shape == r.shape
    assert float(jnp.dot(r, z)) > 0      # SPD-ish sanity


def test_sharded_solve_cg_iteration_parity():
    """The fully-sharded assembled solve (matrix + Krylov vectors +
    V-cycle all sharded — the NOVLP_CG_AMG analog) matches the sequential
    assembled AMG-CG in iterations and solution."""
    import scipy.sparse as sp

    V, go, amg, samg = _pair(StructuredMesh([0, 0], [1, 1], (48, 48)),
                             QkFEM(1, 2))
    b = go.residual(V.zero())
    # sequential assembled reference: same level-0 matrix
    A = sp.csr_matrix(amg.host_levels[0][0])
    Aj = jnp.asarray(A.toarray())
    z1, s1 = cg(lambda q: Aj @ q, b, M=amg.apply, tol=1e-11)
    z2, s2 = samg.solve_cg(b, tol=1e-11)
    assert int(s1.iterations) == int(s2.iterations), (
        int(s1.iterations), int(s2.iterations))
    assert float(jnp.linalg.norm(z1 - z2)) < 1e-9
