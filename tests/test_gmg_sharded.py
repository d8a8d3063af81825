"""ShardedLatticeGMG: the north-star GMG distributed over a device mesh —
V-cycle and GMG-CG iteration parity with the sequential LatticeGMG must be
exact (same stencil weights, same 2:1-aligned transfers, same Chebyshev
scalars; reference analog: parallel AMG-CG over distributed index sets,
dune/pdelab/backend/istl/novlpistlsolverbackend.hh:330-1128)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dune_pdelab_tpu import StructuredMesh
from dune_pdelab_tpu.space.space import FunctionSpace
from dune_pdelab_tpu.fe import QkFEM
from dune_pdelab_tpu.ops.convectiondiffusion import (
    ConvectionDiffusionFEM, ConvectionDiffusionProblem,
)
from dune_pdelab_tpu.linalg.gmg_lattice import LatticeGMG
from dune_pdelab_tpu.parallel.gmg_sharded import ShardedLatticeGMG

pytestmark = pytest.mark.fast


class Lap(ConvectionDiffusionProblem):
    def A(self, x):
        return 1.0


def _build(cells, dim=3):
    mesh = StructuredMesh([0] * dim, [1] * dim, (cells,) * dim)
    V = FunctionSpace(mesh, QkFEM(1, dim))
    return V, LatticeGMG(V, ConvectionDiffusionFEM(Lap()), coarsest_cells=2)


def _rhs(gmg, n, seed=0):
    rng = np.random.default_rng(seed)
    b = jnp.asarray(rng.standard_normal(n))
    return jnp.where(gmg.stencils[0].mask, 0.0, b)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_vcycle_matches_sequential():
    """One V-cycle, 8-device 1D mesh vs sequential: same numbers."""
    V, gmg = _build(16)
    b = _rhs(gmg, V.ndofs)
    z_seq = np.asarray(gmg.apply(b))
    sh = ShardedLatticeGMG(gmg, gather_below=500)
    assert sh.n_sharded >= 2            # at least one sharded transfer
    z_sh = sh.apply_flat(b)
    np.testing.assert_allclose(z_sh, z_seq, rtol=5e-6, atol=5e-8)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_cg_iteration_parity():
    """GMG-CG on the 8-device mesh: iteration parity with sequential
    (the VERDICT round-4 item-5 acceptance: 6 == 6)."""
    V, gmg = _build(16)
    b = _rhs(gmg, V.ndofs, seed=1)
    x_seq, info_seq = gmg.solve_host(b, tol=1e-8, maxiter=50)
    sh = ShardedLatticeGMG(gmg, gather_below=500)
    xg, info_sh = sh.solve_host(b, tol=1e-8, maxiter=50)
    assert info_sh["converged"] and info_seq["converged"]
    assert info_sh["iterations"] == info_seq["iterations"]
    np.testing.assert_allclose(sh.gather(xg), np.asarray(x_seq),
                               rtol=1e-5, atol=1e-8)
    assert info_sh["true_defect"] <= 2e-8 * info_sh["defect0"]


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_2d_mesh_parity():
    """2D (4, 2) device mesh over (z, y): same V-cycle numbers."""
    V, gmg = _build(16)
    b = _rhs(gmg, V.ndofs, seed=2)
    z_seq = np.asarray(gmg.apply(b))
    sh = ShardedLatticeGMG(gmg, mesh_shape=(4, 2), gather_below=500)
    z_sh = sh.apply_flat(b)
    np.testing.assert_allclose(z_sh, z_seq, rtol=5e-6, atol=5e-8)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_q2_fallback_parity():
    """Q2 lattice: sharded-axis transfers fall back to the replicated
    constraint but results still match the sequential V-cycle."""
    mesh = StructuredMesh([0, 0, 0], [1, 1, 1], (8,) * 3)
    V = FunctionSpace(mesh, QkFEM(2, 3))
    gmg = LatticeGMG(V, ConvectionDiffusionFEM(Lap()), coarsest_cells=2)
    b = _rhs(gmg, V.ndofs, seed=3)
    z_seq = np.asarray(gmg.apply(b))
    sh = ShardedLatticeGMG(gmg, gather_below=1000)
    assert not sh.local_transfers
    z_sh = sh.apply_flat(b)
    np.testing.assert_allclose(z_sh, z_seq, rtol=5e-6, atol=5e-8)
