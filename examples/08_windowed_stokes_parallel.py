"""Window-sharded composite-space tutorial: Taylor-Hood Stokes solved on a
device mesh with the GENERAL sharded operator (any mesh, any space), then
written as partitioned parallel VTK (.pvtu master + per-shard .vtu pieces).

Reference analogs: the overlapping/nonoverlapping ISTL backends running a
composite Stokes space over MPI ranks (dune/pdelab/backend/istl/
ovlpistlsolverbackend.hh) and VTKWriter::pwrite parallel output
(dune-grid). Here `parallel/windowed.py` shards contiguous element slabs
with per-shard localized DOF windows; communication per apply is a handful
of halo-sized ppermutes (jaxpr-verified in tests/test_windowed.py).

Works on real multi-chip hardware unchanged; this script forces an
8-device virtual CPU mesh so it runs anywhere.

Run: python examples/08_windowed_stokes_parallel.py
"""
import os
import tempfile

_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

import dune_pdelab_tpu as pt
from dune_pdelab_tpu.linalg.krylov import restarted_gmres as gmres
from dune_pdelab_tpu.ops import TaylorHoodNavierStokes
from dune_pdelab_tpu.ops.stokes import NavierStokesParameters
from dune_pdelab_tpu.parallel.windowed import WindowShardedGridOperator
from dune_pdelab_tpu.solvers.stokes import (
    taylor_hood_space, stokes_constraints,
)


def _a(x):
    return x**2 * (1 - x) ** 2


def _da(x):
    return 2 * x * (1 - x) * (1 - 2 * x)


def _dda(x):
    return 12 * x**2 - 12 * x + 2


def _ddda(x):
    return 24 * x - 12


class Manufactured(NavierStokesParameters):
    """div-free velocity (a(x) a'(y), -a'(x) a(y)), pressure x^3 + y^3."""

    def __init__(self):
        super().__init__(mu=1.0, rho=0.0)

    def f(self, x):
        xx, yy = x[..., 0], x[..., 1]
        f1 = -(_dda(xx) * _da(yy) + _a(xx) * _ddda(yy)) + 3 * xx**2
        f2 = (_ddda(xx) * _a(yy) + _da(xx) * _dda(yy)) + 3 * yy**2
        return jnp.stack([f1, f2], axis=-1)


def main():
    print(f"devices: {len(jax.devices())}")
    mesh = pt.StructuredMesh([0, 0], [1, 1], (8, 8))
    W = taylor_hood_space(mesh, degree=2)
    cg = stokes_constraints(W, bctype=True, pin_pressure=True)
    go = pt.GridOperator(W, TaylorHoodNavierStokes(Manufactured()),
                         constraints=cg)

    # window-sharded operator over ALL devices: contiguous element slabs,
    # per-shard DOF windows, O(halo) ppermute exchange
    wgo = WindowShardedGridOperator(go, devices=jax.devices())
    b = go.residual(W.zero())
    bp = wgo.device_put(np.asarray(b))
    xp = wgo.device_put(np.asarray(W.zero()))
    # Jacobi on the velocity blocks (pressure diagonal is zero in the
    # saddle point -> identity there); elementwise preconditioners
    # commute with the window permutation, so just device_put the diag
    diag = np.asarray(go.jacobian_diagonal(W.zero()))
    dsafe = np.where(np.abs(diag) > 1e-12, diag, 1.0)
    dp = wgo.device_put(dsafe)   # pad lanes arrive as 0 -> guard below
    z, stats = jax.jit(lambda xp, bp, dp: gmres(
        lambda p: wgo.jacobian_apply_padded(xp, p), bp,
        M=lambda r: r / jnp.where(dp == 0, 1.0, dp),
        tol=1e-7, maxiter=2000, restart=150))(xp, bp, dp)
    x = W.zero() - jnp.asarray(wgo.gather(z))
    rr = float(jnp.linalg.norm(go.residual(x)) / jnp.linalg.norm(b))
    print(f"sharded GMRES: {int(stats.iterations)} iterations, "
          f"true rel residual {rr:.2e}")

    # velocity magnitude vs the exact field
    Vv = W.children[0].children[0]
    vx = W.children[0].restrict(W.restrict(x, 0), 0)
    vy = W.children[0].restrict(W.restrict(x, 0), 1)
    vex = Vv.interpolate(lambda p: _a(p[:, 0]) * _da(p[:, 1]))
    print(f"max |vx - exact| = "
          f"{float(jnp.max(jnp.abs(vx - vex))):.2e}")

    # partitioned parallel output: one .vtu piece per shard + .pvtu
    # master, using the SAME element partition the sharded solve used
    from dune_pdelab_tpu.io import ParallelVTKWriter
    out = os.path.join(tempfile.mkdtemp(prefix="stokes_pvtu_"), "stokes")
    w = ParallelVTKWriter(mesh, wgo.element_owner)
    w.add_field(Vv, np.asarray(vx), "vx")
    w.add_field(Vv, np.asarray(vy), "vy")
    path = w.write(out)
    print(f"wrote {path} (+ {w.nshards} per-shard pieces)")


if __name__ == "__main__":
    main()
