"""Parallel tutorial analog: the same Poisson problem solved on a device
mesh with DOF sharding + ppermute halo exchange (reference: the
overlapping/nonoverlapping ISTL backends, dune/pdelab/backend/istl/
novlpistlsolverbackend.hh; here jax.sharding over ICI replaces MPI).

Works on real multi-chip hardware unchanged; this script forces an
8-device virtual CPU mesh so it runs anywhere.

Run: python examples/07_parallel_poisson.py
"""
import os

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
from dune_pdelab_tpu.ops import (
    ConvectionDiffusionProblem, ConvectionDiffusionFEM,
)
from dune_pdelab_tpu.parallel.novlp import NonoverlappingShardedGridOperator
from dune_pdelab_tpu.solvers import SEQ_CG_Jacobi
from dune_pdelab_tpu.space.functions import l2_difference


class Problem(ConvectionDiffusionProblem):
    def exact(self, p):
        return np.sin(np.pi * p[:, 0]) * np.cos(2 * np.pi * p[:, 1]) + p[:, 0]

    def f(self, x):
        return 5 * np.pi ** 2 * jnp.sin(np.pi * x[..., 0]) * jnp.cos(
            2 * np.pi * x[..., 1])

    def g(self, x):
        return (jnp.sin(np.pi * x[..., 0]) * jnp.cos(2 * np.pi * x[..., 1])
                + x[..., 0])


def main():
    print(f"devices: {len(jax.devices())}")
    prob = Problem()
    mesh = pt.StructuredMesh([0, 0], [1, 1], (64, 64))
    V = pt.FunctionSpace(mesh, pt.QkFEM(1, 2))
    cg = pt.constraints(prob.dirichlet_bctype(), V)
    go = pt.GridOperator(V, ConvectionDiffusionFEM(prob), constraints=cg)

    # sequential reference
    x0 = pt.interpolate_dirichlet(
        lambda q: np.asarray(prob.g(jnp.asarray(q))), V, cg, V.zero())
    seq = pt.StationaryLinearProblemSolver(
        go, SEQ_CG_Jacobi(), reduction=1e-11).apply(x0)

    # block-DOF-sharded: halo-window gathers + border add-exchange; any
    # local operator works (DG included)
    sgo = NonoverlappingShardedGridOperator(go)
    b = sgo.residual(x0)
    diag = go.jacobian_diagonal(x0)
    z, stats = sgo.solve_cg(x0, b, diag=diag, tol=1e-11)
    x_par = x0 - z

    diff = float(jnp.max(jnp.abs(x_par - seq)))
    err = float(l2_difference(V, x_par, prob.exact))
    print(f"CG iterations: {int(stats.iterations)} (sharded)")
    print(f"max |x_par - x_seq| = {diff:.2e}")
    print(f"L2 error vs exact  = {err:.3e}")


if __name__ == "__main__":
    main()
