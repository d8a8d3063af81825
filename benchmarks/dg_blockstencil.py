"""On-device benchmark: SIPG DG operator apply — general (jvp + slab face
transfers) vs compiled block stencil (shift-matmuls). Run on TPU:

    python benchmarks/dg_blockstencil.py [n] [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import dune_pdelab_tpu as pt
from dune_pdelab_tpu.assembly.blockstencil import compile_block_stencil
from dune_pdelab_tpu.fe import QkDGFEM
from dune_pdelab_tpu.ops import ConvectionDiffusionProblem
from dune_pdelab_tpu.ops.convectiondiffusiondg import ConvectionDiffusionDG


class P(ConvectionDiffusionProblem):
    def b(self, x):
        return jnp.asarray([1.0, 0.5])

    def f(self, x):
        return jnp.zeros(x.shape[:-1])

    def g(self, x):
        return jnp.zeros(x.shape[:-1])


def sync(x):
    return float(jnp.sum(x))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    dtype = jnp.float32
    mesh = pt.StructuredMesh([0, 0], [1, 1], (n, n))
    V = pt.FunctionSpace(mesh, QkDGFEM(1, 2))
    go = pt.GridOperator(V, ConvectionDiffusionDG(P()))
    N = V.ndofs
    print(f"N = {N} ({n}x{n} Q1DG), backend {jax.default_backend()}")
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.standard_normal(N), dtype)

    st = compile_block_stencil(go)
    assert st is not None
    x0 = jnp.zeros(N, dtype)

    gen = jax.jit(lambda p: go.jacobian_apply(x0, p))
    for name, fn in (("general", gen), ("blockstencil", jax.jit(st._apply_impl))):
        y = fn(z); sync(y)                      # compile + warm
        t0 = time.perf_counter()
        for _ in range(reps):
            y = fn(z)
        sync(y)
        dt = (time.perf_counter() - t0) / reps
        gb = 2 * N * 4 / dt / 1e9               # read z + write y
        print(f"{name:14s}: {dt*1e3:8.3f} ms/apply  {N/dt/1e6:9.1f} Mdof/s "
              f" (~{gb:.0f} GB/s effective)")
    y1, y2 = gen(z), st(z)
    d = float(jnp.max(jnp.abs(y1 - y2))) / max(1.0, float(jnp.max(jnp.abs(y1))))
    print(f"rel max |general - stencil| = {d:.2e}")


if __name__ == "__main__":
    main()
