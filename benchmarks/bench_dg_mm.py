"""On-device DG block-stencil benchmark: mode-major Pallas vs lane-roll
Pallas vs XLA conv vs general path (3D Q1 DG SIPG at 128^3 = 16.8M DOFs).

Run on the TPU:  python benchmarks/bench_dg_mm.py [cells_per_dim]
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))


def sync(x):
    return float(jnp.sum(x))


def timeit(fn, *args, reps=5):
    y = fn(*args)
    sync(y)
    t0 = time.perf_counter()
    for _ in range(reps):
        y = fn(*args)
    s = sync(y)
    return (time.perf_counter() - t0) / reps, s


def main():
    import dune_pdelab_tpu as pt
    from dune_pdelab_tpu.fe import QkDGFEM
    from dune_pdelab_tpu.ops import ConvectionDiffusionProblem
    from dune_pdelab_tpu.ops.convectiondiffusiondg import ConvectionDiffusionDG
    from dune_pdelab_tpu.assembly.blockstencil import compile_block_stencil
    from dune_pdelab_tpu.assembly.blockstencil_pallas import (
        try_pallas_block_stencil)
    from dune_pdelab_tpu.assembly.blockstencil_mm import try_mm_block_stencil

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128

    class Diff(ConvectionDiffusionProblem):
        def f(self, x):
            return jnp.ones(x.shape[:-1], x.dtype)

        def g(self, x):
            return jnp.zeros(x.shape[:-1])

    mesh = pt.StructuredMesh([0, 0, 0], [1, 1, 1], (n, n, n))
    V = pt.FunctionSpace(mesh, QkDGFEM(1, 3))
    go = pt.GridOperator(V, ConvectionDiffusionDG(Diff()))
    N = V.ndofs
    print(f"[dg] N={N}", file=sys.stderr, flush=True)

    st = compile_block_stencil(go)
    assert st is not None
    z = jnp.asarray(np.random.default_rng(0).standard_normal(N), jnp.float32)

    t_conv, s0 = timeit(st, z)
    print(f"[dg] XLA conv block stencil: {t_conv*1e3:.2f} ms = "
          f"{N/t_conv/1e9:.2f} Gdof/s", file=sys.stderr, flush=True)

    lane = try_pallas_block_stencil(st)
    if lane is not None:
        t_l, s1 = timeit(lane, z)
        print(f"[dg] lane-roll Pallas: {t_l*1e3:.2f} ms = "
              f"{N/t_l/1e9:.2f} Gdof/s", file=sys.stderr, flush=True)

    bz = int(os.environ.get("DG_BZ", "8"))
    modes = os.environ.get("DG_MODES", "vpu,mxu,mxu2,mxu3").split(",")
    for mode in modes:
        mm = try_mm_block_stencil(st, mode=mode, bz=bz)
        assert mm is not None
        apply_flat, apply_mm, to_mm, from_mm = mm
        t_f, s2 = timeit(apply_flat, z)
        print(f"[dg] mode-major/{mode} (flat, incl transposes): "
              f"{t_f*1e3:.2f} ms = {N/t_f/1e9:.2f} Gdof/s",
              file=sys.stderr, flush=True)

        zmm = jax.device_put(to_mm(z))
        t_m, s3 = timeit(apply_mm, zmm)
        print(f"[dg] mode-major/{mode} (mm-resident): {t_m*1e3:.2f} ms = "
              f"{N/t_m/1e9:.2f} Gdof/s "
              f"({2*4*N/t_m/1e9:.0f} GB/s on 2N model)",
              file=sys.stderr, flush=True)

        y0 = np.asarray(st(z))[: 1 << 20]
        y2 = np.asarray(apply_flat(z))[: 1 << 20]
        rel = np.linalg.norm(y0 - y2) / max(1.0, np.linalg.norm(y0))
        print(f"[dg] parity vs XLA conv (first 1M rows, {mode}): "
              f"rel={rel:.2e}", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
