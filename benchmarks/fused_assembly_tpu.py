"""TPU measurement: fused Pallas assembly vs the batched general path.

Variable-coefficient 3D Poisson Q1 (the bench.py assembled-half problem).
Prints M elem-res/s for both paths + parity. Usage:
    python benchmarks/fused_assembly_tpu.py [cells] [tz] [ty]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    cells = int(sys.argv[1]) if len(sys.argv) > 1 else 255
    tz = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    cy = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    import dune_pdelab_tpu as pt
    from dune_pdelab_tpu.ops import (
        ConvectionDiffusionProblem, ConvectionDiffusionFEM)
    from dune_pdelab_tpu.assembly.structured_fused import (
        make_fused_residual)

    class VarCoeff(ConvectionDiffusionProblem):
        def A(self, x):
            a = 1.0 + 0.5 * jnp.sin(3 * x[..., 0]) * x[..., 1]
            return a[..., None, None] * jnp.eye(x.shape[-1], dtype=x.dtype)

        def c(self, x):
            return 0.7 + x[..., 0]

        def f(self, x):
            return jnp.ones(x.shape[:-1], x.dtype)

    print(f"[fused] platform={jax.devices()[0].platform} cells={cells} "
          f"tz={tz} cy={cy}", flush=True)
    mesh = pt.StructuredMesh([0, 0, 0], [1, 1, 1], (cells,) * 3)
    V = pt.FunctionSpace(mesh, pt.QkFEM(1, 3))
    go = pt.GridOperator(V, ConvectionDiffusionFEM(VarCoeff()),
                         constraints=pt.constraints(True, V),
                         skip_boundary=True)
    N, E = V.ndofs, mesh.nelements
    print(f"[fused] N={N} E={E}", flush=True)

    def sync(v):
        return float(jnp.sum(v))

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(N), jnp.float32)

    fused = make_fused_residual(go, tz=tz, cy=cy)
    assert fused is not None
    t0 = time.perf_counter()
    s_f = sync(fused(x))
    print(f"[fused] fused compile+run: {time.perf_counter()-t0:.1f} s",
          flush=True)
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        y = fused(x)
    sync(y)
    t_f = (time.perf_counter() - t0) / reps
    print(f"[fused] fused residual: {t_f*1e3:.2f} ms = "
          f"{E/t_f/1e6:.0f} M elem-res/s", flush=True)

    if cells <= 128:
        r_ref = np.asarray(go.residual(x))
        r_f = np.asarray(fused(x))
        err = float(np.abs(r_f - r_ref).max() / max(1.0,
                    np.abs(r_ref).max()))
        print(f"[fused] parity vs batched: rel err {err:.2e}", flush=True)
    else:
        t0 = time.perf_counter()
        sync(go.residual(x))
        print(f"[fused] batched compile+run: {time.perf_counter()-t0:.1f} s",
              flush=True)
        t0 = time.perf_counter()
        for _ in range(reps):
            y = go.residual(x)
        sync(y)
        t_b = (time.perf_counter() - t0) / reps
        print(f"[fused] batched residual: {t_b*1e3:.2f} ms = "
              f"{E/t_b/1e6:.0f} M elem-res/s (fused speedup "
              f"{t_b/t_f:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
