"""Benchmark: matrix-free CG DOF-throughput on 3D Poisson Q1 (single chip).

The BASELINE.json primary metric: "matrix-free CG DOF-throughput" for 3D
Poisson (north star: 100M DOFs on v5p-8 at >60% of HBM roofline). This runs
the single-chip slice: fixed-iteration matrix-free CG on a Q1 structured
grid, fp32 (TPU performance mode), and reports

  value        = DOF-iterations / second (N * iters / wall)
  vs_baseline  = achieved fraction of HBM roofline under a simple byte model

Byte model per CG iteration (fp32): the operator application streams the DOF
vector through gather (read ~N), kernel, scatter-add (read+write ~2N), and
the CG vector updates touch ~6 reads + 3 writes of N => ~12 N * 4 bytes.
Roofline BW defaults to v5e (~819 GB/s); override with BENCH_HBM_GBPS.

Prints exactly one JSON line.
"""
import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import dune_pdelab_tpu as pt
    from dune_pdelab_tpu.ops import (
        ConvectionDiffusionProblem, ConvectionDiffusionFEM,
    )
    from dune_pdelab_tpu.linalg import cg

    # default 511 cells = 512^3 = 134M DOFs (the BASELINE.json north-star
    # scale); cells = 2^k - 1 gives lane-aligned 2^k DOF planes
    n = int(os.environ.get("BENCH_CELLS", "511"))
    iters = int(os.environ.get("BENCH_ITERS", "50"))
    hbm_gbps = float(os.environ.get("BENCH_HBM_GBPS", "819"))
    dtype = jnp.float32

    class P(ConvectionDiffusionProblem):
        def f(self, x):
            return jnp.ones(x.shape[:-1], x.dtype)

    def log(msg):
        print(f"[bench] {msg}", file=sys.stderr, flush=True)

    mesh = pt.StructuredMesh([0, 0, 0], [1, 1, 1], (n, n, n))
    V = pt.FunctionSpace(mesh, pt.QkFEM(1, 3))
    prob = P()
    cg_mask = pt.constraints(prob.dirichlet_bctype(), V)
    # pure-Dirichlet problem: skip boundary kernels (their terms vanish)
    go = pt.GridOperator(V, ConvectionDiffusionFEM(prob), constraints=cg_mask,
                         skip_boundary=True)
    N = V.ndofs
    log(f"setup done, N={N}")

    x0 = jnp.zeros(N, dtype)
    if N > 40_000_000:
        # slab-chunked RHS assembly: the batched volume intermediates
        # ((E, nqp, dim) arrays) exceed HBM in one sweep at 100M+ DOFs
        from dune_pdelab_tpu.assembly.slabbed import residual_slabbed
        b = residual_slabbed(V, ConvectionDiffusionFEM(prob), cg_mask, x0,
                             nslabs=16)
    else:
        b = go.residual(x0)
    log("residual assembled")

    # compile the translation-invariant operator into a shift-MAC stencil
    # (assembly/stencil.py) — the structured-mesh SpMV fast path; fall back
    # to the general jvp-based matrix-free apply
    from dune_pdelab_tpu.assembly.stencil import compile_stencil
    st = compile_stencil(go)
    log(f"stencil compiled: {st is not None}")

    run = None
    if st is not None and os.environ.get("BENCH_NO_PALLAS") != "1":
        # fully fused CG: 2 Pallas passes/iter, in-kernel Dirichlet masks,
        # ~8N bytes real traffic vs the 12N naive model
        from dune_pdelab_tpu.assembly.fused_cg_pallas import (
            make_fused_cg, qualifies,
        )
        if qualifies(st) and os.environ.get("BENCH_NO_FUSED") != "1":
            solve = make_fused_cg(st, maxiter=iters, tol=0.0)

            def run(b):
                z, stats = solve(b)
                return z, stats.iterations, stats.defect
        else:
            from dune_pdelab_tpu.assembly.stencil_pallas_tile import (
                try_pallas_tiled_stencil,
            )
            tiled = try_pallas_tiled_stencil(st)
            if tiled is not None:
                st = tiled
    if run is None:
        operator = st if st is not None else (
            lambda p: go.jacobian_apply(x0, p))

        @jax.jit
        def run(b):
            z, stats = cg(operator, b, tol=0.0, atol=1e-30, maxiter=iters)
            return z, stats.iterations, stats.defect

    # NOTE: block_until_ready does not sync through the axon relay; a
    # scalar host transfer is the only true sync (PERFORMANCE.md).
    z, it, defect = run(b)
    _ = float(defect)  # warmup + compile + hard sync
    log("warmup done")
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        z, it, defect = run(b)
        _ = float(defect)
    dt = (time.perf_counter() - t0) / reps

    dof_iters_per_sec = N * int(it) / dt
    bytes_per_iter = 12.0 * N * 4
    achieved_gbps = bytes_per_iter * int(it) / dt / 1e9
    vs_baseline = achieved_gbps / hbm_gbps

    print(json.dumps({
        "metric": f"matrix-free CG DOF-iterations/sec (3D Poisson Q1, "
                  f"N={N}, fp32, {int(it)} iters)",
        "value": dof_iters_per_sec,
        "unit": "dof_iters/s",
        "vs_baseline": vs_baseline,
    }))


if __name__ == "__main__":
    main()
