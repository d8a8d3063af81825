"""fp64-on-TPU at scale: BASELINE configs in full fp64 on the real chip,
iteration-parity-checked against the CPU goldens, plus one >=16M-DOF fp64
matrix-free CG throughput datapoint.

The north star (BASELINE.json) demands residual/iteration parity "to fp64
tolerance"; fp64 is software-emulated on v5e, so this is the correctness
mode — production runs stay fp32/bf16 (PERFORMANCE.md).

Run ON THE TPU:  python benchmarks/fp64_tpu.py [config names...]
                 python benchmarks/fp64_tpu.py big        # 16.8M-DOF point
Default: configs 2, 3, 5 + the big datapoint.
"""
import json
import os
import sys
import time

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))

_ITER_KEYS = ("iterations", "newton_iterations", "levels", "ndevices",
              "converged", "ndofs")


def log(msg):
    print(f"[fp64_tpu] {msg}", file=sys.stderr, flush=True)


def run_config(name):
    from dune_pdelab_tpu.models import configs as C
    golden = json.load(open(os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "..", "tests", "golden_parity.json")))
    fn = getattr(C, name)
    t0 = time.perf_counter()
    got = fn()
    dt = time.perf_counter() - t0
    want = golden[name]
    ok = True
    for key, ref in want.items():
        val = float(got[key])
        if key in _ITER_KEYS:
            match = int(round(val)) == int(round(float(ref)))
        else:
            match = abs(val - float(ref)) <= 1e-9 * max(1.0, abs(float(ref)))
        ok &= match
        log(f"{name}.{key}: tpu={val!r} golden={ref!r} "
            f"{'OK' if match else 'MISMATCH'}")
    log(f"{name}: {'PARITY OK' if ok else 'PARITY FAILED'} ({dt:.1f}s wall)")
    return ok


def run_big(cells=255, iters=20):
    """>=16M-DOF fp64 datapoint: 3D Poisson Q1 matrix-free CG."""
    import dune_pdelab_tpu as pt
    from dune_pdelab_tpu.ops import (
        ConvectionDiffusionProblem, ConvectionDiffusionFEM)
    from dune_pdelab_tpu.assembly.stencil import compile_stencil
    from dune_pdelab_tpu.linalg import cg

    class P(ConvectionDiffusionProblem):
        def f(self, x):
            return jnp.ones(x.shape[:-1], x.dtype)

    mesh = pt.StructuredMesh([0, 0, 0], [1, 1, 1], (cells,) * 3)
    V = pt.FunctionSpace(mesh, pt.QkFEM(1, 3))
    p = P()
    cgm = pt.constraints(p.dirichlet_bctype(), V)
    go = pt.GridOperator(V, ConvectionDiffusionFEM(p), constraints=cgm,
                         skip_boundary=True)
    N = V.ndofs
    log(f"big fp64 point: N={N}")
    # slab-chunked RHS assembly: fp64 doubles the (E, nqp, nb, dim)
    # volume intermediates — one sweep at 16.6M elements exceeds HBM
    from dune_pdelab_tpu.assembly.slabbed import residual_slabbed
    b = residual_slabbed(V, ConvectionDiffusionFEM(p), cgm,
                         jnp.zeros(N, jnp.float64), nslabs=16)
    assert b.dtype == jnp.float64, b.dtype
    st = compile_stencil(go)
    assert st is not None
    op = st if st is not None else (
        lambda z: go.jacobian_apply(jnp.zeros(N, jnp.float64), z))

    @jax.jit
    def run(b):
        z, stats = cg(op, b, tol=0.0, atol=1e-300, maxiter=iters)
        return z, stats.iterations, stats.defect

    z, it, defect = run(b)
    _ = float(defect)  # hard sync (host transfer; PERFORMANCE.md caveat)
    t0 = time.perf_counter()
    z, it, defect = run(b)
    _ = float(defect)
    dt = time.perf_counter() - t0
    assert z.dtype == jnp.float64
    log(f"big fp64: {int(it)} CG iters in {dt:.2f}s = "
        f"{N*int(it)/dt/1e9:.3f} Gdof-iters/s (fp64, software-emulated), "
        f"final defect {float(defect):.6e}")


def main():
    args = sys.argv[1:] or ["config2_poisson_3d_gmg", "config3_convdiff_sipg",
                            "config5_stokes_taylor_hood",
                            "config12_simplex_amg", "big"]
    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    all_ok = True
    for a in args:
        if a == "big":
            run_big()
        else:
            all_ok &= run_config(a)
    log("ALL PARITY OK" if all_ok else "PARITY FAILURES PRESENT")


if __name__ == "__main__":
    main()
