"""On-device benchmark: assembled lattice-ELL SpMV + element-residual
assembly rate at >=16M DOFs (the assembled half of BASELINE's metric).

Run on the TPU:  python benchmarks/bench_assembled.py [cells]

Reports (stderr table):
  * device-side ELL assembly wall time (27 colored jvp probes + unscramble)
  * plain XLA ELL SpMV ms/apply and Gdof/s
  * plane-streamed Pallas ELL SpMV ms/apply, Gdof/s, GB/s on the
    (27+3)*4 B/DOF traffic model
  * general-path residual assembly rate (element residuals / s)
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


def timeit_chain(apply, z, K=20, reps=3):
    """Time K chained applies inside ONE jitted scan — per-dispatch relay
    latency (~2 ms, PERFORMANCE.md) would otherwise dominate a single
    SpMV; Krylov loops run the operator device-side exactly like this.
    CAVEAT: the remote compiler drops the connection on scan-wrapped
    Pallas kernels at 16M+ rows (broken pipe), so large-N timings fall
    back to plain repeated dispatch (reported numbers are then
    conservative by the ~2 ms dispatch latency per apply)."""
    from jax import lax

    @jax.jit
    def chain(z):
        # normalize each step so fp32 doesn't overflow across the chain
        def body(z, _):
            y = apply(z)
            return y / jnp.max(jnp.abs(y)), None
        z, _ = lax.scan(body, z, None, length=K)
        return z

    y = chain(z)
    sync(y)
    t0 = time.perf_counter()
    for _ in range(reps):
        y = chain(z)
    s = sync(y)
    return (time.perf_counter() - t0) / reps / K, s


def main():
    import dune_pdelab_tpu as pt
    from dune_pdelab_tpu.ops import (
        ConvectionDiffusionProblem, ConvectionDiffusionFEM)
    from dune_pdelab_tpu.assembly.ell import assemble_ell_device
    from dune_pdelab_tpu.assembly.ell_pallas import try_plane_ell

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 255
    dtype = jnp.float32

    class VarCoeff(ConvectionDiffusionProblem):
        def A(self, x):
            a = 1.0 + 0.5 * jnp.sin(3 * x[..., 0]) * x[..., 1]
            return a[..., None, None] * jnp.eye(x.shape[-1], dtype=x.dtype)

        def c(self, x):
            return 0.7 + x[..., 0]

        def f(self, x):
            return jnp.ones(x.shape[:-1], x.dtype)

    mesh = pt.StructuredMesh([0, 0, 0], [1, 1, 1], (n, n, n))
    V = pt.FunctionSpace(mesh, pt.QkFEM(1, 3))
    prob = VarCoeff()
    cg_mask = pt.constraints(True, V)
    go = pt.GridOperator(V, ConvectionDiffusionFEM(prob),
                         constraints=cg_mask, skip_boundary=True)
    N = V.ndofs
    E = mesh.nelements
    print(f"[assembled] N={N} E={E}", file=sys.stderr, flush=True)

    # --- general-path residual assembly rate ---
    x0 = jnp.zeros(N, dtype)
    t_res, _ = timeit(go.residual, x0, reps=3)
    print(f"[assembled] residual assembly: {t_res*1e3:.2f} ms "
          f"= {E/t_res/1e6:.1f} M elem-residuals/s "
          f"({N/t_res/1e9:.2f} Gdof/s)", file=sys.stderr, flush=True)

    # --- device-side ELL assembly ---
    t0 = time.perf_counter()
    ell = assemble_ell_device(go, x_lin=x0)
    sync(ell.values)
    t_asm = time.perf_counter() - t0
    print(f"[assembled] ELL device assembly: {t_asm:.1f} s "
          f"({N/t_asm/1e6:.2f} Mrows/s)", file=sys.stderr, flush=True)

    z = jnp.asarray(np.random.default_rng(0).standard_normal(N), dtype)

    # --- plain XLA ELL apply (the 27-term dynamic-slice lowering hangs the
    # remote XLA compiler at 16M+; measure it only at small N) ---
    s1 = None
    if N <= 4_000_000 or os.environ.get("BENCH_XLA_ELL") == "1":
        t_xla, s1 = timeit_chain(ell, z)
        print(f"[assembled] XLA ELL SpMV: {t_xla*1e3:.2f} ms = "
              f"{N/t_xla/1e9:.2f} Gdof/s", file=sys.stderr, flush=True)

    # --- plane-streamed Pallas ---
    streamed = try_plane_ell(ell)
    if streamed is None:
        print("[assembled] plane kernel: not applicable", file=sys.stderr)
        return
    if N <= 4_000_000:
        t_p, s2 = timeit_chain(streamed, z)
    else:
        t_p, s2 = timeit(streamed, z, reps=10)
    gbs = 30.0 * N * 4 / t_p / 1e9
    print(f"[assembled] Pallas plane ELL SpMV: {t_p*1e3:.2f} ms = "
          f"{N/t_p/1e9:.2f} Gdof/s, {gbs:.0f} GB/s on 30N model",
          file=sys.stderr, flush=True)

    # parity oracle vs the matrix-free apply (always available)
    zc = jnp.asarray(np.random.default_rng(1).standard_normal(N), dtype)
    y_mf = go.jacobian_apply(x0, zc)
    y_p = streamed(zc)
    rel = float(jnp.linalg.norm(y_mf - y_p) /
                jnp.maximum(1.0, jnp.linalg.norm(y_mf)))
    print(f"[assembled] parity streamed-vs-matrix-free: rel={rel:.2e}",
          file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
