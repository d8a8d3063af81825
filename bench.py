"""Benchmark: BOTH halves of BASELINE.json's primary metric (single chip).

Primary metric: "assembled element residuals/sec/chip; matrix-free CG
DOF-throughput" (north star: 100M DOFs on v5p-8 at >60% of HBM roofline).

Matrix-free half (headline value): fixed-iteration matrix-free CG on a Q1
structured grid, fp32 (TPU performance mode):
  value        = DOF-iterations / second (N * iters / wall)
  vs_baseline  = achieved fraction of HBM roofline under a simple byte model
Byte model per CG iteration (fp32): the operator application streams the DOF
vector through gather (read ~N), kernel, scatter-add (read+write ~2N), and
the CG vector updates touch ~6 reads + 3 writes of N => ~12 N * 4 bytes.
Roofline BW defaults to v5e (~819 GB/s); override with BENCH_HBM_GBPS.
A second key, vs_measured, divides the XLA-cost-analysis measured bytes
(compiled.cost_analysis()["bytes accessed"]) by the measured saxpy envelope
— the "one defensible roofline number" (no traffic-model overcounting).

Robustness contract (round-5 redesign — BENCH_r04 was lost to rc:124):
  * ONE global budget (BENCH_TOTAL_BUDGET_S, default 1800 s) pro-rates every
    stage budget; a stage that would not fit is skipped with a log line.
  * The cumulative JSON line is RE-PRINTED after every stage (flush) — the
    driver's "last JSON line on stdout" is complete up to the last finished
    stage even if the process is killed mid-run. SIGTERM prints it too.
  * The north-star solve table runs in a fresh SUBPROCESS: in round 4 the
    512^3 solve measured 45.15 s in-process (HBM pressure from the 134M-DOF
    headline buffers still alive) vs 2.44 s in the isolated refine child.

Stage keys (all optional except the headline):
  solve_*      north-star GMG-CG solve table, 64^3..512^3 (subprocess)
  refine_*     fp64-grade mixed-precision refinement at 512^3 (subprocess)
  assembled_*  general-path element residuals + ELL build + plane SpMV
  dg_*         DG block-stencil mm-resident apply throughput
  dgmg_*       DG two-level V-cycle cost per iteration (round-3 demand)
(reference hot path analog: BCRS SpMV + AMG-CG, dune/pdelab/backend/istl/
bcrsmatrix.hh + seqistlsolverbackend.hh:112-1060).

Prints the cumulative JSON line after every stage; the LAST line is the
complete record.
"""
import json
import os
import signal
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

_T0 = time.monotonic()
# default budget: the driver's observed window is ~30 min (BENCH_r04 was
# killed at rc 124 after ~25 min of output with the old per-stage budgets);
# 26 min of stages + overheads finishes INSIDE it, for rc 0 of record
_BUDGET = float(os.environ.get("BENCH_TOTAL_BUDGET_S", "1560"))

# persistent compilation cache: the tunneled TPU pays 30-250 s of remote
# compile PER PROGRAM; caching compiled executables on disk makes repeat
# bench runs (and the driver's run after a warm-up run) setup-cheap. Set
# via env so the subprocess stages inherit it. Harmless if the backend
# does not support serialization (jax just skips the cache).
if "JAX_COMPILATION_CACHE_DIR" not in os.environ:
    os.environ["JAX_COMPILATION_CACHE_DIR"] = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def _remaining():
    return _BUDGET - (time.monotonic() - _T0)


def _stage_budget(default_s, reserve_s):
    """Pro-rate: a stage gets its default, capped so reserve_s is left."""
    return int(min(default_s, _remaining() - reserve_s))


def _emit(out):
    print(json.dumps(out), flush=True)


def _install_term_handler(out):
    def handler(signum, frame):
        _emit(out)
        sys.stdout.flush()
        os._exit(0)
    signal.signal(signal.SIGTERM, handler)


def _probe_devices(budget_s):
    """Fail fast if the device backend cannot initialize.

    The axon relay tunnel can be down for hours; when it is, jax backend
    init hangs inside C++ (not interruptible by SIGALRM), so the probe
    runs in a subprocess that can be killed. Returns the probed platform
    string, or raises RuntimeError on timeout/failure.
    """
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            capture_output=True, text=True, timeout=budget_s)
    except subprocess.TimeoutExpired:
        raise RuntimeError(
            f"device backend init did not complete within {budget_s}s "
            "(axon tunnel down?) — refusing to hang; re-run when the "
            "tunnel is up")
    if r.returncode != 0:
        raise RuntimeError(f"device probe failed: {r.stderr.strip()[-500:]}")
    return r.stdout.strip()


def _subprocess_stage(log, stage, budget_s, extra_env=None):
    """Run this script with BENCH_STAGE=stage in a child; return the dict
    parsed from the LAST JSON line of its stdout. Children print their
    cumulative JSON incrementally, so even a timed-out child yields the
    stages it finished (TimeoutExpired carries the captured output)."""
    import subprocess
    env = dict(os.environ)
    env["BENCH_STAGE"] = stage
    env.update(extra_env or {})
    stdout = ""
    try:
        r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                           capture_output=True, text=True, timeout=budget_s,
                           env=env)
        stdout, stderr, rc = r.stdout, r.stderr, r.returncode
    except subprocess.TimeoutExpired as e:
        stdout = (e.stdout or b"").decode() if isinstance(e.stdout, bytes) \
            else (e.stdout or "")
        stderr = (e.stderr or b"").decode() if isinstance(e.stderr, bytes) \
            else (e.stderr or "")
        rc = "timeout"
    for line in (stderr or "").splitlines():
        log(f"({stage}) {line}")
    last = None
    for line in (stdout or "").splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                last = json.loads(line)
            except json.JSONDecodeError:
                pass
    if last is None:
        raise RuntimeError(f"{stage} stage produced no JSON (rc={rc}): "
                           f"{(stderr or '')[-300:]}")
    if rc == "timeout":
        last[f"{stage}_timed_out"] = True
    return last


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    if os.environ.get("BENCH_CPU") == "1":
        # local smoke-testing: the sitecustomize pins the axon platform,
        # so JAX_PLATFORMS alone cannot force CPU (see tests/conftest.py)
        jax.config.update("jax_platforms", "cpu")
        os.environ["BENCH_DEVICE_PROBE_S"] = "0"
    out = {}
    _install_term_handler(out)

    def log(msg):
        print(f"[bench] {msg}", file=sys.stderr, flush=True)

    probe_s = int(os.environ.get("BENCH_DEVICE_PROBE_S", "600"))
    if probe_s > 0:
        platform = _probe_devices(min(probe_s, max(60, int(_remaining()))))
        log(f"device platform: {platform}")
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
    solve_jit = None
    fused_path = False
    if st is not None and os.environ.get("BENCH_NO_PALLAS") != "1":
        # fully fused CG: 2 Pallas passes/iter, in-kernel Dirichlet masks,
        # ~8N bytes real traffic vs the 12N naive model
        from dune_pdelab_tpu.assembly.fused_cg_pallas import (
            make_fused_cg, qualifies,
        )
        if qualifies(st) and os.environ.get("BENCH_NO_FUSED") != "1":
            solve_jit = make_fused_cg(st, maxiter=iters, tol=0.0)
            fused_path = True

            def run(b):
                z, stats = solve_jit(b)
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
        def solve_jit(b):
            z, stats = cg(operator, b, tol=0.0, atol=1e-30, maxiter=iters)
            return z, stats.iterations, stats.defect

        def run(b):
            z, it, defect = solve_jit(b)
            return z, it, defect

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

    out.update({
        "metric": f"matrix-free CG DOF-iterations/sec (3D Poisson Q1, "
                  f"N={N}, fp32, {int(it)} iters)",
        "value": dof_iters_per_sec,
        "unit": "dof_iters/s",
        "vs_baseline": vs_baseline,
    })

    # measured-envelope calibration: what THIS chip actually streams on a
    # saxpy (3N*4 bytes/op). vs_baseline stays spec-sheet-conservative;
    # vs_envelope reports the fraction of the measured device envelope.
    env_gbps = None
    try:
        # 10 chained saxpys inside ONE jit: the relay's ~2 ms Python
        # dispatch overhead (same order as one 537 MB saxpy!) is paid
        # once and amortized 10x — the per-iteration wall is the true
        # streaming envelope. Each iteration reads y+b, writes y (3N).
        reps_env = 10

        @jax.jit
        def calib(bb):
            return jax.lax.fori_loop(
                0, reps_env, lambda i, y: 0.999 * y + bb, bb)

        y = calib(b)
        _ = float(jnp.sum(y))          # compile + sync
        t0 = time.perf_counter()
        y = calib(b)
        _ = float(jnp.sum(y))
        t_cal = (time.perf_counter() - t0) / reps_env
        env_gbps = 3.0 * N * 4 / t_cal / 1e9
        out["envelope_gbps"] = env_gbps
        out["vs_envelope"] = achieved_gbps / env_gbps
        log(f"saxpy envelope: {env_gbps:.0f} GB/s; "
            f"vs_envelope={out['vs_envelope']:.3f}")
        del y
    except Exception as e:
        log(f"envelope calibration skipped: {e}")

    # the defensible roofline number: XLA's own measured bytes for the
    # whole compiled solve, divided by wall and the measured envelope —
    # no hand traffic model on either side of the fraction
    try:
        if fused_path:
            # XLA cost_analysis reports ~0 bytes for Pallas custom calls,
            # so for the fused path count the kernels' HBM DMA exactly
            # from their block specs (fused_cg_pallas): K1 streams r+p in
            # and p' out (3N), K2 streams p+x+r in and x'+r' out (5N);
            # every plane is DMA'd exactly once per pass (3-slot ring).
            dma_bytes = 8.0 * N * 4 * int(it)
            if env_gbps:
                meas_gbps = dma_bytes / dt / 1e9
                out["kernel_dma_bytes"] = dma_bytes
                out["measured_traffic_gbps"] = meas_gbps
                out["vs_measured"] = meas_gbps / env_gbps
                log(f"fused-kernel DMA traffic: {meas_gbps:.0f} GB/s; "
                    f"vs_measured={out['vs_measured']:.3f}")
        else:
            ca = solve_jit.lower(b).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            xla_bytes = float(ca.get("bytes accessed", 0.0))
            if xla_bytes > 0 and env_gbps:
                meas_gbps = xla_bytes / dt / 1e9
                out["xla_bytes_accessed"] = xla_bytes
                out["measured_traffic_gbps"] = meas_gbps
                out["vs_measured"] = meas_gbps / env_gbps
                log(f"XLA measured traffic: {meas_gbps:.0f} GB/s; "
                    f"vs_measured={out['vs_measured']:.3f}")
    except Exception as e:
        log(f"cost-analysis roofline skipped: {type(e).__name__}: {e}")

    _emit(out)

    # free the 134M-DOF headline buffers BEFORE any in-process stage: in
    # round 4 the in-process 512^3 solve measured 45 s (HBM paging) while
    # the isolated child measured 2.44 s on the same chip
    import gc
    del b, z, x0, go, V, mesh, st, run, solve_jit
    gc.collect()

    if os.environ.get("BENCH_SOLVE", "1") != "0" and _remaining() > 240:
        # the north-star SOLVE table in a fresh subprocess (HBM isolation)
        budget = _stage_budget(
            int(os.environ.get("BENCH_SOLVE_BUDGET_S", "900")), 300)
        try:
            out.update(_subprocess_stage(log, "solve", budget))
        except BaseException as e:
            log(f"solve half skipped: {type(e).__name__}: {e}")
        _emit(out)

    if os.environ.get("BENCH_VARSOLVE", "1") != "0" and _remaining() > 240:
        # variable-coefficient north star (VERDICT r4 item 4): rediscretized
        # matrix-free GMG (linalg/gmg_varcoeff.py) on A(x) Poisson — removes
        # LatticeGMG's translation-invariance asterisk at scale
        budget = _stage_budget(
            int(os.environ.get("BENCH_VARSOLVE_BUDGET_S", "900")), 250)
        try:
            out.update(_subprocess_stage(log, "varsolve", budget))
        except BaseException as e:
            log(f"varsolve half skipped: {type(e).__name__}: {e}")
        _emit(out)

    if os.environ.get("BENCH_REFINE", "1") != "0" and _remaining() > 180:
        # fp64-grade north star: mixed-precision refinement (fp64 defect /
        # fp32 GMG-CG inner) in a subprocess with x64 enabled, so the
        # fp32 performance mode of this process stays untouched
        budget = _stage_budget(
            int(os.environ.get("BENCH_REFINE_BUDGET_S", "600")), 200)
        try:
            out.update(_subprocess_stage(log, "refine", budget,
                                         {"JAX_ENABLE_X64": "1"}))
        except BaseException as e:
            log(f"refine half skipped: {type(e).__name__}: {e}")
        _emit(out)

    if os.environ.get("BENCH_ASSEMBLED", "1") != "0" and _remaining() > 150:
        # fallback chain: the 255^3 BATCHED general-residual remote compile
        # has hit a TPU-compiler SIGILL (TpuPriorityFusionQueue cost model)
        # on the current v5e tunnel, while the qp-looped variant of the
        # same kernel compiles (smaller fusion graph) — retry with it
        # before shrinking the mesh
        for cells, qp_loop, default_b in (
                (None, False,
                 int(os.environ.get("BENCH_ASM_BUDGET_S", "600"))),
                (None, True, 400), (191, False, 300), (127, False, 200)):
            budget = _stage_budget(default_b, 100)
            if budget < 60:
                log("assembled half skipped: out of budget")
                break
            try:
                out.update(_with_timeout(_assembled_half, budget, log,
                                         cells, qp_loop))
                break
            except BaseException as e:   # never lose the headline line
                log(f"assembled half (cells={cells}, qp_loop={qp_loop}) "
                    f"skipped: {type(e).__name__}: {e}")
        _emit(out)

    if os.environ.get("BENCH_DG", "1") != "0" and _remaining() > 120:
        # DG fast-path throughput (the block-stencil mm-resident apply)
        for cells, default_b in ((128, int(os.environ.get(
                "BENCH_DG_BUDGET_S", "400"))), (64, 240)):
            budget = _stage_budget(default_b, 60)
            if budget < 60:
                log("DG half skipped: out of budget")
                break
            try:
                out.update(_with_timeout(_dg_half, budget, log, cells))
                break
            except BaseException as e:
                log(f"DG half (cells={cells}) skipped: "
                    f"{type(e).__name__}: {e}")
        _emit(out)

    if os.environ.get("BENCH_DGMG", "1") != "0" and _remaining() > 90:
        # DG two-level V-cycle cost per iteration (the round-3 demand that
        # round 4 shipped structural cuts for but never measured on chip)
        budget = _stage_budget(
            int(os.environ.get("BENCH_DGMG_BUDGET_S", "400")), 30)
        try:
            out.update(_with_timeout(_dgmg_half, budget, log))
        except BaseException as e:
            log(f"DG-MG half skipped: {type(e).__name__}: {e}")

    _emit(out)


def _with_timeout(fn, seconds, *args):
    def handler(signum, frame):
        raise TimeoutError(f"stage budget ({seconds}s) exceeded")

    old = signal.signal(signal.SIGALRM, handler)
    signal.alarm(max(1, int(seconds)))
    try:
        return fn(*args)
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


_DISPATCH_S = None


def _dispatch_overhead():
    """Per-Python-dispatch overhead of the device path (the axon relay
    serializes dispatches at ~2 ms each; measured 1.9 ms of a 3.7 ms
    per-call Pallas apply at 2M DOFs while the same kernel runs 1.84 ms
    inside a fori_loop). Measured once with a pre-compiled trivial jit and
    subtracted from per-call kernel timings — the fori_loop alternative is
    exact but costs 60-75 s of remote compile per kernel, which blows the
    bench budget. Returns seconds; ~0 on local CPU."""
    global _DISPATCH_S
    if _DISPATCH_S is None:
        import jax
        import jax.numpy as jnp

        g = jax.jit(lambda v: v * 1.0000001)
        x = jnp.ones(8, jnp.float32)
        x = g(x)
        _ = float(x[0])                     # compile + sync
        t0 = time.perf_counter()
        reps = 30
        for _i in range(reps):
            x = g(x)
        _ = float(x[0])
        _DISPATCH_S = (time.perf_counter() - t0) / reps
    return _DISPATCH_S


def _refine_main():
    """Child-process entry: solve the north-star problem to a TRUE fp64
    relative defect of 1e-8 by defect-correction refinement around the
    fp32 lattice-GMG-CG inner solve. The fp32 solve alone floors at a
    true defect of ~1e-3 relative at 512^3 (eps_32 * kappa); this stage
    is the BASELINE.json fp64-parity answer at production speed."""
    import jax.numpy as jnp
    import dune_pdelab_tpu as pt
    from dune_pdelab_tpu.ops import (
        ConvectionDiffusionProblem, ConvectionDiffusionFEM)
    from dune_pdelab_tpu.assembly.stencil import compile_stencil
    from dune_pdelab_tpu.linalg.gmg_lattice import LatticeGMG
    from dune_pdelab_tpu.solvers.refinement import refine_solve

    def log(msg):
        print(f"[refine] {msg}", file=sys.stderr, flush=True)

    assert jnp.zeros(1).dtype == jnp.float64, "x64 not enabled"

    class P(ConvectionDiffusionProblem):
        def f(self, x):
            return jnp.ones(x.shape[:-1], x.dtype)

    n = int(os.environ.get("BENCH_REFINE_CELLS", "512"))
    mesh = pt.StructuredMesh([0, 0, 0], [1, 1, 1], (n, n, n))
    V = pt.FunctionSpace(mesh, pt.QkFEM(1, 3))
    prob = P()
    cg_mask = pt.constraints(prob.dirichlet_bctype(), V)
    lop = ConvectionDiffusionFEM(prob)
    go = pt.GridOperator(V, lop, constraints=cg_mask, skip_boundary=True)
    N = V.ndofs
    x0 = jnp.zeros(N, jnp.float64)
    if N > 20_000_000:
        from dune_pdelab_tpu.assembly.slabbed import residual_slabbed
        b = -residual_slabbed(V, lop, cg_mask, x0, nslabs=32)
    else:
        b = -go.residual(x0)
    log(f"N={N}, b assembled in fp64")
    st = compile_stencil(go)
    gmg = LatticeGMG(V, lop, fine_stencil=st)

    inner_its = []

    def inner(r32):
        z, info = gmg.solve_host(r32, tol=1e-4, maxiter=30)
        inner_its.append(info["iterations"])
        return z

    # warm all compiles (fp32 V-cycle + steps, fp64 stencil apply)
    _ = float(jnp.sum(gmg.apply(b.astype(jnp.float32))))
    _ = float(jnp.sum(st(b)))
    log("compiles warm")

    # fp32-only solve wall (the performance mode to compare against) —
    # run twice: the first call compiles the fused host-loop steps
    b32 = b.astype(jnp.float32)
    _, _ = gmg.solve_host(b32, tol=1e-8, maxiter=100)
    t0 = time.perf_counter()
    _, info32 = gmg.solve_host(b32, tol=1e-8, maxiter=100)
    t_fp32 = time.perf_counter() - t0
    log(f"fp32 solve: {info32['iterations']} its in {t_fp32:.2f} s, "
        f"true rel defect {info32['true_defect']/info32['defect0']:.2e}")

    t0 = time.perf_counter()
    x, stats = refine_solve(st, inner, b, tol=1e-8, max_outer=8)
    t_ref = time.perf_counter() - t0
    true_rel = stats.defect / stats.defect0
    log(f"refined: {stats.outer_iterations} outer sweeps "
        f"({'+'.join(str(i) for i in inner_its)} inner its) in {t_ref:.2f} s, "
        f"TRUE fp64 rel defect {true_rel:.2e}")
    print(json.dumps({
        "refine_N": N,
        "refine_outer": stats.outer_iterations,
        "refine_inner_its": sum(inner_its),
        "refine_s": t_ref,
        "refine_true_rel_defect_fp64": true_rel,
        "refine_converged": bool(stats.converged),
        "refine_fp32_solve_s": t_fp32,
        "refine_fp32_true_rel_defect": (
            info32["true_defect"] / info32["defect0"]),
        "refine_vs_fp32_wall": t_ref / t_fp32,
    }), flush=True)


def _varsolve_main():
    """Child-process entry: the VARIABLE-COEFFICIENT north star. Solves
    -div(A(x) grad u) = 1 with smooth A(x) = 1 + 0.5 sin(pi x) sin(pi y)
    sin(pi z) by rediscretized matrix-free GMG-CG (linalg/gmg_varcoeff.py:
    every level applies through the fused Pallas kernel; 27-comb probes
    give exact Chebyshev bounds), across two sizes to show flat iteration
    counts — the reference's AMG-CG solves any assembled operator at scale
    (dune/pdelab/backend/istl/seqistlsolverbackend.hh:983); this is the
    structured-mesh TPU answer without LatticeGMG's translation-invariance
    restriction."""
    import gc
    import jax.numpy as jnp
    import dune_pdelab_tpu as pt
    from dune_pdelab_tpu.ops import (
        ConvectionDiffusionProblem, ConvectionDiffusionFEM)
    from dune_pdelab_tpu.linalg.gmg_varcoeff import VarCoeffGMG

    def log(msg):
        print(f"[varsolve] {msg}", file=sys.stderr, flush=True)

    class VarP(ConvectionDiffusionProblem):
        def A(self, x):
            import math
            s = jnp.sin(math.pi * x[..., 0]) * jnp.sin(
                math.pi * x[..., 1]) * jnp.sin(math.pi * x[..., 2])
            return 1.0 + 0.5 * s

        def f(self, x):
            return jnp.ones(x.shape[:-1], x.dtype)

    sizes = [int(s) for s in os.environ.get(
        "BENCH_VARSOLVE_CELLS", "256,512").split(",")]
    tol = float(os.environ.get("BENCH_VARSOLVE_TOL", "1e-8"))
    iters_by_n = {}
    res = {}
    for n in sizes:
        mesh = pt.StructuredMesh([0, 0, 0], [1, 1, 1], (n, n, n))
        V = pt.FunctionSpace(mesh, pt.QkFEM(1, 3))
        prob = VarP()
        cg_mask = pt.constraints(prob.dirichlet_bctype(), V)
        lop = ConvectionDiffusionFEM(prob)
        go = pt.GridOperator(V, lop, constraints=cg_mask,
                             skip_boundary=True)
        N = V.ndofs
        x0 = jnp.zeros(N, jnp.float32)
        if N > 40_000_000:
            from dune_pdelab_tpu.assembly.slabbed import residual_slabbed
            b = -residual_slabbed(V, lop, cg_mask, x0, nslabs=16)
        else:
            b = -go.residual(x0)
        t0 = time.perf_counter()
        gmg = VarCoeffGMG(go, coarsest_cells=4)
        _ = float(jnp.sum(gmg.apply(b)))       # warm the V-cycle compiles
        t_setup = time.perf_counter() - t0
        x, info = gmg.solve_host(b, tol=tol, maxiter=100)
        t0 = time.perf_counter()
        x, info = gmg.solve_host(b, tol=tol, maxiter=100)
        t_solve = time.perf_counter() - t0
        iters_by_n[n] = info["iterations"]
        log(f"varsolve {n}^3 (N={N}): {info['iterations']} its in "
            f"{t_solve:.3f} s (setup+compile {t_setup:.1f} s), "
            f"true rel defect {info['true_defect']/info['defect0']:.2e}, "
            f"converged={info['converged']}")
        res.update({
            "varsolve_N": N,
            "varsolve_iterations": info["iterations"],
            "varsolve_converged": bool(info["converged"]),
            "varsolve_s": t_solve,
            "varsolve_setup_s": t_setup,
            "varsolve_dofs_per_s": N / t_solve,
            "varsolve_true_rel_defect": (
                info["true_defect"] / info["defect0"]),
            "varsolve_iters_by_n": iters_by_n,
        })
        print(json.dumps(res), flush=True)
        del x, b, gmg, go, V, mesh
        gc.collect()


def _solve_main():
    """Child-process entry for the north-star SOLVE table (BASELINE.json:
    assemble+solve 3D Poisson at 100M+ DOFs): lattice-GMG-preconditioned
    CG driven to 1e-8 relative defect in fp32, across 64^3..512^3 cells.
    Prints the cumulative JSON after EVERY size, so a timeout preserves
    the completed rows. Runs isolated so no other stage's buffers pollute
    HBM (the round-4 45-s-vs-2.4-s lesson).

    Reference analog: ISTLBackend_SEQ_CG_AMG_SSOR driven by
    StationaryLinearProblemSolver (dune/pdelab/backend/istl/
    seqistlsolverbackend.hh:983, stationary/linearproblem.hh:182-278)."""
    import gc
    import jax.numpy as jnp
    import dune_pdelab_tpu as pt
    from dune_pdelab_tpu.ops import (
        ConvectionDiffusionProblem, ConvectionDiffusionFEM)
    from dune_pdelab_tpu.assembly.stencil import compile_stencil
    from dune_pdelab_tpu.linalg.gmg_lattice import LatticeGMG

    def log(msg):
        print(f"[solve] {msg}", file=sys.stderr, flush=True)

    class P(ConvectionDiffusionProblem):
        def f(self, x):
            return jnp.ones(x.shape[:-1], x.dtype)

    sizes = [int(s) for s in os.environ.get(
        "BENCH_SOLVE_CELLS", "64,128,256,512").split(",")]
    tol = float(os.environ.get("BENCH_SOLVE_TOL", "1e-8"))
    iters_by_n = {}
    res = {}
    for n in sizes:
        mesh = pt.StructuredMesh([0, 0, 0], [1, 1, 1], (n, n, n))
        V = pt.FunctionSpace(mesh, pt.QkFEM(1, 3))
        prob = P()
        cg_mask = pt.constraints(prob.dirichlet_bctype(), V)
        lop = ConvectionDiffusionFEM(prob)
        go = pt.GridOperator(V, lop, constraints=cg_mask,
                             skip_boundary=True)
        N = V.ndofs
        x0 = jnp.zeros(N, jnp.float32)
        if N > 40_000_000:
            from dune_pdelab_tpu.assembly.slabbed import residual_slabbed
            b = -residual_slabbed(V, lop, cg_mask, x0, nslabs=16)
        else:
            b = -go.residual(x0)
        t0 = time.perf_counter()
        st = compile_stencil(go)
        gmg = LatticeGMG(V, lop, fine_stencil=st)
        # warm the V-cycle + fused-step compiles before timing the solve
        _ = float(jnp.sum(gmg.apply(b)))
        t_setup = time.perf_counter() - t0
        x, info = gmg.solve_host(b, tol=tol, maxiter=100)
        t0 = time.perf_counter()
        x, info = gmg.solve_host(b, tol=tol, maxiter=100)
        t_solve = time.perf_counter() - t0
        iters_by_n[n] = info["iterations"]
        log(f"solve {n}^3 (N={N}): {info['iterations']} its in "
            f"{t_solve:.3f} s (setup+compile {t_setup:.1f} s), "
            f"true rel defect {info['true_defect']/info['defect0']:.2e}, "
            f"converged={info['converged']}")
        res.update({
            "solve_N": N,
            "solve_iterations": info["iterations"],
            "solve_converged": bool(info["converged"]),
            "solve_s": t_solve,
            "solve_setup_s": t_setup,
            "solve_dofs_per_s": N / t_solve,
            "solve_true_rel_defect": info["true_defect"] / info["defect0"],
            "solve_iters_by_n": iters_by_n,
        })
        print(json.dumps(res), flush=True)
        del x, b, st, gmg, go, V, mesh
        gc.collect()


def _assembled_half(log, cells=None, qp_loop=False):
    """Assembled element residuals/sec + assembled lattice-ELL SpMV at
    16.8M DOFs, variable coefficients (no translation invariance — the
    general assembly and assembled-matrix hot paths are exercised).
    qp_loop=True retries with the qp-looped volume kernel whose smaller
    fusion graph survives the tunnel's compiler where the batched one
    SIGILLs (it runs ~1.6x slower — the log says which variant ran)."""
    import jax.numpy as jnp
    import numpy as np
    import dune_pdelab_tpu as pt
    from dune_pdelab_tpu.ops import (
        ConvectionDiffusionProblem, ConvectionDiffusionFEM)
    from dune_pdelab_tpu.assembly.ell import (
        assemble_ell_device, assemble_ell_direct,
    )
    from dune_pdelab_tpu.assembly.ell_pallas import try_plane_ell

    n = cells or int(os.environ.get("BENCH_ASM_CELLS", "255"))
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
    go = pt.GridOperator(V, ConvectionDiffusionFEM(VarCoeff()),
                         constraints=pt.constraints(True, V),
                         skip_boundary=True, volume_qp_loop=qp_loop)
    N, E = V.ndofs, mesh.nelements
    log(f"assembled half: N={N} E={E} qp_loop={qp_loop}")

    def sync(v):
        return float(jnp.sum(v))

    x0 = jnp.zeros(N, dtype)
    sync(go.residual(x0))
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        sync(go.residual(x0))
    t_res = (time.perf_counter() - t0) / reps
    log(f"assembled residual: {t_res*1e3:.2f} ms = "
        f"{E/t_res/1e6:.1f} M elem-res/s")

    res = {
        "assembled_N": N,
        "assembled_residual_meps": E / t_res / 1e6,
    }

    # structured-fused residual tier (assembly/structured_fused.py): shift-
    # slice gathers + einsum quadrature + shifted scatter-adds on the 3D
    # node grid — no index maps. The >=1 Gdof/s general-assembly answer.
    try:
        from dune_pdelab_tpu.assembly.structured_fused import (
            make_fused_residual,
        )
        fused = make_fused_residual(go)
        if fused is not None:
            sync(fused(x0))
            t0 = time.perf_counter()
            for _ in range(reps):
                sync(fused(x0))
            t_f = (time.perf_counter() - t0) / reps
            log(f"fused structured residual: {t_f*1e3:.2f} ms = "
                f"{E/t_f/1e6:.1f} M elem-res/s")
            res["assembled_residual_fused_meps"] = E / t_f / 1e6
    except Exception as e:
        log(f"fused residual skipped: {type(e).__name__}: {e}")

    t0 = time.perf_counter()
    ell = assemble_ell_direct(go, x_lin=x0)
    if ell is None:
        ell = assemble_ell_device(go, x_lin=x0)
    sync(ell.values)
    t_asm = time.perf_counter() - t0
    log(f"ELL direct assembly (cold, incl compile): {t_asm:.1f} s")
    # warm rebuild = the production cost of reassembling at a new
    # linearization point / new coefficients (Newton steps)
    t0 = time.perf_counter()
    ell2 = assemble_ell_direct(go, x_lin=x0)
    if ell2 is not None:
        sync(ell2.values)
        t_asm_warm = time.perf_counter() - t0
        log(f"ELL direct assembly (warm): {t_asm_warm:.2f} s")
    else:
        t_asm_warm = t_asm

    streamed = try_plane_ell(ell)
    if streamed is None:
        raise RuntimeError("plane ELL kernel not applicable")
    z = jnp.asarray(np.random.default_rng(0).standard_normal(N), dtype)
    sync(streamed(z))          # compile
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        y = streamed(z)
    sync(y)
    t_raw = (time.perf_counter() - t0) / reps
    t_p = max(t_raw - _dispatch_overhead(), 0.1 * t_raw)
    log(f"plane ELL SpMV: {t_p*1e3:.2f} ms = {N/t_p/1e9:.2f} Gdof/s "
        f"(raw {t_raw*1e3:.2f} ms incl dispatch)")
    res.update({
        "assembled_ell_build_s": t_asm,
        "assembled_ell_build_warm_s": t_asm_warm,
        "assembled_spmv_gdofs": N / t_p / 1e9,
        "assembled_spmv_gbps": 30.0 * N * 4 / t_p / 1e9,
    })
    return res


def _dg_half(log, cells=128):
    """DG block-stencil fast path at cells^3 Q1 DG SIPG: best mm-resident
    Pallas apply across the lowerings in BENCH_DG_MODES (reference analog:
    the FastDG blocked apply over assembled BCRS blocks,
    gridoperator/fastdg/assembler.hh:25)."""
    import jax.numpy as jnp
    import numpy as np
    import dune_pdelab_tpu as pt
    from dune_pdelab_tpu.fe import QkDGFEM
    from dune_pdelab_tpu.ops import ConvectionDiffusionProblem
    from dune_pdelab_tpu.ops.convectiondiffusiondg import (
        ConvectionDiffusionDG,
    )
    from dune_pdelab_tpu.assembly.blockstencil import compile_block_stencil
    from dune_pdelab_tpu.assembly.blockstencil_mm import try_mm_block_stencil

    class Diff(ConvectionDiffusionProblem):
        def f(self, x):
            return jnp.ones(x.shape[:-1], x.dtype)

    mesh = pt.StructuredMesh([0, 0, 0], [1, 1, 1], (cells,) * 3)
    V = pt.FunctionSpace(mesh, QkDGFEM(1, 3))
    go = pt.GridOperator(V, ConvectionDiffusionDG(Diff()))
    N = V.ndofs
    log(f"DG half: N={N}")
    st = compile_block_stencil(go)
    if st is None:
        raise RuntimeError("block stencil not applicable")

    def sync(v):
        return float(jnp.sum(v))

    z = jnp.asarray(np.random.default_rng(0).standard_normal(N),
                    jnp.float32)
    best = (None, float("inf"))
    # default: only the production mode (mxu2) — each mode's fori_loop
    # timing jit costs ~60-75 s of remote compile; the full sweep is an
    # env opt-in (BENCH_DG_MODES=mxu,mxu2,mxu3)
    for mode in os.environ.get("BENCH_DG_MODES", "mxu2").split(","):
        mm = try_mm_block_stencil(st, mode=mode)
        if mm is None:
            continue
        _, apply_mm, to_mm, _ = mm
        zmm = to_mm(z)
        sync(apply_mm(zmm))            # compile
        t0 = time.perf_counter()
        reps = 10
        for _ in range(reps):
            y = apply_mm(zmm)
        sync(y)
        t_raw = (time.perf_counter() - t0) / reps
        t = max(t_raw - _dispatch_overhead(), 0.1 * t_raw)
        log(f"DG mm/{mode}: {t*1e3:.2f} ms = {N/t/1e9:.2f} Gdof/s")
        if t < best[1]:
            best = (mode, t)
    if best[0] is None:
        raise RuntimeError("no mm lowering applicable")
    return {
        "dg_N": N,
        "dg_mm_mode": best[0],
        "dg_mm_gdofs": N / best[1] / 1e9,
    }


def _dgmg_half(log):
    """DG two-level V-cycle cost per preconditioned CG iteration at 64^3
    Q1 DG SIPG (the round-3 <=70 ms/iter demand; round 4's structural
    cuts — face-parity 2-color smoother, lattice-GMG coarse space,
    mm-resident cycle — went unmeasured on chip). Same composition as
    benchmarks/dg_mg_tpu.py. Reference analog: seq_amg_dg_backend.hh:146."""
    import jax.numpy as jnp
    import dune_pdelab_tpu as pt
    from dune_pdelab_tpu.fe import QkDGFEM
    from dune_pdelab_tpu.ops import (
        ConvectionDiffusionProblem, ConvectionDiffusionFEM)
    from dune_pdelab_tpu.ops.convectiondiffusiondg import (
        ConvectionDiffusionDG,
    )
    from dune_pdelab_tpu.linalg import DGTwoLevel
    from dune_pdelab_tpu.assembly.blockstencil import compile_block_stencil
    from dune_pdelab_tpu.assembly.blockstencil_mm import (
        try_mm_block_stencil, MMBlockStencil,
    )

    class Diff(ConvectionDiffusionProblem):
        def f(self, x):
            return jnp.ones(x.shape[:-1], x.dtype)

    cells = int(os.environ.get("BENCH_DGMG_CELLS", "64"))
    p = Diff()
    mesh = pt.StructuredMesh([0, 0, 0], [1, 1, 1], (cells,) * 3)
    V = pt.FunctionSpace(mesh, QkDGFEM(1, 3))
    go = pt.GridOperator(V, ConvectionDiffusionDG(p))
    N = V.ndofs
    log(f"DG-MG half: N={N}")
    Aop = compile_block_stencil(go)
    if Aop is None:
        raise RuntimeError("block stencil not applicable")
    if jax.default_backend() != "cpu":
        mm = try_mm_block_stencil(Aop, mode="mxu2")
        if mm is not None:
            Aop = MMBlockStencil(mm)
    tl = DGTwoLevel(go, ConvectionDiffusionFEM(p))
    tl.setup(operator=Aop)
    b = -go.residual(jnp.zeros(N, jnp.float32))

    def run(bb, tol=1e-8, maxiter=60):
        x = jnp.zeros_like(bb)
        r = bb
        z0 = tl.apply(r)
        pvec, rz = z0, float(jnp.dot(r, z0))
        nb0 = float(jnp.linalg.norm(bb))
        k = 0
        while k < maxiter:
            Ap = Aop(pvec)
            alpha = rz / float(jnp.dot(pvec, Ap))
            x = x + alpha * pvec
            r = r - alpha * Ap
            k += 1
            if float(jnp.linalg.norm(r)) <= tol * nb0:
                break
            zv = tl.apply(r)
            rz_new = float(jnp.dot(r, zv))
            pvec = zv + (rz_new / rz) * pvec
            rz = rz_new
        return x, k

    z, it = run(b)                # cold (compiles)
    t0 = time.perf_counter()
    z, it = run(b)
    dt = time.perf_counter() - t0
    true_res = float(jnp.linalg.norm(Aop(z) - b) / jnp.linalg.norm(b))
    log(f"DG-MG {cells}^3: {it} its in {dt:.2f} s = "
        f"{dt/max(it,1)*1e3:.1f} ms/iter, true rel res {true_res:.2e}")
    return {
        "dgmg_N": N,
        "dgmg_cells": cells,
        "dgmg_ms_per_iter": dt / max(it, 1) * 1e3,
        "dgmg_iterations": it,
        "dgmg_true_rel_res": true_res,
    }


if __name__ == "__main__":
    stage = os.environ.get("BENCH_STAGE")
    if stage == "refine":
        _refine_main()
    elif stage == "solve":
        _solve_main()
    elif stage == "varsolve":
        _varsolve_main()
    else:
        main()
