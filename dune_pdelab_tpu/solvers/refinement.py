"""Mixed-precision iterative refinement: fp64-accurate solves at fp32 speed.

The TPU-native answer to fp64 parity. TPU hardware has no fp64 unit; JAX
emulates it in software at a ~100-200x penalty (measured: 0.054 vs 10.47
Gdof-iters/s, PERFORMANCE.md). Running *whole Krylov solves* in fp64 is
therefore off the table for production — but classical defect-correction
iterative refinement (Wilkinson; Moler 1967) needs high precision ONLY for
the residual and the solution update:

    x_0 = 0
    repeat:  r_k = b - A x_k          (high precision: one matvec + axpy)
             solve A z = r_k          (low precision, modest tolerance)
             x_{k+1} = x_k + z        (high precision axpy)

Each outer sweep multiplies the defect by O(eps_32 * kappa(A)); 2-5 sweeps
reach the fp64 round-off floor. Cost = fp32 solve + a handful of fp64
matvecs, i.e. ~1-2x the fp32 wall instead of 200x.

The inner residual is normalized before the downcast so its exponent range
never under/overflows fp32 even when the outer defect is ~1e-14 * ||b||.

The outer loop runs on the host (2-5 trips): whole-solver jits with a
multigrid body cost minutes of remote compile on the tunneled TPU, while
per-sweep dispatch overhead is ~10 ms — negligible against the inner solve.

Reference analog: PDELab/ISTL solve everything in double on CPU
(dune/pdelab/backend/istl/seqistlsolverbackend.hh — all backends are
`double`-field); the parity target (BASELINE.json: residuals/iterations to
fp64 tolerance) is met here by refining an fp32 inner solve to the fp64
floor rather than by paying software-fp64 for every flop.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


@dataclass
class RefinementStats:
    outer_iterations: int
    inner_iterations: int
    converged: bool
    defect0: float
    defect: float
    history: tuple


def refine_solve(A_hi, inner_solve, b, *, tol=1e-12, atol=0.0, max_outer=20,
                 inner_dtype=jnp.float32, x0=None):
    """Solve A x = b to `tol` relative defect in b's (high) precision.

    Parameters
    ----------
    A_hi : callable(x) -> A @ x, evaluated in b's dtype (dtype-polymorphic
        operators like StencilOperator / GridOperator jvp closures qualify).
    inner_solve : callable(r32) -> z32 or (z32, stats); an approximate
        solver in `inner_dtype` (e.g. LatticeGMG.make_solver(tol=1e-4), a
        preconditioned-Krylov closure, or even a single V-cycle). Must
        preserve the residual convention of A_hi (zero constrained rows).
    b : right-hand side in high precision (residual convention).
    tol, atol : relative/absolute defect targets in the 2-norm (ISTL
        CGSolver semantics, matching linalg.krylov).
    max_outer : refinement sweep cap.

    Returns (x, RefinementStats).
    """
    x = jnp.zeros_like(b) if x0 is None else x0.astype(b.dtype)
    bnorm = float(jnp.linalg.norm(b))
    target = max(tol * bnorm, atol)
    hist = []
    inner_total = 0
    sweeps = 0
    defect = bnorm
    for sweeps in range(max_outer + 1):
        r = b - A_hi(x)
        defect = float(jnp.linalg.norm(r))
        hist.append(defect)
        if defect <= target or defect == 0.0 or sweeps == max_outer:
            break
        # normalize -> downcast -> inner solve -> upcast -> rescale
        z = inner_solve((r / defect).astype(inner_dtype))
        if isinstance(z, tuple):
            z, istats = z
            inner_total += int(getattr(istats, "iterations", 0))
        x = x + defect * z.astype(b.dtype)
    return x, RefinementStats(
        outer_iterations=sweeps,
        inner_iterations=inner_total,
        converged=defect <= target,
        defect0=bnorm, defect=defect, history=tuple(hist))


class MixedPrecisionStationarySolver:
    """StationaryLinearProblemSolver-shaped driver that solves the
    linearized system by fp32-inner / fp64-outer refinement.

    Built for the lattice fast path: `go` must compile to a stencil
    (assembly/stencil.py) and `gmg` is a LatticeGMG on the same space. The
    stencil operator serves BOTH precisions (its tap weights are fp64 numpy;
    the apply follows the input dtype).

    reference: dune/pdelab/stationary/linearproblem.hh:182-278 (assemble
    residual, solve correction, subtract) — with the Krylov solve replaced
    by refine_solve.
    """

    def __init__(self, go, gmg, *, reduction=1e-12, inner_tol=1e-5,
                 inner_maxiter=100, max_outer=20, verbose=0):
        self.go = go
        st = gmg.stencils[0]
        self._st = st
        self._inner = gmg.make_solver(tol=inner_tol, maxiter=inner_maxiter)
        self.reduction = reduction
        self.max_outer = max_outer
        self.verbose = verbose
        self.stats = None

    def apply(self, x0):
        x0 = jnp.asarray(x0)
        b = -self.go.residual(x0, 0.0)
        z, stats = refine_solve(
            self._st, self._inner, b,
            tol=self.reduction, max_outer=self.max_outer)
        self.stats = stats
        if self.verbose:
            print(f"MixedPrecisionStationarySolver: outer {stats.outer_iterations}, "
                  f"inner {stats.inner_iterations}, defect {stats.defect:.4e}, "
                  f"converged={stats.converged}")
        return x0 + z
