"""One-step (Runge-Kutta) time integration drivers.

TPU-native analog of PDELab's instationary stack (reference:
dune/pdelab/gridoperator/onestep.hh:18 OneStepGridOperator,
onestep/prestageengine.hh:19 constant-residual accumulation,
instationary/implicitonestep.hh:56 OneStepMethod,
instationary/explicitonestep.hh:109 ExplicitOneStepMethod + CFL controller).

Design translation: PDELab re-sweeps the grid per stage to accumulate
sum_i [a(r,i) m(u_i) + b(r,i) dt alpha(u_i)]; here the per-stage constant
residual is a weighted sum of CACHED residual vectors alpha(u_i), m(u_i) —
one assembly per stage total, the rest is axpys (cheaper than the reference's
re-sweeps, as anticipated in SURVEY.md section 7 step 7).

The stage system is expressed through `StageContext`, an opaque "time"
pytree threaded through the generic solver stack (Newton, linear backends),
so the jitted solve kernels compile ONCE and are reused for every stage,
step, and dt — weights and the constant residual ride along as traced
arguments, never as baked constants.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from dune_pdelab_tpu.instationary.tableaux import TimeSteppingScheme
from dune_pdelab_tpu.solvers.newton import NewtonMethod
from dune_pdelab_tpu.solvers.stationary import StationaryLinearProblemSolver


class StageContext(NamedTuple):
    """Opaque stage descriptor passed through solver `time` parameters."""
    t: Any          # stage time
    wa: Any         # mass weight a[r,r]
    wb: Any         # spatial weight dt * b[r,r]
    const: Any      # accumulated constant residual (unconstrained)


class _StageLOPInfo:
    """Minimal lop-protocol shim for the solver backends."""
    def __init__(self, is_linear):
        self.is_linear = is_linear


class OneStepGridOperator:
    """Stage operator combining spatial GO (go0) and temporal/mass GO (go1).

    residual(u, sc) = sc.wa * m(u) + sc.wb * alpha(u) + sc.const, with
    constrained rows zeroed (reference: gridoperator/onestep.hh:147-181 and
    the stage-weight injection OneStepLocalAssembler::setWeight,
    onestep/localassembler.hh:175).
    """

    def __init__(self, go0, go1):
        if go0.space is not go1.space:
            raise ValueError("spatial and temporal operators must share a space")
        self.go0 = go0
        self.go1 = go1
        self.cg = go0.cg
        self.space = go0.space
        # dt-dependent weights make the combined operator's cached
        # preconditioner data stage-dependent: disable linear-setup caching
        self.lop = _StageLOPInfo(is_linear=False)
        # stage weights/const travel as traced args inside StageContext, so
        # these compile once and serve every stage, step, and dt
        self._residual_jit = jax.jit(self._residual_impl)
        self._japply_jit = jax.jit(self.jacobian_apply_impl)

    def _residual_impl(self, x, sc: StageContext):
        r = (sc.wa * self.go1.residual_unconstrained(x, sc.t)
             + sc.wb * self.go0.residual_unconstrained(x, sc.t)
             + sc.const)
        if self.cg is not None:
            r = jnp.where(self.cg.mask, 0.0, r)
        return r

    def residual(self, x, sc: StageContext):
        return self._residual_jit(x, sc)

    def residual_unconstrained(self, x, sc: StageContext):
        return (sc.wa * self.go1.residual_unconstrained(x, sc.t)
                + sc.wb * self.go0.residual_unconstrained(x, sc.t)
                + sc.const)

    def jacobian_apply_impl(self, x, z, sc: StageContext):
        if self.cg is not None:
            zf = jnp.where(self.cg.mask, 0.0, z)
        else:
            zf = z
        _, jz = jax.jvp(
            lambda y: (sc.wa * self.go1.residual_unconstrained(y, sc.t)
                       + sc.wb * self.go0.residual_unconstrained(y, sc.t)),
            (x,), (zf,))
        if self.cg is not None:
            jz = jnp.where(self.cg.mask, z, jz)
        return jz

    def jacobian_apply(self, x, z, sc: StageContext):
        return self._japply_jit(x, z, sc)

    def jacobian_diagonal(self, x, sc: StageContext):
        d = (sc.wa * self.go1.jacobian_diagonal(x, sc.t)
             + sc.wb * self.go0.jacobian_diagonal(x, sc.t))
        if self.cg is not None:
            d = jnp.where(self.cg.mask, 1.0, d)
        return d

    def element_jacobians(self, x, sc: StageContext):
        return (sc.wa * self.go1.element_jacobians(x, sc.t)
                + sc.wb * self.go0.element_jacobians(x, sc.t))

    def element_diagonal_blocks(self, x, sc: StageContext):
        return (sc.wa * self.go1.element_diagonal_blocks(x, sc.t)
                + sc.wb * self.go0.element_diagonal_blocks(x, sc.t))

    @property
    def elem_gdofs_cat(self):
        return self.go0.elem_gdofs_cat

    def jacobian(self, x, sc: StageContext):
        A0 = self.go0.jacobian(x, sc.t)
        A1 = self.go1.jacobian(x, sc.t)
        return sc.wb * A0 + sc.wa * A1  # note: duplicate-pattern BCOO sum


@dataclass
class OneStepResult:
    """OneStepMethodResult analog (implicitonestep.hh:22-54)."""
    steps: int = 0
    failed_steps: int = 0
    total_newton_iterations: int = 0
    total_linear_iterations: int = 0


class OneStepMethod:
    """Implicit one-step (RK) driver (reference: implicitonestep.hh:56).

    pdesolver: 'newton' or 'linear'; boundary_values: optional callable
    t -> full DOF vector of Dirichlet data, re-interpolated each stage (the
    BC-reinterpolating variant, reference: implicitonestep.hh:291).
    """

    def __init__(self, scheme: TimeSteppingScheme, go0, go1, linear_solver,
                 pdesolver: str = "newton", boundary_values=None,
                 verbose: int = 0, **solver_kwargs):
        self.scheme = scheme
        self.igos = OneStepGridOperator(go0, go1)
        self.boundary_values = boundary_values
        self.verbose = verbose
        self.result = OneStepResult()
        if pdesolver == "newton":
            self.pdesolver = NewtonMethod(self.igos, linear_solver,
                                          verbose=max(0, verbose - 1),
                                          **solver_kwargs)
        elif pdesolver == "linear":
            self.pdesolver = StationaryLinearProblemSolver(
                self.igos, linear_solver, verbose=max(0, verbose - 1),
                **solver_kwargs)
        else:
            raise ValueError(pdesolver)

    def apply(self, time: float, dt: float, xold):
        """Advance one step t -> t + dt; returns x(t + dt)."""
        s = self.scheme.stages
        a, b, d = self.scheme.a, self.scheme.b, self.scheme.d
        go0, go1 = self.igos.go0, self.igos.go1
        x = xold
        alphas = {0: None}
        masses = {0: None}

        def alpha_i(i, xi, ti):
            if alphas.get(i) is None:
                alphas[i] = go0.residual_unconstrained(xi, ti)
            return alphas[i]

        def mass_i(i, xi, ti):
            if masses.get(i) is None:
                masses[i] = go1.residual_unconstrained(xi, ti)
            return masses[i]

        stage_x = {0: xold}
        for r in range(1, s + 1):
            t_r = time + float(d[r]) * dt
            const = jnp.zeros_like(xold)
            for i in range(r):
                t_i = time + float(d[i]) * dt
                if a[r - 1, i] != 0.0:
                    const = const + a[r - 1, i] * mass_i(i, stage_x[i], t_i)
                if b[r - 1, i] != 0.0:
                    const = const + dt * b[r - 1, i] * alpha_i(i, stage_x[i], t_i)
            sc = StageContext(t=jnp.asarray(t_r, xold.dtype),
                              wa=jnp.asarray(float(a[r - 1, r]), xold.dtype),
                              wb=jnp.asarray(dt * float(b[r - 1, r]), xold.dtype),
                              const=const)
            x0 = x
            if self.boundary_values is not None and self.igos.cg is not None:
                xg = self.boundary_values(t_r)
                x0 = jnp.where(self.igos.cg.mask, xg, x0)
            if self.verbose:
                print(f"  stage {r}/{s} at t={t_r:.6g}")
            x = self.pdesolver.apply(x0, time=sc)
            stage_x[r] = x
            self.result.steps += 0  # accounted per step below
            if hasattr(self.pdesolver, "result"):
                res = self.pdesolver.result
                self.result.total_newton_iterations += getattr(res, "iterations", 0)
                self.result.total_linear_iterations += getattr(
                    res, "linear_solver_iterations", 0)
        self.result.steps += 1
        return x

    def solve(self, t0: float, dt: float, tend: float, x0,
              max_step_retries: int = 0):
        """March from t0 to tend; returns (t_final, x_final).

        max_step_retries > 0 enables failed-step handling (reference:
        implicitonestep.hh:210-233 books the failed step's cost and
        rethrows; here the step is additionally retried with dt/2, up to
        max_step_retries halvings, before re-raising): a solver failure
        increments result.failed_steps, its Newton/linear iteration cost
        stays booked, and the step restarts from the pre-step state.
        """
        from dune_pdelab_tpu.solvers.newton import NewtonError

        t, x = t0, x0
        while t < tend - 1e-12:
            step = min(dt, tend - t)
            retries = 0
            while True:
                try:
                    x_new = self.apply(t, step, x)
                    break
                except NewtonError:
                    self.result.failed_steps += 1
                    retries += 1
                    if retries > max_step_retries:
                        raise
                    step *= 0.5
                    if self.verbose:
                        print(f"  step failed at t={t:.6g}; retrying with "
                              f"dt={step:.6g}")
            x = x_new
            t += step
        return t, x


class TimeControllerInterface:
    """dt suggestion protocol (reference: explicitonestep.hh:26)."""

    def suggest_timestep(self, time, dt, x) -> float:
        return dt


class CFLTimeController(TimeControllerInterface):
    """Scale dt by a CFL target using an operator-reported max wave speed
    (reference: CFLTimeController explicitonestep.hh:64; the LOP reports its
    max speed through `max_speed(x)` if available)."""

    def __init__(self, cfl: float, go0):
        self.cfl = cfl
        self.go0 = go0

    def suggest_timestep(self, time, dt, x) -> float:
        lop = self.go0.lop
        if hasattr(lop, "max_speed"):
            try:
                # sample position-dependent velocity fields at element
                # centers (ADVICE r3: a single-point probe can
                # underestimate the CFL-critical speed)
                smax = float(lop.max_speed(x, mesh=self.go0.mesh))
            except TypeError:       # LOPs with the old (x) signature
                smax = float(lop.max_speed(x))
            h = float(np.min(self.go0.mesh.h))
            if smax > 0:
                return min(dt, self.cfl * h / smax)
        return dt


class ExplicitOneStepMethod:
    """Explicit RK driver: per stage solve wa * M u_r = -const with the mass
    operator (reference: explicitonestep.hh:109,292-420; the diagonal/block
    solve analog of ISTLBackend_SEQ_ExplicitDiagonal,
    seqistlsolverbackend.hh:659 — element-block mass inverse, exact for DG)."""

    def __init__(self, scheme: TimeSteppingScheme, go0, go1,
                 time_controller: TimeControllerInterface | None = None,
                 limiter=None, verbose: int = 0):
        if scheme.implicit:
            raise ValueError("ExplicitOneStepMethod needs an explicit scheme")
        for r in range(scheme.stages):
            if scheme.b[r, r + 1] != 0.0:
                raise ValueError("scheme has implicit spatial weight")
        self.scheme = scheme
        self.go0 = go0
        self.go1 = go1
        self.cg = go0.cg
        self.controller = time_controller or TimeControllerInterface()
        self.limiter = limiter    # stage post-processing hook
                                  # (explicitonestep.hh:704 Limiter analog)
        self.verbose = verbose
        self._mass_solve = None

    def _build_mass_solve(self, x):
        """Exact element-block mass inverse (additive on shared DOFs)."""
        go1 = self.go1
        blocks = go1.element_jacobians(x, 0.0)
        dofs = jnp.asarray(go1.elem_gdofs_cat, jnp.int32)
        from dune_pdelab_tpu.linalg.preconditioners import (
            _explicit_block_inverse,
        )
        dinv = _explicit_block_inverse(blocks)
        counts = jnp.zeros(go1.space.ndofs, blocks.dtype).at[dofs].add(1.0)

        @jax.jit
        def solve(rhs):
            r_loc = rhs[dofs]
            z_loc = jnp.einsum("ejk,ek->ej", dinv.astype(rhs.dtype), r_loc,
                               precision="highest")
            return jnp.zeros_like(rhs).at[dofs].add(z_loc) / counts

        return solve

    def apply(self, time: float, dt: float, xold):
        """Advance one step; returns (x_new, dt_used)."""
        dt = self.controller.suggest_timestep(time, dt, xold)
        s = self.scheme.stages
        a, b, d = self.scheme.a, self.scheme.b, self.scheme.d
        if self._mass_solve is None:
            self._mass_solve = self._build_mass_solve(xold)
        alphas, masses, stage_x = {}, {}, {0: xold}
        x = xold
        for r in range(1, s + 1):
            t_r = time + float(d[r]) * dt
            const = jnp.zeros_like(xold)
            for i in range(r):
                t_i = time + float(d[i]) * dt
                if a[r - 1, i] != 0.0:
                    if i not in masses:
                        masses[i] = self.go1.residual_unconstrained(stage_x[i], t_i)
                    const = const + a[r - 1, i] * masses[i]
                if b[r - 1, i] != 0.0:
                    if i not in alphas:
                        alphas[i] = self.go0.residual_unconstrained(stage_x[i], t_i)
                    const = const + dt * b[r - 1, i] * alphas[i]
            wa = float(a[r - 1, r])
            x = self._mass_solve(-const / wa)
            if self.cg is not None:
                # keep Dirichlet values fixed at the previous solution
                x = jnp.where(self.cg.mask, stage_x[r - 1], x)
            if self.limiter is not None:
                x = self.limiter(x)
            stage_x[r] = x
        return x, dt

    def solve(self, t0: float, dt: float, tend: float, x0):
        t, x = t0, x0
        while t < tend - 1e-12:
            step = min(dt, tend - t)
            x, used = self.apply(t, step, x)
            t += used
        return t, x
