"""Differentiable time integration: a traceable one-step theta scheme.

The OneStepMethod driver (instationary/onestep.py) is a host-side Python
loop (failed-step dt halving, statistics) and cannot sit under jax.grad.
This module provides the LINEAR-problem fast path as a pure JAX rollout:

    M (x_{n+1} - x_n) + dt [ theta R_s(x_{n+1}, t_{n+1})
                             + (1-theta) R_s(x_n, t_n) ] = 0

written in residual-correction form (x_{n+1} = x_n + delta, delta = 0 on
Dirichlet DOFs, so static boundary values ride x_n and their coupling
enters through the residual):

    P (M + dt*theta*A) P delta = -dt [ theta R_s(x_n, t_{n+1})
                                       + (1-theta) R_s(x_n, t_n) ]

Each step's solve is a `jax.lax.custom_linear_solve` around this
package's Krylov loops, so `jax.grad` through the whole rollout yields
the exact DISCRETE ADJOINT: one adjoint solve per step, never
backpropagation through Krylov iterations. Combined with
solvers/differentiable.py this differentiates terminal-cost functionals
with respect to problem parameters (through a LocalOperator factory,
exact AD in assembly) and initial conditions.

No reference analog: PDELab's instationary stack
(instationary/implicitonestep.hh, onestepparameter.hh) has no
sensitivity machinery. Restrictions: linear spatial operator, fixed dt,
single-stage theta schemes (explicit/implicit Euler, Crank-Nicolson),
time-independent Dirichlet data.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..assembly.gridoperator import GridOperator
from ..linalg import krylov
from ..ops.l2 import L2


def differentiable_theta_rollout(space, spatial_factory, constraints=None,
                                 *, mass_factory=None, theta=0.5,
                                 solver="cg", tol=1e-12, maxiter=10_000,
                                 checkpoint_steps=False, **go_kwargs):
    """Build rollout(x0, params, dt, nsteps, t0=0.0) -> x(t0 + nsteps*dt).

    spatial_factory(params) -> LocalOperator for the (linear) spatial
    residual R_s; mass_factory(params) -> temporal LocalOperator
    (default: unit L2 mass, l2.hh:149). theta: 0 explicit Euler, 1
    implicit Euler, 0.5 Crank-Nicolson. The rollout is jit-able and
    jax.grad-able in (x0, params); set checkpoint_steps=True to
    rematerialize each step on the backward pass (O(1) stored solver
    state per step instead of the step's full linearization residue).
    """
    krysolve = {"cg": krylov.cg, "bicgstab": krylov.bicgstab,
                "minres": krylov.minres,
                "gmres": krylov.restarted_gmres}[solver]
    symmetric = solver in ("cg", "minres")
    mass_factory = mass_factory or (lambda params: L2())

    def rollout(x0, params, dt, nsteps, t0=0.0):
        go_s = GridOperator(space, spatial_factory(params),
                            constraints=constraints, **go_kwargs)
        go_m = GridOperator(space, mass_factory(params),
                            constraints=constraints, **go_kwargs)
        zeros = jnp.zeros(space.ndofs, x0.dtype)

        def op(v):
            # jacobian_apply is identity on Dirichlet rows for BOTH
            # operators, so op is (1 + dt*theta)*I there; the rhs is
            # zero on those rows, keeping delta = 0 on them
            return (go_m.jacobian_apply(zeros, v)
                    + dt * theta * go_s.jacobian_apply(zeros, v))

        def solve(mv, b):
            z, _stats = krysolve(mv, b, tol=tol, maxiter=maxiter)
            return z

        def step(x, t):
            rhs = -dt * (theta * go_s.residual(x, t + dt)
                         + (1.0 - theta) * go_s.residual(x, t))
            delta = lax.custom_linear_solve(op, rhs, solve,
                                            symmetric=symmetric)
            return x + delta, None

        body = jax.checkpoint(step) if checkpoint_steps else step
        times = t0 + dt * jnp.arange(nsteps)
        x, _ = lax.scan(lambda c, t: body(c, t), x0, times)
        return x

    return rollout
