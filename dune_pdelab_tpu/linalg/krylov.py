"""Krylov solvers as jitted lax.while_loop iterations.

TPU-native replacement for the dune-istl solver zoo reached through PDELab's
sequential backends (reference: dune/pdelab/backend/istl/
seqistlsolverbackend.hh:112-1060 — Loop/CG/BiCGStab/MINRES/GMRES/Richardson
preassembled with Jacobi/SOR/SSOR/ILU/AMG). Here a solver is a pure function

    solve(A, b, x0, M, ...) -> (x, SolverStats)

where A and M are closures (z -> A z, r -> M r). A closure works equally for
an assembled sparse matrix (`lambda z: mat @ z`) and the matrix-free
GridOperator.jacobian_apply path — the OnTheFlyOperator analog (reference:
dune/pdelab/backend/istl/matrixfree/backends.hh).

Convergence follows ISTL semantics: 2-norm of the true defect, relative
reduction `tol` against the initial defect with absolute floor `atol`
(reference: ISTL IterativeSolver / PDELab linearsolver `apply(A,z,r,red)`).
The dot product is injectable so the distributed layer can pass an
owner-masked psum dot (the disjointDot analog, reference:
dune/pdelab/backend/istl/parallelhelper.hh:179).
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class SolverStats(NamedTuple):
    """Result bookkeeping (PDELab LinearSolverResult analog, reference:
    dune/pdelab/backend/solver.hh)."""
    iterations: jnp.ndarray
    converged: jnp.ndarray
    defect0: jnp.ndarray
    defect: jnp.ndarray

    @property
    def reduction(self):
        return self.defect / jnp.maximum(self.defect0, 1e-300)

    def conv_rate(self):
        it = jnp.maximum(self.iterations, 1)
        return self.reduction ** (1.0 / it)


def _default_dot(a, b):
    return jnp.vdot(a, b)


def _norm(dot, a):
    return jnp.sqrt(jnp.real(dot(a, a)))


def _identity(r):
    return r


def cg(A: Callable, b, x0=None, M: Callable = _identity, tol=1e-10, atol=0.0,
       maxiter=5000, dot=_default_dot):
    """Preconditioned conjugate gradients (ISTL CGSolver semantics)."""
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - A(x)
    defect0 = _norm(dot, r)
    z = M(r)
    rho = dot(r, z)
    target = jnp.maximum(tol * defect0, atol)

    def cond(state):
        x, r, p, rho, it, defect = state
        return (defect > target) & (it < maxiter)

    def body(state):
        x, r, p, rho, it, defect = state
        q = A(p)
        alpha = rho / dot(p, q)
        x = x + alpha * p
        r = r - alpha * q
        z = M(r)
        rho_new = dot(r, z)
        p = z + (rho_new / rho) * p
        return x, r, p, rho_new, it + 1, _norm(dot, r)

    x, r, p, rho, it, defect = lax.while_loop(
        cond, body, (x, r, z, rho, jnp.array(0), defect0)
    )
    return x, SolverStats(it, defect <= target, defect0, defect)


def bicgstab(A: Callable, b, x0=None, M: Callable = _identity, tol=1e-10,
             atol=0.0, maxiter=5000, dot=_default_dot):
    """Preconditioned BiCGStab (ISTL BiCGSTABSolver semantics; one
    "iteration" = one full BiCGStab step = 2 operator applications)."""
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - A(x)
    defect0 = _norm(dot, r)
    rhat = r
    target = jnp.maximum(tol * defect0, atol)
    eps = jnp.finfo(b.dtype).tiny * 1e4

    def cond(state):
        x, r, p, v, rho, alpha, omega, it, defect = state
        return (defect > target) & (it < maxiter)

    def body(state):
        x, r, p, v, rho, alpha, omega, it, defect = state
        rho_new = dot(rhat, r)
        beta = (rho_new / jnp.where(jnp.abs(rho) < eps, eps, rho)) * (
            alpha / jnp.where(jnp.abs(omega) < eps, eps, omega)
        )
        p = r + beta * (p - omega * v)
        phat = M(p)
        v = A(phat)
        alpha = rho_new / dot(rhat, v)
        s = r - alpha * v
        shat = M(s)
        t = A(shat)
        omega = dot(t, s) / jnp.maximum(dot(t, t), eps)
        x = x + alpha * phat + omega * shat
        r = s - omega * t
        return x, r, p, v, rho_new, alpha, omega, it + 1, _norm(dot, r)

    one = jnp.ones((), b.dtype)
    state = (x, r, jnp.zeros_like(b), jnp.zeros_like(b), one, one, one,
             jnp.array(0), defect0)
    x, r, p, v, rho, alpha, omega, it, defect = lax.while_loop(cond, body, state)
    return x, SolverStats(it, defect <= target, defect0, defect)


def minres(A: Callable, b, x0=None, M: Callable = _identity, tol=1e-10,
           atol=0.0, maxiter=5000, dot=_default_dot):
    """Preconditioned MINRES for symmetric (indefinite) systems
    (ISTL MINRESSolver analog; M must be SPD). Convergence is monitored on
    the M-norm residual estimate |eta| (standard pMINRES recurrence)."""
    x = jnp.zeros_like(b) if x0 is None else x0
    r1 = b - A(x)
    defect0 = _norm(dot, r1)
    target = jnp.maximum(tol * defect0, atol)
    z1 = M(r1)
    gamma1 = jnp.sqrt(jnp.maximum(dot(r1, z1), 1e-300))
    one = jnp.ones((), b.dtype)
    zero = jnp.zeros((), b.dtype)
    state = (x, jnp.zeros_like(b), r1, z1, one, gamma1, gamma1,  # x,r0,r1,z1,gamma0,gamma1,eta
             one, one, zero, zero,                                # c0,c1,s0,s1
             jnp.zeros_like(b), jnp.zeros_like(b),                # w0, w1
             jnp.array(0), defect0)

    def cond(state):
        return (state[-1] > target) & (state[-2] < maxiter)

    def body(state):
        (x, r0, r1, z1, gamma0, gamma1, eta, c0, c1, s0, s1, w0, w1, it,
         defect) = state
        z = z1 / gamma1
        Az = A(z)
        delta = dot(Az, z)
        r2 = Az - (delta / gamma1) * r1 - (gamma1 / gamma0) * r0
        z2 = M(r2)
        gamma2 = jnp.sqrt(jnp.maximum(dot(r2, z2), 1e-300))
        a0 = c1 * delta - c0 * s1 * gamma1
        a1 = jnp.sqrt(a0**2 + gamma2**2)
        a2 = s1 * delta + c0 * c1 * gamma1
        a3 = s0 * gamma1
        c0n, s0n = c1, s1
        c1n = a0 / a1
        s1n = gamma2 / a1
        w2 = (z - a3 * w0 - a2 * w1) / a1
        x = x + c1n * eta * w2
        eta = -s1n * eta
        return (x, r1, r2, z2, gamma1, gamma2, eta, c0n, c1n, s0n, s1n,
                w1, w2, it + 1, jnp.abs(eta))

    out = lax.while_loop(cond, body, state)
    x, it, defect = out[0], out[-2], out[-1]
    return x, SolverStats(it, defect <= target, defect0, defect)


def restarted_gmres(A: Callable, b, x0=None, M: Callable = _identity,
                    tol=1e-10, atol=0.0, maxiter=5000, restart=30,
                    dot=_default_dot):
    """Left-preconditioned restarted GMRES(m) with modified Gram-Schmidt
    (ISTL RestartedGMResSolver analog; note ISTL uses right preconditioning —
    convergence is measured here on the preconditioned residual)."""
    x = jnp.zeros_like(b) if x0 is None else x0
    n = b.shape[0]
    m = restart
    r = M(b - A(x))
    defect0 = _norm(dot, r)
    target = jnp.maximum(tol * defect0, atol)

    tiny = 1e-300 if b.dtype == jnp.float64 else 1e-30

    def arnoldi_cycle(x):
        r = M(b - A(x))
        beta = _norm(dot, r)
        V = jnp.zeros((m + 1, n), b.dtype).at[0].set(r / jnp.maximum(beta, tiny))
        H = jnp.zeros((m + 1, m), b.dtype)
        g = jnp.zeros(m + 1, b.dtype).at[0].set(beta)
        cs = jnp.zeros(m, b.dtype)
        sn = jnp.zeros(m, b.dtype)

        def inner_cond(carry):
            V, H, g, cs, sn, j = carry
            return (j < m) & (jnp.abs(g[j]) > target)

        def inner_body(carry):
            V, H, g, cs, sn, j = carry
            w = M(A(V[j]))
            # modified Gram-Schmidt (rows beyond j of V are zero)
            def mgs(i, wh):
                w, h = wh
                hij = jnp.where(i <= j, dot(V[i], w), 0.0)
                return w - hij * V[i], h.at[i].set(hij)
            w, h = lax.fori_loop(0, m + 1, mgs, (w, jnp.zeros(m + 1, b.dtype)))
            hnext = _norm(dot, w)
            h = h.at[j + 1].set(hnext)
            V = V.at[j + 1].set(w / jnp.maximum(hnext, tiny))
            # previously accumulated Givens rotations (i < j)
            def rot(i, h):
                hi = cs[i] * h[i] + sn[i] * h[i + 1]
                hi1 = -sn[i] * h[i] + cs[i] * h[i + 1]
                active = i < j
                return h.at[i].set(jnp.where(active, hi, h[i])).at[i + 1].set(
                    jnp.where(active, hi1, h[i + 1]))
            h = lax.fori_loop(0, m, rot, h)
            denom = jnp.sqrt(h[j] ** 2 + h[j + 1] ** 2)
            c = h[j] / jnp.maximum(denom, tiny)
            s = h[j + 1] / jnp.maximum(denom, tiny)
            h = h.at[j].set(denom).at[j + 1].set(0.0)
            g = g.at[j + 1].set(-s * g[j]).at[j].set(c * g[j])
            H = H.at[:, j].set(h)
            cs = cs.at[j].set(c)
            sn = sn.at[j].set(s)
            return V, H, g, cs, sn, j + 1

        V, H, g, cs, sn, jstop = lax.while_loop(
            inner_cond, inner_body, (V, H, g, cs, sn, jnp.array(0))
        )
        # unused columns (j >= jstop) -> identity column & zero rhs, so the
        # fixed-size triangular solve yields y_j = 0 there
        used = jnp.arange(m) < jstop
        Hm = jnp.where(used[None, :], H[:m, :m], jnp.eye(m, dtype=b.dtype))
        gm = jnp.where(used, g[:m], 0.0)
        y = jax.scipy.linalg.solve_triangular(Hm, gm)
        x = x + V[:m].T @ y
        return x, jnp.abs(g[jstop]), jstop

    def cond(state):
        x, it, defect = state
        return (defect > target) & (it < maxiter)

    def body(state):
        x, it, defect = state
        x, defect, jstop = arnoldi_cycle(x)
        return x, it + jstop, defect

    x, it, defect = lax.while_loop(cond, body, (x, jnp.array(0), defect0))
    defect = _norm(dot, M(b - A(x)))
    return x, SolverStats(it, defect <= target, defect0, defect)


def richardson_loop(A: Callable, b, x0=None, M: Callable = _identity,
                    tol=1e-10, atol=0.0, maxiter=5000, omega=1.0,
                    dot=_default_dot):
    """Preconditioned Richardson iteration (ISTL LoopSolver analog)."""
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - A(x)
    defect0 = _norm(dot, r)
    target = jnp.maximum(tol * defect0, atol)

    def cond(state):
        x, r, it, defect = state
        return (defect > target) & (it < maxiter)

    def body(state):
        x, r, it, defect = state
        x = x + omega * M(r)
        r = b - A(x)
        return x, r, it + 1, _norm(dot, r)

    x, r, it, defect = lax.while_loop(cond, body, (x, r, jnp.array(0), defect0))
    return x, SolverStats(it, defect <= target, defect0, defect)


SOLVERS = {
    "cg": cg,
    "bicgstab": bicgstab,
    "minres": minres,
    "gmres": restarted_gmres,
    "loop": richardson_loop,
}
