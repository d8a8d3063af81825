"""Device-side LOBPCG for (generalized) symmetric eigenproblems.

The reference reaches eigenproblems through ARPACK bindings
(dune/pdelab/backend/istl/geneo/arpackpp_geneo.hh) — a host-side,
shift-invert, sparse-matrix workflow. The TPU-native counterpart is
LOBPCG: matrix-FREE (A and B are operator callables — compiled stencils,
jvp operators, or sharded applies all qualify), block-structured (the
hot ops are tall-skinny (n, m) matmuls that map onto the MXU), and
preconditioned (any of this package's preconditioners serves as M).

Solves A x = lambda B x for the `k` smallest eigenpairs, A/B symmetric
(B positive definite; B=None means standard). Robustified by soft
B-orthonormalization of the [X, W, P] trial block through an
eigendecomposition with rank cutoff — the textbook Cholesky variant
breaks down near convergence.

Used for: Maxwell/Laplace cavity modes (testelectrodynamic.cc analog),
and as a device-side alternative to the GenEO coarse-basis eigensolves.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class EigenResult(NamedTuple):
    eigenvalues: jax.Array        # (k,)
    eigenvectors: jax.Array       # (n, k), B-orthonormal
    iterations: int
    residual_norms: jax.Array     # (k,)


def _block_apply(op, X):
    """Apply an (n,)->(n,) operator columnwise to (n, m)."""
    return jax.vmap(op, in_axes=1, out_axes=1)(X)


def lobpcg(A: Callable, k: int, n: int = None, X0=None, B: Callable = None,
           M: Callable = None, tol: float = 1e-8, maxiter: int = 200,
           seed: int = 0, dtype=None):
    """Locally optimal block preconditioned conjugate gradient.

    A, B, M: callables on (n,) vectors (vmapped over blocks). Returns
    EigenResult with the k smallest eigenpairs of A x = lambda B x.
    Provide X0 (n, k) or (n, and k with a seed) for the start block.
    """
    if X0 is None:
        if n is None:
            raise ValueError("pass X0 or n")
        key = jax.random.PRNGKey(seed)
        X0 = jax.random.normal(key, (n, k),
                               dtype or jnp.result_type(float))
    X = jnp.asarray(X0)
    n, k = X.shape
    dt = X.dtype
    eps = jnp.finfo(dt).eps

    Bop = (lambda v: v) if B is None else B

    def rayleigh_ritz(S):
        """B-orthonormalize S softly, then Ritz-project A; returns the
        k lowest Ritz pairs (values, primal coefficients)."""
        BS = _block_apply(Bop, S)
        G = S.T @ BS
        G = 0.5 * (G + G.T)
        d, Q = jnp.linalg.eigh(G)
        cut = jnp.max(d) * eps * G.shape[0] * 10
        keep = d > cut
        # soft inverse sqrt (columns below the cutoff are zeroed)
        inv = jnp.where(keep, 1.0 / jnp.sqrt(jnp.where(keep, d, 1.0)), 0.0)
        T = Q * inv[None, :]
        AS = _block_apply(A, S)
        H = T.T @ (S.T @ AS) @ T
        H = 0.5 * (H + H.T)
        w, V = jnp.linalg.eigh(H)
        # zeroed (rank-deficient) directions get Ritz value ~0 from H's
        # null block; push them past the spectrum so the k smallest are
        # genuine
        bad = ~(jnp.abs(T).sum(axis=0) > 0)
        w = jnp.where(bad, jnp.inf, w)
        order = jnp.argsort(w)[:k]
        return w[order], T @ V[:, order]

    theta, Y = rayleigh_ritz(X)
    Xn = X @ Y if Y.shape[0] == k else None
    X = X @ Y
    P = jnp.zeros_like(X)
    res = None
    it_done = 0
    for it in range(maxiter):
        AX = _block_apply(A, X)
        BX = _block_apply(Bop, X)
        R = AX - BX * theta[None, :]
        res = jnp.linalg.norm(R, axis=0) / jnp.maximum(
            jnp.abs(theta), 1.0)
        it_done = it
        if bool(jnp.all(res < tol)):
            break
        W = _block_apply(M, R) if M is not None else R
        S = jnp.concatenate([X, W, P], axis=1) if it > 0 else \
            jnp.concatenate([X, W], axis=1)
        theta, Y = rayleigh_ritz(S)
        Xn = S @ Y
        # P = the W/P contribution of the new block (classic LOBPCG)
        Yp = Y.at[:k, :].set(0.0)
        P = S @ Yp
        X = Xn
    return EigenResult(theta, X, it_done + 1, res)
