"""Sparse direct solver backend (SuperLU / UMFPack analog).

TPU-native stand-in for PDELab's direct sequential backends
`ISTLBackend_SEQ_SuperLU` / `ISTLBackend_SEQ_UMFPack` (reference:
dune/pdelab/backend/istl/seqistlsolverbackend.hh:983-1060, the direct-solver
rows of the 27-combination table). A sparse direct solve is inherently a
sequential, data-dependent elimination — there is no useful TPU lowering —
so, exactly like the reference (which calls out to the external SuperLU
library on the host CPU), we assemble the Jacobian on device, move it to
host once, factorize with SuperLU (scipy.sparse.linalg.splu IS SuperLU),
and back/forward-substitute on host. The factorization is cached across
solves under the same reuse contract as the Krylov backends
(reference: dune/pdelab/solver/newton.hh:98-120 reassemble threshold).

Intended uses mirror the reference:
 - small/medium stiff systems where Krylov iteration counts explode,
 - the coarse-level solve of multigrid hierarchies (`SparseLU` below is
   accepted by linalg.multigrid as a coarse solver),
 - golden-value generation for iteration-parity tests.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax.numpy as jnp

from dune_pdelab_tpu.linalg.krylov import SolverStats


def _to_scipy_csc(mat, n):
    """Convert an assembled Jacobian (BCOO or dense) to scipy CSC."""
    import scipy.sparse as sp

    if hasattr(mat, "indices") and hasattr(mat, "data"):  # BCOO
        idx = np.asarray(mat.indices)
        dat = np.asarray(mat.data)
        return sp.csc_matrix((dat, (idx[:, 0], idx[:, 1])), shape=(n, n))
    arr = np.asarray(mat)
    return sp.csc_matrix(arr)


class SparseLU:
    """One factorized sparse matrix: solve(b) by substitution.

    Also usable as a multigrid coarse solver: callable on a (possibly
    batched) right-hand side, returns the solution with b's dtype.
    """

    def __init__(self, mat, n=None):
        from scipy.sparse.linalg import splu

        n = int(n if n is not None else mat.shape[0])
        self.n = n
        self._csc = _to_scipy_csc(mat, n).astype(np.float64)
        self._lu = splu(self._csc.tocsc())

    def __call__(self, b):
        return self.solve(b)

    def _solve64(self, b):
        b_np = np.asarray(b, dtype=np.float64)
        return self._lu.solve(b_np.reshape(self.n, -1) if b_np.ndim > 1
                              else b_np).reshape(np.shape(b))

    def solve(self, b):
        return jnp.asarray(self._solve64(b), dtype=jnp.asarray(b).dtype)

    def residual_norm(self, z, b):
        z_np = np.asarray(z, dtype=np.float64)
        b_np = np.asarray(b, dtype=np.float64)
        return float(np.linalg.norm(self._csc @ z_np - b_np))


@dataclass
class DirectSolverBackend:
    """Direct sparse LU backend with the LinearSolverBackend.solve signature.

    Drop-in for LinearSolverBackend anywhere a linear solver backend is
    accepted (StationaryLinearProblemSolver, NewtonMethod, OneStepMethod).
    `use_ell` has no meaning here; assembly always goes through
    `go.jacobian` (BCOO) since the host factorization wants triplets.
    """

    verbose: int = 0
    stats_history: list = field(default_factory=list)
    _cache: dict = field(default_factory=dict, repr=False)

    def solve(self, go, x_lin, b, reduction, time=0.0, x0=None, reuse=False):
        key = id(go)
        if key not in self._cache or not (
                reuse or getattr(go.lop, "is_linear", False)):
            mat = go.jacobian(x_lin, time)
            self._cache[key] = SparseLU(mat, go.space.ndofs)
        lu = self._cache[key]
        z64 = lu._solve64(b)
        z = jnp.asarray(z64, dtype=jnp.asarray(b).dtype)
        b_norm = float(np.linalg.norm(np.asarray(b, dtype=np.float64)))
        r_norm = lu.residual_norm(z64, b)
        # reference semantics: a successful factorization IS convergence
        # (ISTL SuperLU wrapper sets res.converged = true); the achieved
        # defect is reported for inspection.
        stats = SolverStats(jnp.asarray(1), jnp.asarray(True),
                            jnp.asarray(b_norm), jnp.asarray(r_norm))
        self.stats_history.append(stats)
        if self.verbose:
            print(f"  [superlu] n={lu.n} defect {b_norm:.3e} -> {r_norm:.3e}")
        return z, stats


def SEQ_SuperLU(**kw):
    """ISTLBackend_SEQ_SuperLU analog (seqistlsolverbackend.hh:983)."""
    return DirectSolverBackend(**kw)


def SEQ_UMFPack(**kw):
    """ISTLBackend_SEQ_UMFPack analog — same host factorization path."""
    return DirectSolverBackend(**kw)
