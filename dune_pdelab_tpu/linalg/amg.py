"""Algebraic multigrid (smoothed aggregation) for general assembled operators.

The reference reaches AMG through dune-istl's aggregation AMG
(`Dune::Amg::AMG`), preassembled into backends like
ISTLBackend_SEQ_CG_AMG_SSOR (reference:
dune/pdelab/backend/istl/seqistlsolverbackend.hh:829-1060) and the
parallel/DG variants (ovlpistlsolverbackend.hh, seq_amg_dg_backend.hh:146).
That AMG works on ANY assembled sparse matrix — simplex, adaptive,
unstructured — where this framework's GeometricMultigrid (structured
lattices) and DG two-level (DG spaces) do not apply.

TPU-native split of the classic smoothed-aggregation algorithm
(Vanek/Mandel/Brezina; public-domain algorithm, reimplemented here):

* SETUP = host-side numpy/scipy graph work (the trace-time phase — same
  stance as DOF-map construction): strength-of-connection filtering,
  greedy aggregation, near-nullspace tentative prolongation with
  per-aggregate QR, Jacobi-smoothed prolongation, Galerkin RAP products.
  None of this is hot; all of it is data-dependent control flow XLA should
  never see.
* CYCLE = one jitted V-cycle over device-resident padded-ELL level
  matrices: every SpMV is `(vals * z[cols]).sum(axis=1)` — a gather plus
  a dense reduction, the layout XLA tiles well — with damped-Jacobi or
  Chebyshev smoothers and a dense LU coarse solve. Level count is static,
  so the recursion unrolls into one fused XLA computation.

Usage: `AlgebraicMultigrid()` is a LinearSolverBackend `precond` callable
(`(go, x_lin, time) -> (r -> M r)`), or build one directly from a scipy
CSR with `AlgebraicMultigrid.from_csr(A)`.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# host-side setup: aggregation hierarchy (numpy/scipy only)
# ---------------------------------------------------------------------------

def _strength_graph(A, theta):
    """Symmetric strength-of-connection: keep a_ij with
    |a_ij| >= theta * sqrt(|a_ii a_jj|). Returns a boolean CSR (no diag)."""
    import scipy.sparse as sp

    d = np.abs(A.diagonal())
    d = np.where(d > 0, d, 1.0)
    C = A.tocoo(copy=True)
    off = C.row != C.col
    keep = off & (np.abs(C.data) >= theta * np.sqrt(d[C.row] * d[C.col]))
    S = sp.csr_matrix(
        (np.ones(keep.sum(), np.int8), (C.row[keep], C.col[keep])),
        shape=A.shape)
    return S


_NATIVE_AGG = None


def _native_aggregate():
    """ctypes binding for linalg/native/amg_setup.cc (g++-compiled on
    first use, cached); returns None when no toolchain is available —
    the pure-Python `_aggregate` below is the behavioral spec and both
    produce bit-identical aggregate arrays (same sequential order)."""
    global _NATIVE_AGG
    if _NATIVE_AGG is not None:
        return _NATIVE_AGG or None
    import ctypes
    import os
    import subprocess

    d = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native")
    src = os.path.join(d, "amg_setup.cc")
    lib = os.path.join(d, "libamgsetup.so")
    try:
        if (not os.path.exists(lib)
                or os.path.getmtime(lib) < os.path.getmtime(src)):
            subprocess.run(["g++", "-O3", "-shared", "-fPIC", "-o", lib,
                            src], check=True, capture_output=True)
        L = ctypes.CDLL(lib)
        i64p = ctypes.POINTER(ctypes.c_int64)
        L.amg_aggregate.restype = ctypes.c_int64
        L.amg_aggregate.argtypes = [
            ctypes.c_int64, i64p, i64p,
            ctypes.POINTER(ctypes.c_uint8), i64p]
        _NATIVE_AGG = L
        return L
    except Exception:
        _NATIVE_AGG = False
        return None


def _aggregate(S, decoupled):
    """Greedy (Vanek) aggregation on the strength graph.

    Pass 1: a node whose strong neighborhood is untouched seeds an
    aggregate of itself + neighbors. Pass 2: leftovers join the strongest
    adjacent aggregate. Pass 3: remaining isolated nodes become
    singletons. Structurally decoupled rows (no off-diagonal entries in A
    at all — Dirichlet identity rows after symmetric elimination) are
    EXCLUDED from the coarse space (agg = -2): one smoother sweep solves
    them exactly, and keeping them would pile up permanent singletons on
    every level. Returns (agg: node -> aggregate or -2, n_agg)."""
    n = S.shape[0]
    L = _native_aggregate()
    if L is not None:
        import ctypes
        indptr64 = np.ascontiguousarray(S.indptr, np.int64)
        indices64 = np.ascontiguousarray(S.indices, np.int64)
        dec = np.ascontiguousarray(decoupled, np.uint8)
        agg = np.empty(n, np.int64)
        i64p = ctypes.POINTER(ctypes.c_int64)
        n_agg = L.amg_aggregate(
            n, indptr64.ctypes.data_as(i64p),
            indices64.ctypes.data_as(i64p),
            dec.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            agg.ctypes.data_as(i64p))
        return agg, int(n_agg)
    agg = np.full(n, -1, np.int64)
    agg[decoupled] = -2
    indptr, indices = S.indptr, S.indices
    n_agg = 0
    for i in range(n):
        if agg[i] != -1:
            continue
        nbrs = indices[indptr[i]:indptr[i + 1]]
        if nbrs.size and np.all(agg[nbrs] == -1):
            agg[i] = n_agg
            agg[nbrs] = n_agg
            n_agg += 1
    for i in range(n):
        if agg[i] != -1:
            continue
        nbrs = indices[indptr[i]:indptr[i + 1]]
        owned = nbrs[agg[nbrs] >= 0]
        if owned.size:
            agg[i] = agg[owned[0]]
    for i in range(n):
        if agg[i] == -1:
            agg[i] = n_agg
            n_agg += 1
    return agg, n_agg


def _tentative_prolongation(agg, n_agg, B):
    """Near-nullspace-exact tentative prolongation.

    B: (n, nb) near-nullspace block (default: the constant vector; for
    elasticity pass rigid-body modes). Per aggregate, the thin QR of B's
    rows gives an orthonormal local basis (the P0 column block) and the
    coarse-level near-nullspace (the R factor)."""
    import scipy.sparse as sp

    n, nb = B.shape
    member = np.flatnonzero(agg >= 0)
    if nb == 1:
        # vectorized normalization (the per-aggregate QR loop is O(n_agg)
        # interpreted). Column-sign conventions don't matter: a sign flip
        # of a P0 column propagates as an exact +-1 similarity through
        # smoothing/RAP and cancels in the V-cycle bit-for-bit.
        nrm2 = np.zeros(n_agg, B.dtype)
        np.add.at(nrm2, agg[member], B[member, 0] ** 2)
        nrm = np.sqrt(nrm2)
        nrm_safe = np.where(nrm == 0, 1.0, nrm)
        P0 = sp.csr_matrix(
            (B[member, 0] / nrm_safe[agg[member]],
             (member, agg[member])), shape=(n, n_agg))
        return P0, nrm[:, None]
    order = member[np.argsort(agg[member], kind="stable")]
    bounds = np.searchsorted(agg[order], np.arange(n_agg + 1))
    rows, cols, vals = [], [], []
    Bc = np.zeros((n_agg * nb, nb), B.dtype)
    for a in range(n_agg):
        idx = order[bounds[a]:bounds[a + 1]]
        Q, R = np.linalg.qr(B[idx])  # (m, nb), (nb, nb)
        rows.append(np.repeat(idx, nb))
        cols.append(np.tile(a * nb + np.arange(nb), idx.size))
        vals.append(Q.reshape(-1))
        Bc[a * nb:(a + 1) * nb] = R
    P0 = sp.csr_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(n, n_agg * nb))
    return P0, Bc


def _spectral_radius(A, iters=15, seed=0):
    """Power-iteration estimate of rho(D^-1 A) (host, scipy)."""
    rng = np.random.default_rng(seed)
    d = A.diagonal()
    d = np.where(np.abs(d) > 0, d, 1.0)
    x = rng.standard_normal(A.shape[0])
    x /= np.linalg.norm(x)
    rho = 1.0
    for _ in range(iters):
        y = (A @ x) / d
        ny = np.linalg.norm(y)
        if ny == 0:
            return 1.0
        rho, x = ny, y / ny
    return rho


def _csr_to_ell(A, dtype):
    """CSR -> padded ELL (cols[n,k], vals[n,k]); pads reference the row's
    own index with zero value so gathers stay in-bounds."""
    A = A.tocsr()
    A.sum_duplicates()
    n = A.shape[0]
    counts = np.diff(A.indptr)
    k = max(int(counts.max()), 1)
    cols = np.tile(np.arange(n)[:, None], (1, k))
    vals = np.zeros((n, k), dtype)
    r = np.repeat(np.arange(n), counts)
    pos = np.arange(A.nnz) - np.repeat(A.indptr[:-1], counts)
    cols[r, pos] = A.indices
    vals[r, pos] = A.data
    return jnp.asarray(cols, jnp.int32), jnp.asarray(vals)


def _ell_apply(cols, vals, z):
    return (vals * z[cols]).sum(axis=1)


class _Level:
    __slots__ = ("A_cols", "A_vals", "diag", "P_cols", "P_vals",
                 "R_cols", "R_vals", "lmax", "n", "nc")


class AlgebraicMultigrid:
    """Smoothed-aggregation AMG V-cycle preconditioner.

    Parameters mirror dune-istl's Amg::Parameters knobs where they exist:
    theta = strength threshold, max_coarse = coarsen target (ISTL
    coarsenTarget), presmooth/postsmooth = smoother steps (ISTL
    setNoPre/PostSmoothSteps), smoother = 'jacobi' (damped 2/3) or
    'chebyshev'. near_nullspace: (n, nb) array; None -> constants.
    """

    def __init__(self, theta=0.02, max_coarse=256, max_levels=12,
                 omega=4.0 / 3.0, smoother="jacobi", presmooth=1,
                 postsmooth=1, jacobi_damping=2.0 / 3.0, cheby_degree=2,
                 near_nullspace=None):
        self.theta = theta
        self.max_coarse = max_coarse
        self.max_levels = max_levels
        self.omega = omega
        self.smoother = smoother
        self.presmooth = presmooth
        self.postsmooth = postsmooth
        self.jacobi_damping = jacobi_damping
        self.cheby_degree = cheby_degree
        self.near_nullspace = near_nullspace
        self._setup_key = None
        self._apply = None

    # -- setup ---------------------------------------------------------------
    def setup_from_csr(self, A, keep_host=False, parts=None):
        """keep_host: also retain the hierarchy as host scipy CSRs
        (`self.host_levels` = [(A, P, R, diag, lmax), ...],
        `self.host_coarse` = dense coarse matrix) — consumed by
        parallel.shardedamg.ShardedAMG.

        parts: distributed-setup mode — partition each level's rows into
        `parts` contiguous blocks and build the hierarchy with DECOUPLED
        per-block aggregation (Tuminaro/Tong decoupled smoothed
        aggregation: aggregates never span blocks) plus per-block
        smoothed-prolongation and Galerkin RAP contributions. Every
        per-block step reads only that block's A rows (plus the P rows its
        column halo touches — the ParallelIndexSet comm of the reference's
        parallel AMG, reference: dune/pdelab/backend/istl/
        parallelhelper.hh:273-440 createIndexSetAndProjectForAMG), so the
        per-block wall is O(nnz/parts); `self.setup_part_walls[level]`
        records the measured per-block walls, and `setup_parts_report()`
        extrapolates the distributed setup wall at larger N. Iteration
        quality typically costs 0-2 extra Krylov iterations vs coupled
        aggregation (seam aggregates are smaller)."""
        import time as _time
        import scipy.sparse as sp

        A = sp.csr_matrix(A)
        dtype = A.dtype
        B = self.near_nullspace
        if B is None:
            B = np.ones((A.shape[0], 1), dtype)
        B = np.asarray(B, dtype)
        levels = []
        host = []
        self.setup_parts = parts
        self.setup_part_walls = []
        while (A.shape[0] > self.max_coarse
               and len(levels) < self.max_levels - 1):
            S = _strength_graph(A, self.theta)
            offdiag = A - sp.diags(A.diagonal())
            offdiag.eliminate_zeros()
            decoupled = np.diff(offdiag.tocsr().indptr) == 0
            rho = _spectral_radius(A)
            d = A.diagonal()
            d = np.where(np.abs(d) > 0, d, 1.0)
            if parts and parts > 1 and A.shape[0] >= 4 * parts:
                n = A.shape[0]
                bounds = np.linspace(0, n, parts + 1).astype(np.int64)
                agg = np.full(n, -2, np.int64)
                n_agg = 0
                walls = []
                Sc = S.tocsr()
                for p in range(parts):
                    t0 = _time.perf_counter()
                    r0, r1 = int(bounds[p]), int(bounds[p + 1])
                    Sb = Sc[r0:r1, r0:r1]          # intra-block strength
                    ab, na = _aggregate(Sb, decoupled[r0:r1])
                    loc = ab >= 0
                    agg[r0:r1][loc] = ab[loc] + n_agg
                    n_agg += na
                    walls.append(_time.perf_counter() - t0)
                if n_agg == 0 or n_agg * B.shape[1] >= n:
                    break
                P0, Bc = _tentative_prolongation(agg, n_agg, B)
                Dinv = sp.diags(1.0 / d)
                # per-block smoothed P + Galerkin RAP contributions
                P_blocks, rap = [], None
                for p in range(parts):
                    t0 = _time.perf_counter()
                    r0, r1 = int(bounds[p]), int(bounds[p + 1])
                    Ab = A[r0:r1]                  # block rows (full cols)
                    Pb = (P0[r0:r1] - (self.omega / rho)
                          * sp.diags(1.0 / d[r0:r1]) @ (Ab @ P0))
                    P_blocks.append(Pb.tocsr())
                    walls[p] += _time.perf_counter() - t0
                P = sp.vstack(P_blocks).tocsr()
                for p in range(parts):
                    t0 = _time.perf_counter()
                    r0, r1 = int(bounds[p]), int(bounds[p + 1])
                    contrib = P[r0:r1].T @ (A[r0:r1] @ P)
                    rap = contrib if rap is None else rap + contrib
                    walls[p] += _time.perf_counter() - t0
                A_next = rap.tocsr()
                self.setup_part_walls.append(walls)
                R = P.T.tocsr()
            else:
                agg, n_agg = _aggregate(S, decoupled)
                if n_agg == 0 or n_agg * B.shape[1] >= A.shape[0]:
                    break  # aggregation stalled (e.g. diagonal matrix)
                P0, Bc = _tentative_prolongation(agg, n_agg, B)
                Dinv = sp.diags(1.0 / d)
                P = (P0 - (self.omega / rho) * (Dinv @ (A @ P0))).tocsr()
                A_next = None
                R = P.T.tocsr()
            lvl = _Level()
            lvl.n, lvl.nc = A.shape[0], P.shape[1]
            lvl.A_cols, lvl.A_vals = _csr_to_ell(A, dtype)
            lvl.diag = jnp.asarray(d)
            lvl.P_cols, lvl.P_vals = _csr_to_ell(P, dtype)
            lvl.R_cols, lvl.R_vals = _csr_to_ell(R, dtype)
            lvl.lmax = float(rho)
            levels.append(lvl)
            if keep_host:
                host.append((A, P, R, d, float(rho)))
            A = A_next if A_next is not None else (R @ (A @ P)).tocsr()
            A.eliminate_zeros()
            B = Bc
        self._levels = levels
        if keep_host:
            self.host_levels = host
            self.host_coarse = A.toarray()
        # factor the (small) coarse matrix on the HOST: XLA's
        # LuDecomposition is F32/C64-only on TPU, which would break fp64
        # runs; device-side lu_solve (TriangularSolve) supports fp64
        import scipy.linalg as sla
        lu, piv = sla.lu_factor(A.toarray())
        self._coarse = (jnp.asarray(lu), jnp.asarray(piv.astype(np.int32)))
        self._nnz_per_level = [int((np.asarray(l.A_vals) != 0).sum())
                               for l in levels] + [A.nnz]
        self._build_apply()
        return self

    def setup_from_grid_operator(self, go, x_lin=None, time=0.0,
                                 keep_host=False, parts=None):
        """Assemble via the lattice-ELL path when the space qualifies
        (O(N*taps) memory), else the general BCOO jacobian."""
        import scipy.sparse as sp

        x_lin = x_lin if x_lin is not None else jnp.zeros(go.space.ndofs)
        A = None
        try:
            from dune_pdelab_tpu.assembly.ell import assemble_ell, ell_to_csr
            ell = assemble_ell(go, x_lin, time)
            A = ell_to_csr(ell)
        except Exception:
            A = None
        if A is None:
            Abcoo = go.jacobian(x_lin, time)
            ind = np.asarray(Abcoo.indices)
            A = sp.coo_matrix(
                (np.asarray(Abcoo.data), (ind[:, 0], ind[:, 1])),
                shape=Abcoo.shape).tocsr()
        return self.setup_from_csr(A, keep_host=keep_host, parts=parts)

    @classmethod
    def from_csr(cls, A, **kw):
        return cls(**kw).setup_from_csr(A)

    # -- jitted V-cycle --------------------------------------------------------
    def _smooth(self, lvl, x, r, steps):
        if self.smoother == "chebyshev":
            from . import preconditioners
            cheb = preconditioners.chebyshev(
                lambda z: _ell_apply(lvl.A_cols, lvl.A_vals, z),
                lvl.diag, lvl.lmax, degree=self.cheby_degree)
            for _ in range(steps):
                x = x + cheb(r - _ell_apply(lvl.A_cols, lvl.A_vals, x))
            return x
        wj = self.jacobi_damping
        for _ in range(steps):
            x = x + wj * (r - _ell_apply(lvl.A_cols, lvl.A_vals, x)) / lvl.diag
        return x

    def _build_apply(self):
        levels = self._levels
        coarse = self._coarse

        def vcycle(l, r):
            if l == len(levels):
                return jax.scipy.linalg.lu_solve(coarse, r[:, None])[:, 0]
            lvl = levels[l]
            x = jnp.zeros_like(r)
            x = self._smooth(lvl, x, r, self.presmooth)
            res = r - _ell_apply(lvl.A_cols, lvl.A_vals, x)
            rc = _ell_apply(lvl.R_cols, lvl.R_vals, res)
            xc = vcycle(l + 1, rc)
            x = x + _ell_apply(lvl.P_cols, lvl.P_vals, xc)
            x = self._smooth(lvl, x, r, self.postsmooth)
            return x

        self._apply = jax.jit(lambda r: vcycle(0, r))

    def apply(self, r):
        return self._apply(r)

    def __call__(self, go_or_r, x_lin=None, time=0.0):
        """Dual calling convention (same trick as GeometricMultigrid):
        as a LinearSolverBackend precond factory `(go, x_lin, time)`, or —
        once set up — directly on a residual vector."""
        if hasattr(go_or_r, "jacobian_apply") or hasattr(go_or_r, "space"):
            # linear operator: one hierarchy serves every solve; nonlinear:
            # rebuild per linearization point (same contract as
            # GeometricMultigrid.__call__ — no device->host hashing of x_lin)
            key = ((id(go_or_r), float(time))
                   if getattr(go_or_r.lop, "is_linear", False)
                   else object())
            if self._apply is None or self._setup_key != key:
                self.setup_from_grid_operator(go_or_r, x_lin, time)
                self._setup_key = key
            return self._apply
        return self._apply(go_or_r)

    # -- diagnostics -----------------------------------------------------------
    def hierarchy_info(self):
        """Per-level (n, nnz) + operator complexity (sum nnz / fine nnz)."""
        sizes = [l.n for l in self._levels] + [
            int(self._coarse[0].shape[0])]
        nnz = self._nnz_per_level
        return {"sizes": sizes, "nnz": nnz,
                "operator_complexity": float(sum(nnz)) / max(nnz[0], 1)}

    def setup_parts_report(self, target_n=None):
        """Distributed-setup accounting (after setup_from_csr(parts=p)):
        measured per-block setup walls per level, the critical path
        (max block per level, summed), and an O(N)-extrapolated wall for
        `target_n` rows on the same per-row rate."""
        if not getattr(self, "setup_part_walls", None):
            return None
        crit = sum(max(w) for w in self.setup_part_walls)
        total = sum(sum(w) for w in self.setup_part_walls)
        n0 = self._levels[0].n if self._levels else 0
        rep = {"parts": self.setup_parts,
               "critical_path_s": crit,
               "serial_equivalent_s": total,
               "parallel_efficiency": total / (crit * self.setup_parts)
               if crit else 0.0}
        if target_n and n0:
            rep["extrapolated_critical_path_s_at_target"] = (
                crit * target_n / n0)
            rep["target_n"] = target_n
        return rep
