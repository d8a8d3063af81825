"""GenEO-style spectral two-level overlapping Schwarz preconditioner.

TPU-native analog of the reference GenEO stack (reference:
dune/pdelab/backend/istl/geneo/ — partition of unity partitionofunity.hh,
per-subdomain generalized eigenproblems geneobasis.hh:22 (ARPACK in the
reference, batched dense `eigh` here), Galerkin coarse matrix
subdomainprojectedcoarsespace.hh:27, TwoLevelOverlappingAdditiveSchwarz
two_level_schwarz.hh:18).

Two implementations:
  * `GenEOPreconditioner` — reference/dense variant (batched (ndom, m, m)
    eigh/LU on device); exact, for moderate subdomain sizes and as the
    oracle for the sparse variant;
  * `GenEOLatticePreconditioner` — production-shaped variant for
    lattice-ELL operators: per-iteration local solves are BATCHED lattice
    ILU(0) sweeps (no dense local operator anywhere), setup eigenproblems
    run sparse shift-invert ARPACK (the reference's arpackpp route), and
    the coarse basis is stored subdomain-sparse.

    M r = Z A0^{-1} Z^T r + sum_i R_i^T A_i^{-1} R_i r
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def lattice_box_subdomains(grid_shape, nsub_axes, overlap: int,
                           pou: str = "linear"):
    """Overlapping BOX subdomains of a DOF lattice with a product-hat
    partition of unity — true mesh subdomains (the reference's
    rank-subdomain geometry, partitionofunity.hh), replacing the round-1
    1D index slabs. grid_shape is slowest-axis-first; returns
    (idx_list, chi_list) of flat index arrays / PU weights."""
    dim = len(grid_shape)
    nsub_axes = tuple(nsub_axes)
    assert len(nsub_axes) == dim
    # per-axis overlapping ranges + 1D hats
    ax_ranges, ax_hats = [], []
    for n, ns in zip(grid_shape, nsub_axes):
        base = n // ns
        rngs, hats = [], []
        for i in range(ns):
            lo = max(0, i * base - overlap)
            hi = min(n, ((i + 1) * base if i < ns - 1 else n) + overlap)
            idx = np.arange(lo, hi)
            chi = np.ones(len(idx))
            if pou == "linear":
                core_lo, core_hi = i * base, ((i + 1) * base if i < ns - 1
                                              else n)
                below = idx < core_lo
                above = idx >= core_hi
                chi[below] = 1.0 - (core_lo - idx[below]) / (overlap + 1.0)
                chi[above] = 1.0 - (idx[above] - core_hi + 1) / (overlap + 1.0)
            rngs.append(idx)
            hats.append(chi)
        ax_ranges.append(rngs)
        ax_hats.append(hats)
    # strides of the flat C-order index (grid_shape is the array shape)
    strides = np.ones(dim, dtype=np.int64)
    for d in range(dim - 2, -1, -1):
        strides[d] = strides[d + 1] * grid_shape[d + 1]
    import itertools as it
    idx_list, chi_list = [], []
    for combo in it.product(*[range(ns) for ns in nsub_axes]):
        idxs = [ax_ranges[d][combo[d]] for d in range(dim)]
        hats = [ax_hats[d][combo[d]] for d in range(dim)]
        flat = np.zeros((1,), dtype=np.int64)
        chi = np.ones((1,))
        for d in range(dim):
            flat = (flat[:, None] + (idxs[d] * strides[d])[None, :]).ravel()
            chi = (chi[:, None] * hats[d][None, :]).ravel()
        idx_list.append(flat)
        chi_list.append(chi)
    return idx_list, chi_list


class GenEOPreconditioner:
    def __init__(self, A_dense, nsub: int = 0, overlap: int = 1, nev: int = 3,
                 pou: str = "linear", neumann: str = "rowsum",
                 subdomains=None):
        """A_dense: (N, N) assembled operator (jnp or numpy); nsub equal
        overlapping index slabs with `overlap` extra indices each side;
        nev eigenvectors per subdomain feed the coarse space.

        neumann: local matrices for the eigenproblem —
          'rowsum': diagonal corrected so local off-diagonal row sums are
                    preserved (exact Neumann matrix for operators with
                    constant kernel, e.g. diffusion; the coarse space then
                    contains the partition-of-unity constants, which is what
                    makes iteration counts independent of subdomain count),
          'dirichlet': plain submatrix (no kernel modes; NOT scalable).
        """
        import scipy.sparse as sp
        sparse = sp.issparse(A_dense)
        A = A_dense.tocsr() if sparse else np.asarray(A_dense)
        N = A.shape[0]
        self.N = N
        if subdomains is not None:
            # explicit mesh subdomains (e.g. lattice_box_subdomains)
            idx_list, chi_list = subdomains
            idx_list = [np.asarray(ix, np.int64) for ix in idx_list]
            chi_list = [np.asarray(c, np.float64) for c in chi_list]
            nsub = len(idx_list)
        else:
            base = N // nsub
            assert base * nsub == N, "N must be divisible by nsub"
            idx_list, chi_list = [], []
            for i in range(nsub):
                lo = max(0, i * base - overlap)
                hi = min(N, (i + 1) * base + overlap)
                idx = np.arange(lo, hi)
                # linear partition-of-unity hat over the overlap region
                chi = np.ones(len(idx))
                if pou == "linear":
                    for j, g in enumerate(idx):
                        if g < i * base:
                            chi[j] = 1.0 - (i * base - g) / (overlap + 1.0)
                        elif g >= (i + 1) * base:
                            chi[j] = 1.0 - (g - (i + 1) * base + 1) / (overlap + 1.0)
                idx_list.append(idx)
                chi_list.append(chi)
        # normalize PU so it sums to 1 at every dof
        den = np.zeros(N)
        for idx, chi in zip(idx_list, chi_list):
            den[idx] += chi
        chi_list = [chi / den[idx] for idx, chi in zip(idx_list, chi_list)]

        # pad to equal subdomain size for batching
        m = max(len(ix) for ix in idx_list)
        self.m = m
        sub_idx = np.zeros((nsub, m), dtype=np.int64)
        sub_mask = np.zeros((nsub, m))
        sub_chi = np.zeros((nsub, m))
        A_loc = np.zeros((nsub, m, m))
        for i, (idx, chi) in enumerate(zip(idx_list, chi_list)):
            k = len(idx)
            sub_idx[i, :k] = idx
            sub_mask[i, :k] = 1.0
            sub_chi[i, :k] = chi
            Ai = (A[idx][:, idx].toarray() if sparse
                  else A[np.ix_(idx, idx)])
            A_loc[i, :k, :k] = Ai
            # identity on padding to keep factorizations nonsingular
            for j in range(k, m):
                A_loc[i, j, j] = 1.0

        # GenEO eigenproblem on the NEUMANN local matrix:
        #   A_i^Neu v = lambda (X_i A_i^Neu X_i) v,  X = diag(chi);
        # smallest-lambda modes (incl. the lambda=0 kernel, e.g. constants)
        # weighted by the PU form the coarse space (geneobasis.hh:22 analog).
        basis = []
        for i in range(nsub):
            k = len(idx_list[i])
            Ai = A_loc[i, :k, :k]
            if neumann == "rowsum":
                An = Ai.copy()
                np.fill_diagonal(An, 0.0)
                np.fill_diagonal(An, -An.sum(axis=1))
            else:
                An = Ai
            X = np.diag(sub_chi[i, :k])
            B = X @ An @ X
            # regularize: B is singular where chi -> 0 and on kernel modes
            reg = 1e-10 * max(1.0, np.abs(An).max())
            w, v = _gen_eigh_smallest(An + reg * np.eye(k),
                                      B + reg * np.eye(k), nev)
            for j in range(v.shape[1]):
                z = np.zeros(N)
                z[idx_list[i]] = sub_chi[i, :k] * v[:, j]
                basis.append(z)
        Z = np.stack(basis, axis=1)                       # (N, ncoarse)
        A0 = Z.T @ A @ Z
        import scipy.linalg as sla
        lu0, piv0 = sla.lu_factor(A0 + 1e-12 * np.eye(A0.shape[0]))
        lu_loc, piv_loc = jax.scipy.linalg.lu_factor(jnp.asarray(A_loc))

        self.Z = jnp.asarray(Z)
        self._coarse = (jnp.asarray(lu0), jnp.asarray(piv0.astype(np.int32)))
        self._loc = (lu_loc, piv_loc)
        self.sub_idx = jnp.asarray(sub_idx, jnp.int32)
        self.sub_mask = jnp.asarray(sub_mask)
        self.sub_chi = jnp.asarray(sub_chi)
        self.ncoarse = Z.shape[1]
        self._apply = jax.jit(self._apply_impl)

    def _apply_impl(self, r):
        # coarse: Z A0^{-1} Z^T r
        rc = self.Z.T @ r
        zc = jax.scipy.linalg.lu_solve(self._coarse, rc[:, None])[:, 0]
        z = self.Z @ zc
        # local: sum_i R_i^T A_i^{-1} R_i r (masked padding)
        r_loc = r[self.sub_idx] * self.sub_mask              # (ndom, m)
        z_loc = jax.scipy.linalg.lu_solve(self._loc, r_loc[..., None])[..., 0]
        z_loc = z_loc * self.sub_mask
        z = z + jnp.zeros_like(r).at[self.sub_idx.reshape(-1)].add(
            z_loc.reshape(-1))
        return z

    def __call__(self, r):
        return self._apply(r)


class GenEOLatticePreconditioner:
    """Production-shaped GenEO on a lattice-ELL operator: NO dense (m, m)
    local operator anywhere.

      * subdomains = overlapping lattice boxes (equal padded shape);
      * per-iteration local solves = the Chow-Patel lattice ILU(0)
        (linalg/ilu.py) BATCHED over subdomains — the boxes are stacked
        along an extra slowest lattice axis whose tap offsets are all 0,
        so one EllILU0 factorization/apply covers every subdomain at once
        with pure shift-MACs (no gathers, no dense blocks);
      * setup eigenproblems = sparse shift-invert Lanczos (scipy ARPACK —
        exactly the reference's arpackpp_geneo.hh route) on the local CSR
        Neumann matrices, O(nnz) memory;
      * the coarse basis Z is stored subdomain-sparse ((nsub, nev, m)
        values + index map), so Z^T r / Z zc are gathers + einsums;
      * A0 = Z^T A Z is computed with the device ELL apply on the nsub*nev
        basis columns and LU-factorized (ncoarse x ncoarse, small).

    Reference: geneobasis.hh:22, subdomainprojectedcoarsespace.hh:27,
    two_level_schwarz.hh:18.
    """

    def __init__(self, ell, boxes, overlap=2, nev=3, sweeps=8, tri_iters=6,
                 neumann: str = "rowsum"):
        # NOTE: high-contrast operators need more Chow-Patel fixed-point
        # sweeps / truncated-triangular terms than the EllILU0 defaults
        # (empirically sweeps>=8, tri_iters>=6 at contrast 1e4)
        import scipy.sparse as sp
        import scipy.sparse.linalg as spla
        from dune_pdelab_tpu.assembly.ell import EllMatrix
        from dune_pdelab_tpu.linalg.ilu import EllILU0

        grid_shape = ell.grid_shape            # slowest axis first
        dim = len(grid_shape)
        N = int(np.prod(grid_shape))
        self.N = N
        idx_list, chi_list = lattice_box_subdomains(grid_shape, boxes,
                                                    overlap)
        nsub = len(idx_list)
        # normalize PU
        den = np.zeros(N)
        for idx, chi in zip(idx_list, chi_list):
            den[idx] += chi
        chi_list = [chi / den[idx] for idx, chi in zip(idx_list, chi_list)]

        # equal box shape: per-axis maximum extent over subdomains
        box_ext = []
        for d in range(dim):
            base = grid_shape[d] // boxes[d]
            ext = min(grid_shape[d],
                      base + 2 * overlap + (grid_shape[d] % boxes[d]))
            box_ext.append(ext)
        box = tuple(box_ext)
        m = int(np.prod(box))
        self.m = m

        vals_np = np.asarray(ell.values, np.float64)    # (ntaps, *grid)
        ntaps = vals_np.shape[0]
        offsets = np.asarray(ell.offsets)               # (ntaps, dim) fast0
        mask_np = (np.asarray(ell.mask).reshape(grid_shape)
                   if ell.mask is not None else
                   np.zeros(grid_shape, bool))

        # per-subdomain box extraction (pad with identity rows)
        sub_vals = np.zeros((ntaps, nsub) + box)
        sub_idx = np.zeros((nsub, m), np.int64)
        sub_mask = np.zeros((nsub, m))
        sub_chi = np.zeros((nsub, m))
        diag_t = int(np.nonzero((offsets == 0).all(axis=1))[0][0])
        basis_rows = []
        for i, (gidx, chi) in enumerate(zip(idx_list, chi_list)):
            mi = np.stack(np.unravel_index(gidx, grid_shape), axis=1)
            lo = mi.min(axis=0)
            ext = mi.max(axis=0) - lo + 1
            sl = tuple(slice(lo[d], lo[d] + ext[d]) for d in range(dim))
            bsl = tuple(slice(0, ext[d]) for d in range(dim))
            for t in range(ntaps):
                sub_vals[(t, i) + bsl] = vals_np[(t,) + sl]
            # box-local flat indices of the true rows, C-order over `box`
            loc = mi - lo[None, :]
            bstr = np.ones(dim, np.int64)
            for d in range(dim - 2, -1, -1):
                bstr[d] = bstr[d + 1] * box[d + 1]
            lflat = loc @ bstr
            sub_idx[i, lflat] = gidx
            sub_mask[i, lflat] = 1.0
            sub_chi[i, lflat] = chi
            # identity rows on padding
            pad = np.ones(box, bool)
            pad[bsl] = False
            sub_vals[diag_t, i][pad] = 1.0

            # ---- setup: local sparse Neumann eigenproblem (ARPACK) -----
            # local CSR from global values restricted to this subdomain's
            # TRUE rows (couplings leaving the subdomain dropped)
            gset = np.full(N, -1, np.int64)
            gset[gidx] = np.arange(len(gidx))
            rows, cols, data = [], [], []
            mi_all = mi
            for t in range(ntaps):
                og = offsets[t][::-1]               # grid-axis order
                tgt = mi_all + og[None, :]
                ok = np.all((tgt >= 0)
                            & (tgt < np.asarray(grid_shape)[None]), axis=1)
                gstr = np.ones(dim, np.int64)
                for d in range(dim - 2, -1, -1):
                    gstr[d] = gstr[d + 1] * grid_shape[d + 1]
                tflat = np.clip(tgt, 0, None) @ gstr
                lcol = np.where(ok, gset[np.clip(tflat, 0, N - 1)], -1)
                keep = lcol >= 0
                v = vals_np[t].reshape(-1)[gidx][keep]
                rows.append(np.arange(len(gidx))[keep])
                cols.append(lcol[keep])
                data.append(v)
            k = len(gidx)
            Ai = sp.csr_matrix((np.concatenate(data),
                                (np.concatenate(rows),
                                 np.concatenate(cols))), shape=(k, k))
            if neumann == "rowsum":
                d0 = np.asarray(Ai.diagonal())
                offsum = np.asarray(Ai.sum(axis=1)).ravel() - d0
                An = Ai - sp.diags(d0) - sp.diags(offsum)
            else:
                An = Ai
            X = sp.diags(chi)
            Bm = (X @ An @ X).tocsc()
            reg = 1e-10 * max(1.0, abs(An).max())
            An_r = (An + reg * sp.eye(k)).tocsc()
            B_r = (Bm + reg * sp.eye(k)).tocsc()
            kreq = min(nev, k - 2)
            try:
                w, v = spla.eigsh(An_r, k=kreq, M=B_r, sigma=0.0,
                                  which="LM")
            except Exception:
                import scipy.linalg as sla
                wd, vd = sla.eigh(An_r.toarray(), B_r.toarray())
                order = np.argsort(wd)[:kreq]
                w, v = wd[order], vd[:, order]
            vb = np.zeros((nev, m))
            for j in range(v.shape[1]):
                vb[j, lflat] = chi * v[:, j]
            basis_rows.append(vb)

        Zv = np.stack(basis_rows)                       # (nsub, nev, m)
        self.sub_idx = jnp.asarray(sub_idx, jnp.int32)
        self.sub_mask = jnp.asarray(sub_mask)
        self.Zv = jnp.asarray(Zv)
        self.ncoarse = nsub * nev

        # batched local ILU: boxes stacked on an extra slowest axis
        st_dims = tuple(reversed(box)) + (nsub,)        # dim0 fastest
        st_offsets = np.concatenate(
            [offsets, np.zeros((ntaps, 1), offsets.dtype)], axis=1)
        st_mask = jnp.asarray((sub_mask == 0).reshape(-1))
        st_ell = EllMatrix(st_dims, ell.k, st_offsets,
                           jnp.asarray(sub_vals), st_mask)
        self._ilu = EllILU0(st_ell, sweeps=sweeps, tri_iters=tri_iters)

        # coarse matrix A0 = Z^T A Z via the device ELL apply
        cols = []
        for i in range(nsub):
            for j in range(nev):
                z = np.zeros(N)
                z[np.asarray(sub_idx[i])] += np.asarray(
                    Zv[i, j]) * np.asarray(sub_mask[i])
                cols.append(z)
        Zfull_cols = [np.asarray(ell(jnp.asarray(c))) for c in cols]
        A0 = np.zeros((self.ncoarse, self.ncoarse))
        for a, za in enumerate(cols):
            for b, Azb in enumerate(Zfull_cols):
                A0[a, b] = float(np.dot(za, Azb))
        import scipy.linalg as sla
        lu0, piv0 = sla.lu_factor(A0 + 1e-12 * np.eye(self.ncoarse))
        self._coarse = (jnp.asarray(lu0), jnp.asarray(piv0.astype(np.int32)))
        self._apply = jax.jit(self._apply_impl)

    def _apply_impl(self, r):
        # coarse correction: Z A0^{-1} Z^T r (subdomain-sparse Z)
        r_loc = r[self.sub_idx] * self.sub_mask          # (nsub, m)
        rc = jnp.einsum("sjm,sm->sj", self.Zv, r_loc).reshape(-1)
        zc = jax.scipy.linalg.lu_solve(self._coarse, rc[:, None])[:, 0]
        zc2 = zc.reshape(self.Zv.shape[0], self.Zv.shape[1])
        z_loc_c = jnp.einsum("sjm,sj->sm", self.Zv, zc2) * self.sub_mask
        z = jnp.zeros_like(r).at[self.sub_idx.reshape(-1)].add(
            z_loc_c.reshape(-1))
        # local ILU solves, batched over the stacked-box lattice
        z_ilu = self._ilu(r_loc.reshape(-1))
        z_ilu = z_ilu.reshape(r_loc.shape) * self.sub_mask
        z = z.at[self.sub_idx.reshape(-1)].add(z_ilu.reshape(-1))
        return z

    def __call__(self, r):
        return self._apply(r)


def _gen_eigh_smallest(A, B, nev):
    """Smallest-eigenpair solutions of A v = lambda B v (dense; the
    arpackpp_geneo.hh analog)."""
    import scipy.linalg as sla
    w, v = sla.eigh(A, B + 1e-12 * np.eye(len(B)))
    order = np.argsort(w)[:nev]
    return w[order], v[:, order]


def geneo_preconditioner_for(go, x_lin=None, nsub=4, overlap=None, nev=3,
                             time=0.0, boxes=None, method="dense"):
    """Assemble the operator and build GenEO for a GridOperator.

    Preferred path (lattice Qk spaces): sparse lattice-ELL assembly
    (O(N*taps) memory) + overlapping BOX subdomains with a product-hat PU —
    scales to large N with bounded subdomain size. `boxes` = per-axis
    subdomain counts (slowest axis first); default splits the slowest axis
    into `nsub`. Falls back to dense assembly + 1D index slabs when the
    space has no lattice structure."""
    import numpy as np
    x_lin = x_lin if x_lin is not None else jnp.zeros(go.space.ndofs)
    try:
        from dune_pdelab_tpu.assembly.ell import assemble_ell, ell_to_csr
        ell = assemble_ell(go, x_lin, time)
    except Exception:
        ell = None
    if ell is not None:
        grid_shape = ell.grid_shape
        if boxes is None:
            boxes = (nsub,) + (1,) * (len(grid_shape) - 1)
        if overlap is None:
            overlap = max(1, grid_shape[0] // max(boxes[0], 1) // 4)
        if method == "ilu":
            return GenEOLatticePreconditioner(ell, boxes, overlap=overlap,
                                              nev=nev)
        A = ell_to_csr(ell)
        subs = lattice_box_subdomains(grid_shape, boxes, overlap)
        return GenEOPreconditioner(A, nev=nev, subdomains=subs)
    # general sparse fallback: keep the global operator sparse (CSR) —
    # only the bounded-size (m, m) subdomain blocks are ever materialized
    # (the reference's per-rank model: geneobasis.hh local problems)
    import scipy.sparse as sp
    Abcoo = go.jacobian(x_lin, time)
    A = sp.coo_matrix(
        (np.asarray(Abcoo.data), np.asarray(Abcoo.indices).T),
        shape=Abcoo.shape).tocsr()
    N = A.shape[0]
    if N % nsub:
        raise ValueError(f"ndofs {N} not divisible by nsub {nsub}")
    overlap = overlap if overlap is not None else max(1, N // nsub // 8)
    return GenEOPreconditioner(A, nsub, overlap, nev=nev)
