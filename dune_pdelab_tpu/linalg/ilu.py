"""ILU(0) and ILU(n) on the lattice-ELL pattern: fine-grained parallel
factorization.

TPU-native replacement for the reference's sequential ILU0/ILUn smoothers
(reference: dune/pdelab/backend/istl/seqistlsolverbackend.hh ILU0/ILUn rows
in the 27 preassembled combos). A sequential triangular sweep does not map
to the VPU, so this module uses the two standard fine-grained-parallel
reformulations (Chow & Patel, "Fine-grained parallel incomplete LU
factorization", SISC 2015; public method, reimplemented here for the ELL
lattice layout):

  * factorization: the ILU0 fixed-point equations are iterated Jacobi-style.
    On the offset-keyed ELL lattice every inner sum over k collapses to a
    STATIC set of offset pairs (o1, o2) with o1 + o2 = o — each term is one
    shifted elementwise product of tap-value arrays, so a sweep is a few
    dozen shift-MACs over the lattice, no gathers;
  * application: the triangular solves L z = r (unit lower) and U y = z are
    replaced by truncated Jacobi iterations x <- r - L_strict x and
    y <- D^{-1}(z - U_strict y) — again pure shift-MACs.

Dirichlet-masked rows are treated as identity rows (diag 1, no coupling),
so the preconditioner acts as the identity there, matching the constrained
operator semantics.

ILU(n): on a translation-invariant lattice pattern the symbolic level-of-fill
phase (ISTL's ILUn fill computation) collapses to offset arithmetic — a fill
entry at offset o = o1 + o2 created from entries at levels l1, l2 gets level
l1 + l2 + 1, minimized over decompositions; taps with level <= n join the
pattern with initial value 0 and the same fixed-point sweeps factorize the
extended pattern.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def _flat_shift(off, dims):
    s = 0
    stride = 1
    for d in range(len(dims)):
        s += int(off[d]) * stride
        stride *= dims[d]
    return s


def _fill_levels(offs, level):
    """Symbolic level-of-fill on a translation-invariant offset pattern.

    Returns the extended offset list (original offsets first, in order) and
    nothing else — levels only matter for membership. Fill offset o1 + o2
    from levels l1, l2 gets level l1 + l2 + 1 (minimized over paths), kept
    when <= `level` (the standard ILU(p) rule specialized to a lattice)."""
    lev = {tuple(int(c) for c in o): 0 for o in offs}
    for _ in range(level):
        items = list(lev.items())
        for o1, l1 in items:
            for o2, l2 in items:
                o = tuple(a + b for a, b in zip(o1, o2))
                l = l1 + l2 + 1
                if l <= level and lev.get(o, level + 1) > l:
                    lev[o] = l
    fill = sorted(o for o, l in lev.items() if l > 0)
    return [tuple(int(c) for c in o) for o in offs] + fill


class EllILU0:
    """ILU(level) preconditioner for an EllMatrix; callable r -> z ~= A^{-1} r.

    level=0 is the classic ILU(0) (pattern = matrix pattern); level>=1
    extends the pattern by lattice fill offsets (`_fill_levels`)."""

    def __init__(self, ell, sweeps: int = 4, tri_iters: int = 3,
                 level: int = 0):
        self.ell = ell
        self.sweeps = sweeps
        self.tri_iters = tri_iters
        self.level = level
        dims = ell.dims
        dim = len(dims)
        self.grid_shape = tuple(reversed(dims))
        offs = np.asarray(ell.offsets)                  # (ntaps, dim)
        n0 = len(offs)
        if level > 0:
            offs = np.asarray(_fill_levels(offs, level))
        shifts = np.array([_flat_shift(o, dims) for o in offs])
        self.k = max(int(ell.k), int(np.abs(offs).max()))
        ntaps = len(offs)
        self.diag_t = int(np.nonzero(shifts == 0)[0][0])
        self.lower = [t for t in range(ntaps) if shifts[t] < 0]
        self.upper = [t for t in range(ntaps) if shifts[t] > 0]
        # offset pairs per target tap: (t1 lower-ish, t2 upper) with
        # o1 + o2 = o_t; see module docstring for the k-range conditions
        key = {tuple(offs[t]): t for t in range(ntaps)}
        self.pairs = {}
        for t in range(ntaps):
            plist = []
            for t1 in range(ntaps):
                cond = (shifts[t1] < shifts[t]) if shifts[t] < 0 \
                    else (shifts[t1] < 0)
                if not cond:
                    continue
                o2 = tuple(offs[t] - offs[t1])
                t2 = key.get(o2)
                if t2 is not None and shifts[t2] > 0:
                    plist.append((t1, t2))
            self.pairs[t] = plist
        self.offs = offs
        # values with identity Dirichlet rows; fill taps start at 0
        vals0 = np.array(np.asarray(ell.values), dtype=np.float64, copy=True)
        vals = np.concatenate(
            [vals0, np.zeros((ntaps - n0,) + vals0.shape[1:])], axis=0)
        if ell.mask is not None:
            m = np.asarray(ell.mask).reshape(self.grid_shape)
            vals[:, m] = 0.0
            vals[self.diag_t][m] = 1.0
        # guard empty diagonals (padded/degenerate rows)
        dz = vals[self.diag_t] == 0.0
        vals[self.diag_t][dz] = 1.0
        # per-tap validity: (i, i+o) exists only when i+o is in the lattice
        valid = np.ones((ntaps,) + self.grid_shape)
        for t in range(ntaps):
            og = offs[t][::-1]                          # grid-axis order
            for a_ax in range(dim):
                n = self.grid_shape[a_ax]
                idx = np.arange(n) + int(og[a_ax])
                bad = (idx < 0) | (idx >= n)
                sl = [slice(None)] * dim
                sl[a_ax] = bad
                valid[(t,) + tuple(sl)] = 0.0
        self.valid = jnp.asarray(valid)
        self._factorize(jnp.asarray(vals))
        self._apply = jax.jit(self._apply_impl)

    # -- factorization --------------------------------------------------------
    def _shift(self, arr, off):
        """arr at lattice position i + off (zeros outside)."""
        k = self.k
        gp = jnp.pad(arr, k)
        dim = arr.ndim
        start = tuple(k + int(off[d]) for d in reversed(range(dim)))
        return lax.dynamic_slice(gp, start, arr.shape)

    def _factorize(self, a):
        offs = self.offs
        dt = self.diag_t
        vals = a

        def sweep(vals, _):
            new = []
            udiag = vals[dt]
            for t in range(vals.shape[0]):
                acc = a[t]
                for (t1, t2) in self.pairs[t]:
                    acc = acc - vals[t1] * self._shift(vals[t2], offs[t1])
                if t in self.lower:
                    acc = acc / self._shift_safe(udiag, offs[t])
                new.append(acc * self.valid[t])
            return jnp.stack(new), None

        vals, _ = lax.scan(sweep, vals, None, length=self.sweeps)
        self.L = [(t, offs[t]) for t in self.lower]
        self.U = [(t, offs[t]) for t in self.upper]
        self.vals = vals
        self.udiag = vals[dt]

    def _shift_safe(self, arr, off):
        s = self._shift(arr, off)
        return jnp.where(s == 0, 1.0, s)

    # -- application ----------------------------------------------------------
    def _tri_apply(self, taps, z):
        """sum_t vals[t] * z(i + o_t) over the given taps."""
        out = None
        for (t, off) in taps:
            term = self.vals[t] * self._shift(z, off)
            out = term if out is None else out + term
        return out if out is not None else jnp.zeros_like(z)

    def _apply_impl(self, r):
        rg = r.reshape(self.grid_shape)
        x = rg
        for _ in range(self.tri_iters):
            x = rg - self._tri_apply(self.L, x)
        y = x / self.udiag
        for _ in range(self.tri_iters):
            y = (x - self._tri_apply(self.U, y)) / self.udiag
        return y.reshape(-1)

    def __call__(self, r):
        return self._apply(r)


def ilu0_preconditioner(go, x_lin, time=0.0, sweeps=4, tri_iters=3, level=0):
    """LinearSolverBackend `precond` callable building EllILU0 from the
    assembled lattice-ELL Jacobian. Returns None-equivalent failure as a
    raised error when the space has no lattice structure."""
    from dune_pdelab_tpu.assembly.ell import assemble_ell

    ell = assemble_ell(go, x_lin, time)
    if ell is None:
        raise ValueError("ILU needs a lattice (single-leaf C0 Qk) space")
    return EllILU0(ell, sweeps=sweeps, tri_iters=tri_iters, level=level)


def ilun_preconditioner(level):
    """ILU(n) `precond` factory (ISTLBackend_*_ILUn analog): higher fill
    levels trade factorization/apply cost for stronger smoothing."""
    def make(go, x_lin, time=0.0, sweeps=None, tri_iters=None):
        # larger patterns need more fixed-point sweeps to converge the
        # factorization (Chow-Patel) and more truncated-triangular terms
        kw = {"level": level,
              "sweeps": sweeps if sweeps is not None else 4 + 2 * level,
              "tri_iters": tri_iters if tri_iters is not None else 3 + level}
        return ilu0_preconditioner(go, x_lin, time, **kw)
    return make
