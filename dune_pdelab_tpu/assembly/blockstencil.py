"""Block-stencil compilation: translation-invariant DG operators as
shift-matmul kernels.

The DG counterpart of `assembly/stencil.py` (which compiles C0 Qk operators
into scalar shift-MACs): on a uniform structured mesh a linear
translation-invariant DG operator (SIPG/NIPG/IIPG convection-diffusion,
DG mass, ...) assembles into a BLOCK convolution over the element lattice —
every interior element row is the same set of (2*dim+1) nb-by-nb blocks
(volume + face coupling to each face neighbor). The apply is then

    out[e] = sum_taps  W_t @ z[e + off_t]      (one batched matmul per tap)

which is the fastest assembled form on TPU: the element axis streams
through the MXU with no gathers and no per-element intermediates. Boundary
elements differ from interior ones only through their boundary-face terms;
since face contributions are ADDITIVE, the difference is one diagonal
correction block per side, applied to the side's element slab (corners get
the sum of their sides' corrections — verified by a probe at compile time).

This is the TPU replacement for the reference's assembled BCRS path for DG
spaces (reference: dune/pdelab/backend/istl/bcrsmatrix.hh; the FastDG
blocked matrices of dune/pdelab/gridoperator/fastdg/): instead of N*nb*5
stored CSR blocks, the operator is (2*dim+1+2*dim) nb^2 numbers + shifts.
"""
from __future__ import annotations

import itertools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


class BlockStencilOperator:
    """y = block_stencil(z) on an element-lattice DG layout."""

    def __init__(self, cells, nb, W_taps, offsets, dD_sides, dtype=None):
        self.cells = tuple(cells)        # element lattice dims, dim0 fastest
        self.nb = int(nb)
        self.W_taps = np.asarray(W_taps)       # (ntaps, nb, nb)
        self.offsets = np.asarray(offsets)     # (ntaps, dim)
        self.dD_sides = np.asarray(dD_sides)   # (dim, 2, nb, nb)
        self._apply = jax.jit(self._apply_impl)

    @property
    def ndofs(self):
        return int(np.prod(self.cells)) * self.nb

    def _conv_kernel(self):
        """(nb_out, nb_in, 3, ..., 3) cross-correlation kernel: spatial
        index (i_d + 1) along dim d holds tap W for offset i_d."""
        dim = len(self.cells)
        K = np.zeros((self.nb, self.nb) + (3,) * dim)
        for t, off in enumerate(self.offsets):
            # conv spatial dims follow the grid's C-order (slowest dim
            # first): spatial axis s corresponds to mesh dim (dim-1-s)
            idx = tuple(int(off[dim - 1 - s]) + 1 for s in range(dim))
            K[(slice(None), slice(None)) + idx] = self.W_taps[t]
        return K

    def _apply_impl(self, z):
        cells = self.cells
        dim = len(cells)
        nb = self.nb
        grid_rev = tuple(reversed(cells))               # C-order spatial dims
        zb = z.reshape(grid_rev + (nb,))
        # the tap pass IS a multi-channel cross-correlation: channels = the
        # nb local DG modes, 3^dim spatial kernel of block weights — the
        # form XLA lowers straight onto the MXU (NCHW / NCDHW layout)
        zc = jnp.moveaxis(zb, -1, 0)[None]              # (1, nb, *grid_rev)
        K = jnp.asarray(self._conv_kernel(), z.dtype)
        dn = lax.conv_dimension_numbers(
            zc.shape, K.shape,
            ("NCHW", "OIHW", "NCHW") if dim == 2 else
            ("NCDHW", "OIDHW", "NCDHW") if dim == 3 else
            ("NCW", "OIW", "NCW"))
        # precision=HIGHEST: TPU convs default to bf16 operands, and
        # bf16-rounding the assembled weights is an O(1e-3) operator
        # perturbation — fatal at SIPG condition numbers (a CG solve
        # against the bf16 conv converged to a 60%-wrong solution)
        out_c = lax.conv_general_dilated(
            zc, K, window_strides=(1,) * dim, padding="SAME",
            dimension_numbers=dn, precision=lax.Precision.HIGHEST)
        out = jnp.moveaxis(out_c[0], 0, -1)             # (*grid_rev, nb)
        # boundary corrections: one diagonal block per side, additive
        dD = jnp.asarray(self.dD_sides, z.dtype)
        for d in range(dim):
            ax = dim - 1 - d                            # C-order axis of dim d
            for side in (0, 1):
                sl = [slice(None)] * (dim + 1)
                sl[ax] = slice(0, 1) if side == 0 else slice(-1, None)
                sl = tuple(sl)
                corr = jnp.einsum("...b,ab->...a", zb[sl], dD[d, side], precision="highest")
                out = out.at[sl].add(corr)
        return out.reshape(-1)

    def __call__(self, z):
        return self._apply(z)

    def diagonal(self, dtype=None):
        """Exact operator diagonal, assembled from the tap data alone:
        diag(W0) per element plus the per-side dD boundary diagonals —
        O(nb) host data, so the jit ships no element-sized constants
        (unlike probing via go.jacobian_diagonal, whose scatter maps
        exceed remote-compile request limits at ~1M elements)."""
        dim = len(self.cells)
        t0 = int(np.nonzero(~np.any(self.offsets, axis=1))[0][0])
        d0 = np.diag(self.W_taps[t0]).copy()            # (nb,)
        grid_rev = tuple(reversed(self.cells))
        dt = jnp.dtype(dtype or jnp.float32)
        diag = jnp.broadcast_to(jnp.asarray(d0, dt),
                                grid_rev + (self.nb,))
        for d in range(dim):
            ax = dim - 1 - d
            for side in (0, 1):
                sl = [slice(None)] * (dim + 1)
                sl[ax] = slice(0, 1) if side == 0 else slice(-1, None)
                corr = jnp.asarray(np.diag(self.dD_sides[d, side]), dt)
                diag = diag.at[tuple(sl)].add(corr)
        return diag.reshape(-1)


def _dg_layout_ok(space):
    fem = space.fem
    mesh = space.mesh
    return (getattr(space, "is_leaf", False)
            and fem.continuity == "DG"
            and mesh.geometry_type == "cube"
            and mesh.uniform
            and not any(mesh.periodic))


def compile_block_stencil(go, x_lin=None, time=0.0, check=True):
    """Build a BlockStencilOperator equivalent to go.jacobian_apply.

    Returns None when the operator/space does not qualify (needs a
    single-leaf DG space on a uniform non-periodic cube mesh, a linear
    x-independent local operator, and no Dirichlet-constrained DOFs —
    DG boundary conditions are weak)."""
    space = go.space
    if not _dg_layout_ok(space):
        return None
    if not getattr(go.lop, "is_linear", False):
        return None
    if go.cg is not None and go.cg.nconstrained > 0:
        return None
    mesh = space.mesh
    dim = mesh.dim
    nb = space.fem.nbasis
    cells = tuple(mesh.cells)
    if any(c < 5 for c in cells):
        return None

    # huge meshes: probe a proxy mesh with the same spacing (translation
    # invariance makes the blocks identical; see stencil.py). Requires
    # spatially constant Jacobian coefficients — the proxy only sees a
    # corner patch of the domain.
    from dune_pdelab_tpu.assembly.stencil import (
        _coefficients_spatially_constant, _global_stencil_parity,
    )
    if (mesh.nelements > 200_000 and x_lin is None
            and _coefficients_spatially_constant(go.lop, mesh)):
        from dune_pdelab_tpu.assembly.gridoperator import GridOperator
        from dune_pdelab_tpu.space.space import FunctionSpace
        pc = (6,) * dim
        mesh_p = type(mesh)(mesh.lower,
                            mesh.lower + np.array(pc) * mesh.h, pc)
        V_p = FunctionSpace(mesh_p, space.fem)
        go_p = GridOperator(V_p, go.lop, quad_order=go.qorder)
        st_p = compile_block_stencil(go_p, None, time, check)
        if st_p is None:
            return None
        return BlockStencilOperator(cells, nb, st_p.W_taps, st_p.offsets,
                                    st_p.dD_sides)

    if x_lin is None:
        x_lin = jnp.zeros(space.ndofs)

    strides = np.ones(dim, dtype=np.int64)
    for d in range(1, dim):
        strides[d] = strides[d - 1] * cells[d - 1]

    def eidx(g):
        return int(np.dot(g, strides))

    def column_blocks(e_mi, rows):
        """Probe all nb columns of element e_mi; return {row_e: (nb, nb)}
        with block[i, j] = J[(row_e, i), (e_mi, j)]. Probing runs at full
        f32 matmul precision: the TPU default is bf16 operands, and probe
        error becomes OPERATOR error (measured 3.5e-3 relative on an
        anisotropic mesh before this guard)."""
        blocks = {r: np.zeros((nb, nb)) for r in rows}
        with jax.default_matmul_precision("highest"):
            for j in range(nb):
                e = jnp.zeros(space.ndofs).at[eidx(e_mi) * nb + j].set(1.0)
                col = np.asarray(go.jacobian_apply(x_lin, e, time))
                for r in rows:
                    blocks[r][:, j] = col[r * nb:(r + 1) * nb]
        return blocks

    # interior probe: center element far from every boundary
    c_mi = np.array([2] * dim)
    offsets = [np.zeros(dim, dtype=np.int64)]
    for d in range(dim):
        for s in (-1, 1):
            off = np.zeros(dim, dtype=np.int64)
            off[d] = s
            offsets.append(off)
    offsets = np.array(offsets)
    rows = [eidx(c_mi - off) for off in offsets]
    blocks = column_blocks(c_mi, rows)
    W_taps = np.stack([blocks[eidx(c_mi - off)] for off in offsets])
    D_int = W_taps[0]

    # per-side diagonal corrections: probe a mid-side element
    dD = np.zeros((dim, 2, nb, nb))
    for d in range(dim):
        for si, s in enumerate((0, 1)):
            m = np.array([2] * dim)
            m[d] = 0 if s == 0 else cells[d] - 1
            b = column_blocks(m, [eidx(m)])
            dD[d, si] = b[eidx(m)] - D_int

    if check:
        # translation invariance: interior diagonal at a shifted element
        c2 = c_mi + 1
        b2 = column_blocks(c2, [eidx(c2)])
        if not np.allclose(b2[eidx(c2)], D_int, atol=1e-9):
            return None
        # corner additivity: D_corner == D_int + sum of side corrections
        corner = np.zeros(dim, dtype=np.int64)
        bc = column_blocks(corner, [eidx(corner)])
        expect = D_int + sum(dD[d, 0] for d in range(dim))
        if not np.allclose(bc[eidx(corner)], expect, atol=1e-9):
            return None

    st = BlockStencilOperator(cells, nb, W_taps, offsets, dD)
    if check and not _global_stencil_parity(go, st, x_lin, time):
        # probe-local checks pass for operators that are translation
        # invariant near the probes only (e.g. a central coefficient
        # inclusion) — the whole-domain random-vector check is decisive
        return None
    return st


class BlockEllMatrix:
    """Assembled DG operator with per-element block taps: the
    variable-coefficient generalization of BlockStencilOperator (and the
    DG counterpart of the lattice-ELL matrix, assembly/ell.py):

        A[(e, a), (e + off_t, b)] = values[t][e, a, b]

    SpMV = sum_t einsum over the element lattice with shifted operands —
    batched (E, nb) x (E, nb, nb) contractions, no gathers."""

    def __init__(self, cells, nb, offsets, values):
        self.cells = tuple(cells)            # element lattice, dim0 fastest
        self.nb = int(nb)
        self.offsets = np.asarray(offsets)   # (ntaps, dim)
        self.values = values                 # (ntaps, *grid_rev, nb, nb) jnp
        # values as jit argument (GB-scale captured constants break the
        # remote-compile relay)
        self._apply = jax.jit(self._apply_impl)

    @property
    def ndofs(self):
        return int(np.prod(self.cells)) * self.nb

    def _apply_impl(self, z, values):
        cells = self.cells
        dim = len(cells)
        grid_rev = tuple(reversed(cells))
        zb = z.reshape(grid_rev + (self.nb,))
        pad = [(1, 1)] * dim + [(0, 0)]
        gp = jnp.pad(zb, pad)
        out = None
        V = values.astype(z.dtype)
        for t, off in enumerate(self.offsets):
            start = tuple(1 + int(off[d]) for d in reversed(range(dim)))
            piece = lax.dynamic_slice(gp, start + (0,),
                                      grid_rev + (self.nb,))
            term = jnp.einsum("...ab,...b->...a", V[t], piece, precision="highest")
            out = term if out is None else out + term
        return out.reshape(-1)

    def __call__(self, z):
        return self._apply(z, self.values)

    def pattern_stats(self):
        E = int(np.prod(self.cells))
        ntaps = len(self.offsets)
        nnz = E * ntaps * self.nb * self.nb
        return {"rows": E * self.nb, "ntaps": ntaps, "block": self.nb,
                "nnz_stored": nnz,
                "bytes_values": int(np.asarray(self.values).nbytes)}


def assemble_block_ell(go, x_lin=None, time=0.0):
    """Assemble go's Jacobian at x_lin as a BlockEllMatrix.

    Valid for variable coefficients and nonlinear operators (linearization
    at x_lin), unlike compile_block_stencil. Probing uses element coloring
    (coords mod 3 per dim: face-coupled columns never share a row block),
    so assembly costs 3^dim * nb jacobian_apply sweeps. Returns None when
    the space does not qualify (single-leaf DG, cube mesh, non-periodic,
    no constrained DOFs)."""
    space = go.space
    if not _dg_layout_ok(space):
        return None
    if go.cg is not None and go.cg.nconstrained > 0:
        return None
    mesh = space.mesh
    dim = mesh.dim
    nb = space.fem.nbasis
    cells = tuple(mesh.cells)
    grid_rev = tuple(reversed(cells))
    E = mesh.nelements
    if x_lin is None:
        x_lin = jnp.zeros(space.ndofs)

    offsets = [np.zeros(dim, dtype=np.int64)]
    for d in range(dim):
        for s in (-1, 1):
            off = np.zeros(dim, dtype=np.int64)
            off[d] = s
            offsets.append(off)
    offsets = np.array(offsets)
    ntaps = len(offsets)

    emi = np.stack(np.meshgrid(*[np.arange(n) % 3 for n in grid_rev],
                               indexing="ij"), axis=0)   # (dim, *grid_rev)

    # full-f32 probing (TPU default matmul precision is bf16 operands;
    # probe error becomes assembled-operator error)
    @jax.jit
    def probe(e):
        with jax.default_matmul_precision("highest"):
            return go.jacobian_apply(x_lin, e, time)

    values = np.zeros((ntaps,) + grid_rev + (nb, nb))
    for color in itertools.product(*[range(min(3, n)) for n in grid_rev]):
        sel = np.ones(grid_rev, bool)
        for a in range(dim):
            sel &= emi[a] == color[a]
        if not sel.any():
            continue
        for j in range(nb):
            e = np.zeros(grid_rev + (nb,))
            e[sel, j] = 1.0
            col = np.asarray(probe(jnp.asarray(e.reshape(-1))))
            col = col.reshape(grid_rev + (nb,))
            for t in range(ntaps):
                off_g = offsets[t][::-1]                 # grid-axis order
                start = [(color[a] - int(off_g[a])) % 3
                         for a in range(dim)]
                if any(start[a] >= grid_rev[a] for a in range(dim)):
                    continue
                sl = tuple(slice(start[a], None, 3) for a in range(dim))
                values[(t,) + sl + (slice(None), j)] = col[sl]
    return BlockEllMatrix(cells, nb, offsets, jnp.asarray(values))
