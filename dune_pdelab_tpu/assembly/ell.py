"""Assembled lattice-ELL Jacobian: per-row tap values + shift-MAC SpMV.

The TPU-native answer to the reference's assembled BCSR path (reference:
dune/pdelab/backend/istl/bcrspattern.hh:1-409 pattern construction,
bcrsmatrix.hh:1-278 storage). On a structured Qk lattice every DOF row
couples to at most (2k+1)^d neighbors at FIXED offsets, so instead of CSR
(row pointers + column indices + values — gather-based SpMV, hostile to the
VPU) the matrix is stored offset-keyed:

    A[i, i + off_t] = values[t][i]         (ELL with implicit column index)

and SpMV is `sum_t values[t] * shift(x, off_t)` — dense streaming
multiply-adds, no gathers. Unlike the compiled stencil (assembly/stencil.py)
this holds PER-ROW values, so it is exact for variable coefficients, any
linearization point, and boundary-modified rows — the general assembled
matrix, in the only layout the hardware likes.

Assembly is matrix-free probing with lattice coloring: color the DOF lattice
by coordinates mod (2k+1) per dim; two same-color columns never share a row,
so ONE jacobian_apply per color recovers its columns exactly —
(2k+1)^d = 27 (Q1 3d) / 125 (Q2 3d) jvp sweeps total, the analog of the
reference's one-sweep-per-color threaded assembly.

`pattern_stats` reports the nnz/bytes bookkeeping the reference's pattern
statistics expose (bcrspattern.hh).
"""
from __future__ import annotations

import itertools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


class EllMatrix:
    """y = mask ? z : A z with A stored as (ntaps, *grid) per-row values."""

    def __init__(self, dims, k, offsets, values, mask):
        self.dims = tuple(dims)              # dof lattice dims, dim0 fastest
        self.k = k
        self.offsets = np.asarray(offsets)   # (ntaps, dim) dim0 fastest
        self.values = values                 # (ntaps, *grid_shape) jnp array
        self.mask = mask                     # (N,) bool or None
        self.grid_shape = tuple(reversed(dims))
        # values/mask enter as jit ARGUMENTS, not captured constants: the
        # remote-compile relay ships captured constants in the compile
        # request, which breaks (broken pipe) at GB-scale value arrays
        self._apply = jax.jit(self._apply_impl)

    def _apply_impl(self, z, values, mask):
        k = self.k
        dim = len(self.dims)
        zf = jnp.where(mask, 0.0, z) if mask is not None else z
        grid = zf.reshape(self.grid_shape)
        gp = jnp.pad(grid, k)
        out = None
        for t in range(self.offsets.shape[0]):
            off = self.offsets[t]
            start = tuple(k + int(off[d]) for d in reversed(range(dim)))
            piece = lax.dynamic_slice(gp, start, grid.shape)
            term = values[t] * piece
            out = term if out is None else out + term
        y = out.reshape(-1)
        if mask is not None:
            y = jnp.where(mask, z, y)
        return y

    def __call__(self, z):
        return self._apply(z, self.values, self.mask)

    def pattern_stats(self):
        """Pattern statistics (reference: bcrspattern.hh bookkeeping)."""
        vals = np.asarray(self.values)
        N = int(np.prod(self.dims))
        nnz = int(np.count_nonzero(vals))
        stored = vals.size
        return {
            "rows": N,
            "taps": int(self.offsets.shape[0]),
            "stored_entries": stored,
            "nonzeros": nnz,
            "fill_ratio": nnz / max(stored, 1),
            "bytes": stored * vals.dtype.itemsize,
            "bytes_per_row": stored * vals.dtype.itemsize / max(N, 1),
        }


def assemble_ell(go, x_lin=None, time=0.0):
    """Assemble the (constrained) Jacobian of `go` at x_lin as an EllMatrix.

    Returns None when the space does not qualify (needs a single-leaf C0
    tensor Lagrange space on a structured mesh — the lattice-locality
    guarantee). Valid for variable coefficients and nonlinear operators
    (assembles the linearization at x_lin), unlike compile_stencil.
    """
    space = go.space
    if not getattr(space, "is_leaf", False):
        return None
    fem = space.fem
    mesh = space.mesh
    if fem.continuity != "C0" or not hasattr(fem, "_mi") or any(mesh.periodic):
        return None
    k = fem.degree
    dim = mesh.dim
    dims = space._dof_grid_dims
    grid_shape = tuple(reversed(dims))
    P = 2 * k + 1
    offsets = np.array(list(itertools.product(
        *[range(-k, k + 1)] * dim)))[:, ::-1]        # dim0 fastest
    ntaps = len(offsets)
    if x_lin is None:
        x_lin = jnp.zeros(space.ndofs)

    # one probe per lattice color: e_c = sum of unit vectors at points with
    # coords ≡ c (mod P); same-color columns never share a row
    grids = np.meshgrid(*[np.arange(n) % P for n in grid_shape],
                        indexing="ij")

    @jax.jit
    def probe(e):
        # full-f32 probing (TPU default matmul precision is bf16 operands)
        with jax.default_matmul_precision("highest"):
            return go.jacobian_apply(x_lin, e, time)

    values = np.zeros((ntaps,) + grid_shape)
    for color in itertools.product(*[range(min(P, n))
                                     for n in grid_shape]):
        sel = np.ones(grid_shape, bool)
        for a in range(dim):
            sel &= grids[a] == color[a]
        if not sel.any():
            continue
        e = jnp.asarray(sel.reshape(-1).astype(np.float64))
        col = np.asarray(probe(e)).reshape(grid_shape)
        # rows i with (i + off) of this color: strided sublattice per tap
        for t in range(ntaps):
            off_g = offsets[t][::-1]                 # grid-axis order
            start = [(color[a] - int(off_g[a])) % P for a in range(dim)]
            if any(start[a] >= grid_shape[a] for a in range(dim)):
                continue
            sl = tuple(slice(start[a], None, P) for a in range(dim))
            values[(t,) + sl] = col[sl]

    mask = go.cg.mask if go.cg is not None else None
    if mask is not None:
        # jacobian_apply returns z on constrained rows — those probe entries
        # are identity artifacts, not matrix values; zero them (the apply
        # re-imposes identity via the mask)
        mrows = np.asarray(go.cg.mask_np, bool).reshape(grid_shape)
        values[:, mrows] = 0.0
    return EllMatrix(dims, k, offsets, jnp.asarray(values), mask)


def assemble_ell_direct(go, x_lin=None, time=0.0, check=False):
    """ONE-SWEEP device-side lattice-ELL assembly — no colored probing.

    Computes per-element jacobian blocks by m = (k+1)^d jvp probes of
    alpha_volume on a lattice-native volume context whose element origins
    (and, for nonlinear operators, the local coefficient gather) are
    derived from `broadcasted_iota` INSIDE the jit — no element-sized
    constants enter the program. The colored-probing path
    (assemble_ell_device) runs (2k+1)^d full jacobian_apply sweeps whose
    jits bake (E, m) gather maps: ~76 s remote compiles per probe and
    HTTP-413 request-size failures at 2M+ elements. Here one jit does the
    whole build, and the local->global scatter is m^2 static strided adds
    (A[k c + mi_a, k c + mi_b] += J_e[a, b] becomes a step-k slice update
    per (a, b) pair) — exact for boundary rows, no edge fix-up.

    Applies to: leaf C0 tensor-nodal Qk spaces on uniform non-periodic
    meshes, volume-kernel jacobians (no face jacobian terms), Dirichlet
    (non-affine) constraints. Returns None otherwise.

    reference analog: the one-grid-sweep jacobian engine
    (dune/pdelab/gridoperator/default/jacobianengine.hh) with etadd
    Dirichlet elimination (gridoperator/common/assemblerutilities.hh:501)
    realized as row masks + masked apply.
    """
    from dune_pdelab_tpu.ops.base import VolumeContext

    space = go.space
    if not getattr(space, "is_leaf", False):
        return None
    fem, mesh = space.fem, space.mesh
    if (fem.continuity != "C0" or not hasattr(fem, "_mi")
            or not mesh.uniform or any(mesh.periodic)
            or not go.has["alpha_volume"]):
        return None
    if ((go.has["alpha_boundary"] and go.bnd_groups)
            or (go.has["alpha_skeleton"] and go.skel_groups)):
        return None                      # face jacobian terms: use probing
    if go.cg is not None and go.cg.has_affine:
        return None                      # affine constraints: use probing
    lop = go.lop.set_time(time)
    k = fem.degree
    dim = mesh.dim
    dims = space._dof_grid_dims
    grid_shape = tuple(reversed(dims))
    cells = mesh.cells
    cells_shape = tuple(reversed(cells))
    E = mesh.nelements
    m = fem.nbasis
    mi = np.asarray(fem._mi)             # (m, dim) local nodes, dim0 fastest
    if x_lin is None:
        x_lin = jnp.zeros(space.ndofs)
    dtype = x_lin.dtype

    offsets = np.array(list(itertools.product(
        *[range(-k, k + 1)] * dim)))[:, ::-1]            # dim0 fastest
    tap_of = {tuple(o): t for t, o in enumerate(offsets)}

    vg = go.vol_geo
    tabs = go._leaf_tabs(go._vol_tabs, dtype)
    qoff = np.asarray(vg.qp_phys_offset)                 # (nqp, dim)
    lower = np.asarray(mesh.lower, np.float64)
    h = np.asarray(mesh.h, np.float64)
    linear = bool(getattr(lop, "is_linear", False))
    strides = np.ones(dim, dtype=np.int64)
    for d in range(1, dim):
        strides[d] = strides[d - 1] * dims[d - 1]
    mask = go.cg.mask if go.cg is not None else None

    def _row_slices(a):
        """Dof-grid slices selecting rows k*c + mi[a] (grid-axis order)."""
        out = []
        for g in range(dim):
            d = dim - 1 - g                              # spatial dim
            start = int(mi[a][d])
            out.append(slice(start, start + k * (cells[d] - 1) + 1, k))
        return tuple(out)

    # cache the compiled build on the GridOperator: a fresh jit per call
    # would re-trace and re-compile every rebuild (Newton steps pay the
    # full remote-compile cost again — measured 65 s "warm" at 2M DOFs)
    cache = go.__dict__.setdefault("_ell_direct_cache", {})
    key = (jnp.dtype(dtype).name, float(time))
    if key in cache:
        ell = EllMatrix(dims, k, offsets, cache[key](x_lin), mask)
        if check:
            _ell_direct_check(go, ell, x_lin, time)
        return ell

    def _ctx_u0(x):
        coords = [lax.broadcasted_iota(jnp.int32, cells_shape, dim - 1 - d)
                  for d in range(dim)]                   # spatial-dim order
        orig = jnp.stack(
            [lower[d] + h[d] * coords[d].astype(dtype).reshape(-1)
             for d in range(dim)], axis=-1)              # (E, dim)
        xq = orig[:, None, :] + jnp.asarray(qoff, dtype)[None]
        ctx = VolumeContext(
            weights=jnp.asarray(vg.weights, dtype), x=xq,
            factor=jnp.asarray(vg.factor, dtype), tabs=tabs,
            jac_inv_T=jnp.asarray(vg.jac_inv_T, dtype),
            cell_volume=jnp.asarray(vg.cell_volume, dtype), time=time)
        if linear:
            u0 = jnp.zeros((E, m), dtype)
        else:
            cols_u = []
            for a in range(m):
                idx = jnp.zeros(cells_shape, jnp.int64)
                for d in range(dim):
                    idx = idx + (k * coords[d].astype(jnp.int64)
                                 + int(mi[a][d])) * int(strides[d])
                cols_u.append(x[idx.reshape(-1)])
            u0 = jnp.stack(cols_u, axis=-1)              # (E, m)
        return ctx, u0

    def _probe_b(V, x, b):
        ctx, u0 = _ctx_u0(x)
        f = lambda u: lop.alpha_volume(ctx, u)
        tangent = jnp.zeros((E, m), dtype).at[:, b].set(1.0)
        _, col = jax.jvp(f, (u0,), (tangent,))           # (E, m) = J[:, :, b]
        colg = col.reshape(cells_shape + (m,))
        for a in range(m):
            off = tuple(int(v) for v in (mi[b] - mi[a]))
            t = tap_of[off]
            V = V.at[(t,) + _row_slices(a)].add(colg[..., a])
        return V

    def _apply_masks(V):
        if mask is None:
            return V
        mg = mask.reshape(grid_shape)
        V = V * (1.0 - mg.astype(dtype))[None]           # rows
        # columns: zero taps whose target dof is constrained, so the
        # stored values match the probing path (which assembles the
        # symmetrically-eliminated P^T A P + I_c operator) exactly
        mp = jnp.pad(mg, k, constant_values=False)
        colm = []
        for t in range(len(offsets)):
            start = tuple(k + int(offsets[t][dim - 1 - g])
                          for g in range(dim))
            colm.append(lax.dynamic_slice(mp, start, grid_shape))
        return V * (1.0 - jnp.stack(colm).astype(dtype))

    if E <= 4_000_000:
        def build(x):
            V = jnp.zeros((len(offsets),) + grid_shape, dtype)
            for b in range(m):
                V = _probe_b(V, x, b)
            return _apply_masks(V)

        cache[key] = jax.jit(build)
    else:
        # large meshes: ONE program holding all m probes has crashed the
        # TPU compiler (SIGILL in the fusion cost model at 16.6M
        # elements); split into m per-probe jits + a mask jit — same
        # arithmetic, m small compiles, V donated between dispatches
        probes = [jax.jit(lambda V, x, b=b: _probe_b(V, x, b),
                          donate_argnums=0) for b in range(m)]
        mask_jit = jax.jit(_apply_masks, donate_argnums=0)

        def build(x):
            V = jnp.zeros((len(offsets),) + grid_shape, dtype)
            for p in probes:
                V = p(V, x)
            return mask_jit(V)

        cache[key] = build
    ell = EllMatrix(dims, k, offsets, cache[key](x_lin), mask)
    if check:
        _ell_direct_check(go, ell, x_lin, time)
    return ell


def _ell_direct_check(go, ell, x_lin, time):
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.standard_normal(go.space.ndofs), x_lin.dtype)
    y_ref = go.jacobian_apply(x_lin, z, time)
    err = float(jnp.max(jnp.abs(ell(z) - y_ref)))
    scale = float(jnp.max(jnp.abs(y_ref))) or 1.0
    if err > 1e-5 * scale:
        raise AssertionError(
            f"direct ELL parity failure: max err {err:.3e} "
            f"(scale {scale:.3e})")


def assemble_ell_device(go, x_lin=None, time=0.0):
    """Device-resident lattice-ELL assembly for large N.

    Same colored-probing algorithm as `assemble_ell` but everything stays
    on device: probes are generated from iota residue grids, stacked, and
    unscrambled into per-tap value planes with a fused select-accumulate
    (no host round-trips, no scatters). For row residue class r and tap
    offset `off`, the coupling A[i, i+off] of a class-r row i sits in the
    probe of column class (r + off) mod P — a bijection — and columns
    outside the domain read as exact zeros (no class-(r+off) column lies
    within the stencil range of row i), so no edge fix-up is needed.
    """
    space = go.space
    if not getattr(space, "is_leaf", False):
        return None
    fem = space.fem
    mesh = space.mesh
    if fem.continuity != "C0" or not hasattr(fem, "_mi") or any(mesh.periodic):
        return None
    k = fem.degree
    dim = mesh.dim
    dims = space._dof_grid_dims
    grid_shape = tuple(reversed(dims))
    P = 2 * k + 1
    offsets = np.array(list(itertools.product(
        *[range(-k, k + 1)] * dim)))[:, ::-1]        # dim0 fastest
    nt = len(offsets)
    if x_lin is None:
        x_lin = jnp.zeros(space.ndofs)
    dtype = x_lin.dtype
    classes = list(itertools.product(*[range(P)] * dim))  # grid-axis order

    def residue_grids():
        return [lax.broadcasted_iota(jnp.int32, grid_shape, a) % P
                for a in range(dim)]

    @jax.jit
    def probe_cls(cls_arr):
        rg = residue_grids()
        m = rg[0] == cls_arr[0]
        for a in range(1, dim):
            m = jnp.logical_and(m, rg[a] == cls_arr[a])
        e = m.astype(dtype).reshape(-1)
        # full-f32 probing (TPU default matmul precision is bf16 operands)
        with jax.default_matmul_precision("highest"):
            return go.jacobian_apply(x_lin, e, time)

    C = jnp.stack([probe_cls(jnp.asarray(cls, jnp.int32)).reshape(grid_shape)
                   for cls in classes])

    cls_index = {cls: i for i, cls in enumerate(classes)}
    mask = go.cg.mask if go.cg is not None else None

    @jax.jit
    def unscramble(C):
        # row r's tap-t value sits in probe class (r + off_t) % P: build
        # the linear class-index grid once per tap and gather — one
        # take_along_axis per tap instead of ncls masked adds (the
        # masked-add form emitted ncls*nt fused selects, whose remote
        # compile dominated the 16.8M-DOF assembly at ~100 s)
        rg = residue_grids()
        G = int(np.prod(grid_shape))
        Cf = C.reshape(len(classes), G)
        vals = []
        for t in range(nt):
            off_g = offsets[t][::-1]                 # grid-axis order
            cidx = jnp.zeros(grid_shape, jnp.int32)
            for a in range(dim):
                # classes = product(range(P)^dim): LAST tuple slot fastest
                cidx = cidx + ((rg[a] + int(off_g[a])) % P) * (
                    P ** (dim - 1 - a))
            got = jnp.take_along_axis(Cf, cidx.reshape(1, G), axis=0)
            vals.append(got.reshape(grid_shape))
        V = jnp.stack(vals)
        if mask is not None:
            V = V * (1.0 - mask.reshape(grid_shape).astype(dtype))[None]
        return V

    return EllMatrix(dims, k, offsets, unscramble(C), mask)


# -- Pallas tiled SpMV -------------------------------------------------------

def ell_to_csr(ell: EllMatrix):
    """Convert to scipy.sparse CSR (host-side consumers: GenEO subdomain
    extraction, direct solvers, inspection). Masked (Dirichlet) rows become
    identity rows."""
    import scipy.sparse as sp

    dims = ell.dims
    dim = len(dims)
    N = int(np.prod(dims))
    grid_shape = ell.grid_shape
    vals = np.asarray(ell.values)
    strides = np.ones(dim, dtype=np.int64)
    for d in range(1, dim):
        strides[d] = strides[d - 1] * dims[d - 1]
    rows_parts, cols_parts, data_parts = [], [], []
    mask = (np.asarray(ell.mask).reshape(-1) if ell.mask is not None
            else np.zeros(N, bool))
    # lattice multi-index of every row, grid-axis order reversed to dim0
    g = np.arange(N, dtype=np.int64)
    mi = np.empty((N, dim), dtype=np.int64)
    for d in range(dim):
        mi[:, d] = g % dims[d]
        g = g // dims[d]
    for t in range(ell.offsets.shape[0]):
        off = ell.offsets[t]
        tgt = mi + off[None, :]
        valid = np.all((tgt >= 0) & (tgt < np.asarray(dims)[None, :]), axis=1)
        valid &= ~mask
        v = vals[t].reshape(-1)
        valid &= v != 0.0
        rows_parts.append(np.nonzero(valid)[0])
        cols_parts.append((tgt[valid] * strides[None, :]).sum(axis=1))
        data_parts.append(v[valid])
    # identity on masked rows
    mrows = np.nonzero(mask)[0]
    rows_parts.append(mrows)
    cols_parts.append(mrows)
    data_parts.append(np.ones(len(mrows)))
    A = sp.csr_matrix(
        (np.concatenate(data_parts),
         (np.concatenate(rows_parts), np.concatenate(cols_parts))),
        shape=(N, N))
    return A


def build_tiled_ell_apply(dims, offsets, values, row_block=128,
                          interpret=False):
    """Tiled Pallas lowering of the ELL SpMV for 3D k=1 lattices with
    lane-aligned nx (follows assembly/stencil_pallas_tile.py: rows = nz*ny,
    lanes = nx; z/y offsets -> sublane row offsets, x offsets -> lane rolls;
    the lane wrap only pollutes Dirichlet-masked boundary columns)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nx, ny, nz = int(dims[0]), int(dims[1]), int(dims[2])
    R = nz * ny
    H = ((ny + 1 + 7) // 8) * 8
    taps = []
    vals_list = []
    varr = np.asarray(values)
    for t in range(len(offsets)):
        dx, dy, dz = (int(offsets[t][0]), int(offsets[t][1]),
                      int(offsets[t][2]))
        if not np.any(varr[t]):
            continue
        taps.append((dz * ny + dy, dx))
        vals_list.append(varr[t].reshape(R, nx))
    nt = len(taps)
    RB = min(row_block, R)
    nblocks = -(-R // RB)
    R_pad = nblocks * RB
    total_rows = R_pad + 2 * H
    vals = np.zeros((nt, R_pad, nx), np.float32)
    for t in range(nt):
        vals[t, :R] = vals_list[t]
    vals = jnp.asarray(vals)

    def kernel(zp_ref, vals_ref, out_ref, scratch, sem):
        i = pl.program_id(0)
        dma = pltpu.make_async_copy(
            zp_ref.at[pl.ds(i * RB, RB + 2 * H), :], scratch, sem)
        dma.start()
        dma.wait()
        acc = None
        for t, (ro, dx) in enumerate(taps):
            seg = scratch[pl.ds(H + ro, RB), :]
            if dx != 0:
                seg = pltpu.roll(seg, (-dx) % nx, 1)
            term = vals_ref[t] * seg
            acc = term if acc is None else acc + term
        out_ref[:, :] = acc

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R_pad, nx), jnp.float32),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((nt, RB, nx), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RB, nx), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((RB + 2 * H, nx), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )

    @jax.jit
    def apply(z):
        grid = z.astype(jnp.float32).reshape(R, nx)
        zp = jnp.zeros((total_rows, nx), jnp.float32)
        zp = jax.lax.dynamic_update_slice(zp, grid, (H, 0))
        out = call(zp, vals)
        return out[:R].reshape(-1).astype(z.dtype)

    return apply


def try_pallas_tiled_ell(ell: EllMatrix, interpret=False, row_block=128):
    """Lower an EllMatrix (k=1, 3D, lane-aligned nx, all-Dirichlet boundary)
    to the tiled kernel with masked semantics; None if it does not qualify."""
    if ell.k != 1 or len(ell.dims) != 3:
        return None
    if ell.dims[0] % 128 != 0 and not interpret:
        return None
    if ell.mask is None:
        return None
    core = build_tiled_ell_apply(ell.dims, ell.offsets, ell.values,
                                 row_block=row_block, interpret=interpret)
    mask = ell.mask

    def apply(z):
        zf = jnp.where(mask, 0.0, z)
        y = core(zf)
        return jnp.where(mask, z, y)

    return jax.jit(apply)
