"""DOF-sharded stencil operator: lattice decomposition + ppermute halo
exchange.

The element-sharded path (parallel/sharded.py) distributes assembly work;
this module shards the DOF lattice itself over a 1D or 2D device mesh and
exchanges k halo planes per sharded axis per operator application with
`lax.ppermute` — the TPU analog of the reference's nonoverlapping
matrix-consistency scheme (reference: dune/pdelab/backend/istl/
novlpistlsolverbackend.hh:96 SpMV + border add-exchange): coupling is
(2k+1)^d-local, so nearest-neighbor permutes per apply are the entire
communication, riding ICI on a torus.

Generality (round 2): any stencil order k >= 1 (Qk residue classes),
lattice dims that do not divide the device count (zero-padded at the top —
exact, because the sequential StencilOperator zero-pads beyond the lattice
too), and a 2D device mesh over the two slowest lattice axes with a
corner-correct two-stage halo exchange (z-halos first, then y-halos of the
z-extended block, which carries the corner values of diagonal neighbors).

Krylov vector arithmetic and dot products run on the sharded grid-shaped
arrays under jit — XLA inserts the psum for reductions (the
OverlappingScalarProduct analog, reference: ovlpistlsolverbackend.hh:104-116).
Padded lattice rows are fixed to zero by construction (zero input, output
masked), so they never perturb dots or axpys.
"""
from __future__ import annotations

import itertools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _ceil_to(n, m):
    return -(-n // m) * m


class DofShardedStencil:
    """Sharded y = mask ? z : stencil(z); vectors live as sharded lattices.

    Vectors are grid-shaped (slowest axis first) and zero-padded at the top
    of each sharded axis to a multiple of ndev_axis * k, sharded with
    NamedSharding over `mesh_shape` devices. Use device_put / gather to
    convert from/to flat (N,) DOF vectors.
    """

    def __init__(self, stencil_op, devices=None, mesh_shape=None,
                 axis_names=("sz", "sy"), padded_shape=None):
        st = stencil_op
        self.st = st
        devices = list(devices) if devices is not None else jax.devices()
        dims = st.dims                       # dim0 fastest
        dim = len(dims)
        k = st.k
        self.k = k
        if mesh_shape is None:
            mesh_shape = (len(devices),)
        if len(mesh_shape) not in (1, 2) or len(mesh_shape) > dim - (dim > 1):
            raise ValueError(f"unsupported device mesh shape {mesh_shape}")
        self.mesh_shape = tuple(mesh_shape)
        ndev = int(np.prod(mesh_shape))
        dev_arr = np.asarray(devices[:ndev]).reshape(mesh_shape)
        self.axis_names = axis_names[:len(mesh_shape)]
        self.device_mesh = Mesh(dev_arr, self.axis_names)

        # grid layout: slowest axis first (C order of the flat vector)
        self.grid_shape = tuple(reversed(dims))           # (nz, ..., nx)
        # pad each sharded axis (the first len(mesh_shape) grid axes) up to a
        # multiple of ndev_axis * k so every local block is class-aligned
        padded = list(self.grid_shape)
        for a, nd_a in enumerate(self.mesh_shape):
            padded[a] = _ceil_to(padded[a], nd_a * k)
        if padded_shape is not None:
            # caller-enforced padding (e.g. 2:1 level alignment in
            # parallel/gmg_sharded.py); must keep class alignment
            for a, nd_a in enumerate(self.mesh_shape):
                p = int(padded_shape[a])
                if p < padded[a] or p % (nd_a * k):
                    raise ValueError(
                        f"padded_shape[{a}]={p} not a feasible multiple "
                        f"of ndev*k={nd_a * k} covering {padded[a]}")
                padded[a] = p
        self.padded_shape = tuple(padded)
        self.pad_amount = tuple(p - g for p, g in
                                zip(self.padded_shape, self.grid_shape))

        spec = [None] * dim
        for a, name in enumerate(self.axis_names):
            spec[a] = name
        self.pspec = P(*spec)
        self.sharding = NamedSharding(self.device_mesh, self.pspec)

        # taps: (ntaps, dim) offsets dim0-fastest -> grid-axis order offsets
        self.offsets_grid = np.asarray(st.offsets)[:, ::-1]   # (ntaps, dim)
        self.weights = np.asarray(st.weights)                 # (nclass, ntaps)
        self.nclass = self.weights.shape[0]
        self.classes = (list(itertools.product(*[range(k)] * dim))
                        if self.nclass > 1 else [(0,) * dim])

        # masks in padded-lattice layout; padded rows are "constrained to 0"
        mask_np = (np.asarray(st.mask).reshape(self.grid_shape)
                   if st.mask is not None
                   else np.zeros(self.grid_shape, bool))
        pad_width = [(0, p) for p in self.pad_amount]
        self.mask_grid = jax.device_put(
            jnp.asarray(np.pad(mask_np, pad_width, constant_values=True)),
            self.sharding)
        self._apply = jax.jit(self._apply_impl)

    # -- flat <-> sharded lattice conversions -------------------------------
    def device_put(self, x_flat):
        g = np.asarray(x_flat).reshape(self.grid_shape)
        g = np.pad(g, [(0, p) for p in self.pad_amount])
        return jax.device_put(jnp.asarray(g), self.sharding)

    def gather(self, xg):
        g = np.asarray(jax.device_get(xg))
        sl = tuple(slice(0, n) for n in self.grid_shape)
        return g[sl].reshape(-1)

    def zeros(self):
        return jax.device_put(jnp.zeros(self.padded_shape), self.sharding)

    # -- halo exchange ------------------------------------------------------
    def _extend(self, loc):
        """Halo-extend the local block: ppermute k planes along each sharded
        axis (zeros at chain ends == the sequential operator's zero pad),
        zero-pad k on unsharded axes. y-halos are exchanged on the z-extended
        block so diagonal-neighbor corner values arrive correctly."""
        k = self.k
        ext = loc
        for a, (name, nd_a) in enumerate(zip(self.axis_names,
                                             self.mesh_shape)):
            if nd_a == 1:
                # single device along this axis: plain zero pad
                pw = [(0, 0)] * ext.ndim
                pw[a] = (k, k)
                ext = jnp.pad(ext, pw)
                continue
            fwd = [(i, i + 1) for i in range(nd_a - 1)]
            bwd = [(i + 1, i) for i in range(nd_a - 1)]
            take_lo = [slice(None)] * ext.ndim
            take_lo[a] = slice(ext.shape[a] - k, None)
            take_hi = [slice(None)] * ext.ndim
            take_hi[a] = slice(0, k)
            prev = lax.ppermute(ext[tuple(take_lo)], name, fwd)
            nxt = lax.ppermute(ext[tuple(take_hi)], name, bwd)
            ext = jnp.concatenate([prev, ext, nxt], axis=a)
        # unsharded axes: zero pad k
        pw = [(0, 0)] * ext.ndim
        for a in range(len(self.mesh_shape), ext.ndim):
            pw[a] = (k, k)
        return jnp.pad(ext, pw)

    # -- local stencil kernel -----------------------------------------------
    def _local_kernel(self, loc):
        k = self.k
        dim = loc.ndim
        ext = self._extend(loc)
        if self.nclass == 1:
            w = self.weights[0]
            out = None
            for t, off in enumerate(self.offsets_grid):
                if w[t] == 0.0:
                    continue
                start = tuple(k + int(off[a]) for a in range(dim))
                piece = lax.dynamic_slice(ext, start, loc.shape)
                out = w[t] * piece if out is None else out + w[t] * piece
            return out if out is not None else jnp.zeros_like(loc)
        # residue classes: strided sublattices (local block sizes are
        # multiples of k along sharded axes, so local class == global class)
        out = jnp.zeros_like(loc)
        for ci, cls in enumerate(self.classes):
            # classes are dim0-fastest tuples; grid axes are reversed
            cls_g = tuple(reversed(cls))
            w = self.weights[ci]
            sl = tuple(slice(cls_g[a], None, k) for a in range(dim))
            size = tuple(out[sl].shape)
            acc = None
            for t, off in enumerate(self.offsets_grid):
                if w[t] == 0.0:
                    continue
                start = tuple(k + cls_g[a] + int(off[a]) for a in range(dim))
                piece = lax.slice(
                    ext, start,
                    tuple(s + k * (n - 1) + 1 for s, n in zip(start, size)),
                    (k,) * dim)
                acc = w[t] * piece if acc is None else acc + w[t] * piece
            out = out.at[sl].set(acc if acc is not None else 0.0)
        return out

    def _apply_impl(self, zg):
        zf = jnp.where(self.mask_grid, 0.0, zg)
        y = jax.shard_map(
            self._local_kernel,
            mesh=self.device_mesh,
            in_specs=self.pspec,
            out_specs=self.pspec,
        )(zf)
        # identity on Dirichlet rows; padded rows carry z (zero by invariant)
        return jnp.where(self.mask_grid, zg, y)

    def __call__(self, zg):
        return self._apply(zg)


def sharded_cg_solve(sharded_op: DofShardedStencil, b, diag=None, tol=1e-10,
                     maxiter=5000, x0=None):
    """CG on sharded lattices; XLA inserts the collectives for the dots.

    b / diag are flat (N,) host-or-device vectors; the result is returned
    flat. Iteration counts match the sequential stencil CG exactly (padded
    rows are zero throughout and contribute nothing to any dot).
    """
    from dune_pdelab_tpu.linalg.krylov import cg

    bg = sharded_op.device_put(b)
    if diag is not None:
        # guard padded rows (diag pads are 0 after device_put): unit diag
        dg = sharded_op.device_put(diag)
        dg = jnp.where(sharded_op.mask_grid, 1.0, jnp.where(dg == 0, 1.0, dg))
        M = lambda r: r / dg
    else:
        M = lambda r: r

    @jax.jit
    def run(bg):
        return cg(sharded_op._apply_impl, bg, x0=x0, M=M, tol=tol,
                  maxiter=maxiter)

    xg, stats = run(bg)
    return sharded_op.gather(xg), stats
