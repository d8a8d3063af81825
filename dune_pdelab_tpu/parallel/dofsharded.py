"""DOF-sharded stencil operator: slab decomposition + ppermute halo exchange.

The element-sharded path (parallel/sharded.py) keeps DOF vectors replicated —
fine for compute scaling, but HBM per chip still holds the full state. This
module shards the DOF lattice itself in slabs along the slowest axis over a
1D device mesh and exchanges one halo plane per operator application with
`lax.ppermute` — the TPU analog of the reference's nonoverlapping
matrix-consistency scheme (reference: dune/pdelab/backend/istl/
novlpistlsolverbackend.hh:96 SpMV + border add-exchange): coupling is
face-local, so one nearest-neighbor permute per apply is the entire
communication, riding ICI on a torus.

Krylov vector arithmetic and dot products run on the sharded arrays under
jit — XLA inserts the psum for reductions (the OverlappingScalarProduct
analog, reference: ovlpistlsolverbackend.hh:104-116).

Currently lowers compiled StencilOperators with k = 1 (single residue
class); the boundary-halo planes received as zeros are exact because every
lattice boundary row is Dirichlet-masked (same validity condition as the
stencil itself).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class DofShardedStencil:
    """Sharded y = mask ? z : stencil(z); vectors live sharded in slabs."""

    def __init__(self, stencil_op, devices=None, axis_name="zslab"):
        if stencil_op.k != 1 or stencil_op.weights.shape[0] != 1:
            raise NotImplementedError("DOF-sharded stencil needs k == 1")
        if stencil_op.mask is None:
            raise NotImplementedError("requires all-Dirichlet boundary mask")
        self.st = stencil_op
        devices = devices if devices is not None else jax.devices()
        self.ndev = len(devices)
        dims = stencil_op.dims          # dim0 fastest
        self.dims = dims
        nz = dims[-1]
        if nz % self.ndev:
            raise ValueError(f"slowest-axis dim {nz} not divisible by "
                             f"{self.ndev} devices")
        self.axis_name = axis_name
        self.device_mesh = Mesh(np.asarray(devices), (axis_name,))
        self.sharding = NamedSharding(self.device_mesh, P(axis_name))
        self.grid_shape = tuple(reversed(dims))      # (nz, ..., nx)
        dim = len(dims)
        # taps grouped by z-offset for the extended local slab
        w = stencil_op.weights[0]
        offs = stencil_op.offsets                    # (ntaps, dim) dim0 fastest
        self.taps = [(int(offs[t, dim - 1]),         # z offset
                      tuple(int(offs[t, d]) for d in reversed(range(dim - 1))),
                      float(w[t]))
                     for t in range(len(offs)) if w[t] != 0.0]
        self._apply = jax.jit(self._apply_impl)

    def device_put(self, x):
        return jax.device_put(x, self.sharding)

    def _local_kernel(self, zloc):
        """zloc: (nz_loc, ny, nx) local slab -> stencil on owned planes."""
        ax = self.axis_name
        nd = self.ndev
        fwd = [(i, i + 1) for i in range(nd - 1)]
        bwd = [(i + 1, i) for i in range(nd - 1)]
        # halo planes (devices at the chain ends receive zeros — exact,
        # because global edge planes are Dirichlet rows)
        prev_plane = lax.ppermute(zloc[-1:], ax, fwd)
        next_plane = lax.ppermute(zloc[:1], ax, bwd)
        ext = jnp.concatenate([prev_plane, zloc, next_plane], axis=0)
        # pad tangential dims by 1 for the in-plane shifts
        dim = len(self.grid_shape)
        pad_width = [(0, 0)] + [(1, 1)] * (dim - 1)
        extp = jnp.pad(ext, pad_width)
        nz_loc = zloc.shape[0]
        out = None
        for dz, dtang, w in self.taps:
            start = (1 + dz,) + tuple(1 + o for o in dtang)
            piece = lax.dynamic_slice(extp, start, zloc.shape)
            out = w * piece if out is None else out + w * piece
        return out

    def _apply_impl(self, z):
        st = self.st
        zf = jnp.where(st.mask, 0.0, z)
        grid = zf.reshape(self.grid_shape)
        y = jax.shard_map(
            self._local_kernel,
            mesh=self.device_mesh,
            in_specs=P(self.axis_name),
            out_specs=P(self.axis_name),
        )(grid)
        y = y.reshape(-1)
        return jnp.where(st.mask, z, y)

    def __call__(self, z):
        return self._apply(z)


def sharded_cg_solve(sharded_op: DofShardedStencil, b, diag=None, tol=1e-10,
                     maxiter=5000):
    """CG on sharded vectors; XLA inserts the collectives for the dots."""
    from dune_pdelab_tpu.linalg.krylov import cg

    b = sharded_op.device_put(b)
    M = (lambda r: r / diag) if diag is not None else (lambda r: r)
    if diag is not None:
        diag = sharded_op.device_put(diag)

    @jax.jit
    def run(b):
        return cg(sharded_op._apply_impl, b, M=M, tol=tol, maxiter=maxiter)

    return run(b)
