"""Pallas TPU kernel for flat-shift stencil application.

The compiled stencil (assembly/stencil.py) applies ntaps shifted
multiply-accumulates over the DOF lattice. In flat-index space every lattice
offset is ONE flat shift (off_x + nx*off_y + nx*ny*off_z), so the operator is

    y[i] = sum_t w_t * z[i + s_t]

with static shifts s_t. This kernel streams the flat vector through VMEM in
chunks with a halo of max|s_t| on both sides and performs all taps on-chip —
one HBM read + one write per element (the speed-of-light form), instead of
XLA's per-tap grid traversals.

Only the single-residue-class case (k = 1 elements) is lowered here; other
cases fall back to the XLA shift implementation.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def build_flat_stencil_apply(n, shifts, weights, chunk=1 << 16,
                             interpret=False):
    """Returns a jitted fn z -> y for y[i] = sum_t w_t z[i+s_t] (zero-padded
    out-of-range reads). n = logical length; shifts/weights are static."""
    shifts = np.asarray(shifts, np.int64)
    weights = np.asarray(weights, np.float64)
    halo = int(np.max(np.abs(shifts)))
    halo_pad = _round_up(halo, 128)
    chunk = min(chunk, _round_up(n, 128))
    nchunks = -(-n // chunk)
    n_pad = nchunks * chunk
    # padded input layout: [halo_pad | n (zero-padded to n_pad) | halo_pad]
    total = n_pad + 2 * halo_pad
    win = chunk + 2 * halo_pad

    taps = [(int(s), float(w)) for s, w in zip(shifts, weights) if w != 0.0]

    # BlockSpec index maps work in units of the block shape; overlapping
    # halo windows need manual DMA from an ANY/HBM-resident input.
    def kernel_manual(zp_ref, out_ref, scratch, sem):
        i = pl.program_id(0)
        start = i * chunk
        dma = pltpu.make_async_copy(
            zp_ref.at[pl.ds(start, win)], scratch, sem)
        dma.start()
        dma.wait()
        acc = None
        for s, w in taps:
            seg = scratch[pl.ds(halo_pad + s, chunk)]
            acc = w * seg if acc is None else acc + w * seg
        out_ref[:] = acc

    call = pl.pallas_call(
        kernel_manual,
        out_shape=jax.ShapeDtypeStruct((n_pad,), jnp.float32),
        grid=(nchunks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((chunk,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((win,), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )

    @jax.jit
    def apply(z):
        zp = jnp.zeros(total, jnp.float32)
        zp = jax.lax.dynamic_update_slice(zp, z.astype(jnp.float32),
                                          (halo_pad,))
        return call(zp)[:n].astype(z.dtype)

    return apply


def try_pallas_stencil(stencil_op, interpret=False):
    """Lower a StencilOperator (k = 1 only) to the Pallas flat kernel.
    Returns a callable with the same masked semantics, or None."""
    if stencil_op.k != 1 or stencil_op.weights.shape[0] != 1:
        return None
    dims = stencil_op.dims
    dim = len(dims)
    strides = np.ones(dim, dtype=np.int64)
    for d in range(1, dim):
        strides[d] = strides[d - 1] * dims[d - 1]
    shifts = stencil_op.offsets @ strides
    n = int(np.prod(dims))
    # NOTE: flat shifts wrap rows at lattice edges; those rows are boundary
    # rows, which the mask overwrites — same validity condition as the
    # stencil itself (all-Dirichlet boundary).
    if stencil_op.mask is None:
        return None
    core = build_flat_stencil_apply(n, shifts, stencil_op.weights[0],
                                    interpret=interpret)
    mask = stencil_op.mask

    def apply(z):
        zf = jnp.where(mask, 0.0, z)
        y = core(zf)
        return jnp.where(mask, z, y)

    return jax.jit(apply)
