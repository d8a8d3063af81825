"""Pallas tiled stencil: one HBM read, all taps in VMEM.

The XLA lowering of the compiled stencil issues one padded slice-MAC per
tap — up to 27 HBM traversals of the grid. This kernel views the DOF grid
as (rows = nz*ny, lanes = nx), streams row blocks (+ row halo) into VMEM
once, and applies every tap on-chip:

  * z/y offsets  -> row offsets (sublane-direction slices of the block),
  * x offsets    -> lane rolls (pltpu.roll) within each row; the lane wrap
    only pollutes the first/last column, which are Dirichlet-masked
    boundary DOFs (same validity argument as the flat-shift form).

Requirements: k = 1 stencil, all-Dirichlet boundary, and an nx that is a
multiple of 128 for full lane tiles (cells = 2^k - 1 meshes).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def build_tiled_stencil_apply(dims, offsets, weights, row_block=512,
                              interpret=False):
    """dims: dof-grid dims (dim0 fastest) with len 3; returns z -> stencil(z)
    treating out-of-grid reads as zero."""
    nx, ny, nz = int(dims[0]), int(dims[1]), int(dims[2])
    R = nz * ny
    # max |row offset| for 27-point stencils, rounded up so every DMA window
    # is a multiple of the (8, 128) sublane tiling
    H = ((ny + 1 + 7) // 8) * 8
    taps = []
    for t in range(len(offsets)):
        w = float(weights[t])
        if w == 0.0:
            continue
        dx, dy, dz = (int(offsets[t][0]), int(offsets[t][1]),
                      int(offsets[t][2]))
        taps.append((dz * ny + dy, dx, w))
    RB = min(row_block, R)
    nblocks = -(-R // RB)
    R_pad = nblocks * RB
    total_rows = R_pad + 2 * H

    def kernel(zp_ref, out_ref, scratch, sem):
        i = pl.program_id(0)
        start = i * RB
        dma = pltpu.make_async_copy(
            zp_ref.at[pl.ds(start, RB + 2 * H), :], scratch, sem)
        dma.start()
        dma.wait()
        acc = None
        for (ro, dx, w) in taps:
            seg = scratch[pl.ds(H + ro, RB), :]
            if dx != 0:
                # pltpu.roll requires non-negative shift: roll by nx - dx
                # for left shifts (out[i] = seg[i + dx])
                seg = pltpu.roll(seg, (-dx) % nx, 1)
            acc = w * seg if acc is None else acc + w * seg
        out_ref[:, :] = acc

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R_pad, nx), jnp.float32),
        grid=(nblocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
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
        out = call(zp)
        return out[:R].reshape(-1).astype(z.dtype)

    return apply


def try_pallas_tiled_stencil(stencil_op, interpret=False, row_block=512):
    """Lower a StencilOperator (k=1, 3D, lane-aligned nx) to the tiled
    kernel with the same masked semantics; None if it does not qualify."""
    if stencil_op.k != 1 or stencil_op.weights.shape[0] != 1:
        return None
    if jax.config.jax_enable_x64 and not interpret:
        return None   # Pallas TPU has no f64; fp64 mode stays on XLA
        # (weights are float64 numpy even in fp32 mode — gate on x64)
    dims = stencil_op.dims
    if len(dims) != 3:
        return None
    if dims[0] % 128 != 0 and not interpret:
        return None
    if stencil_op.mask is None:
        return None
    core = build_tiled_stencil_apply(dims, stencil_op.offsets,
                                     stencil_op.weights[0],
                                     row_block=row_block,
                                     interpret=interpret)
    mask = stencil_op.mask

    def apply(z):
        zf = jnp.where(mask, 0.0, z)
        y = core(zf)
        return jnp.where(mask, z, y)

    return jax.jit(apply)
