"""Pallas lowering of the DG block stencil (2D/3D): one HBM pass, all
block taps as lane-rolls with periodic per-lane weights.

The XLA conv lowering of `BlockStencilOperator` moves the grid several
times (layout transposes + conv + slab corrections). This kernel views the
DG DOF array as (rows, lanes = nx*nb) — rows = y (2D) or z*ny + y (3D) —
and applies every block tap on-chip in a single streamed pass:

  * y/z offsets -> row offsets (sublane-direction slices, 1-row halo),
  * an (dx, d = b - a) pair -> ONE lane roll by dx*nb + d, multiplied by a
    lane-periodic weight vector w[p] = W_t[p % nb, p % nb + d] — so the
    (2*dim+1) * (2 nb - 1) rolls replace the (2*dim+1) * nb^2 masked
    shift-MACs a naive lowering would need.

Boundary handling: the x direction is folded into the static lane weights
(wrapped lanes zeroed, x-side correction blocks added on the edge-element
lanes); the row directions keep O(surface) slab updates outside the kernel
(per-side correction blocks, and in 3D the subtraction of dy = +-1 row
offsets that cross z-slab boundaries into the y-edge planes).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def build_block_stencil_apply(cells, nb, W_taps, offsets, dD_sides,
                              row_block=256, interpret=False):
    """cells: element lattice (dim0 fastest), len 2 or 3; returns z -> A z."""
    dim = len(cells)
    nx = int(cells[0])
    ny = int(cells[1])
    nz = int(cells[2]) if dim == 3 else 1
    R = ny * nz
    L = nx * nb
    # row halo must cover the largest row offset (dz = +-1 -> +-ny in 3D,
    # dy = +-1 -> +-1 in 2D), rounded up to the (8, 128) sublane tiling
    max_ro = ny + 1 if dim == 3 else 1
    H = ((max_ro + 7) // 8) * 8
    # keep the row block small enough that the live (RB, L) roll
    # intermediates fit VMEM
    row_block = min(row_block, max(8, (2 * 1024 * 1024) // (L * 4)))
    RB = min(row_block, R)
    nblocks = -(-R // RB)
    R_pad = nblocks * RB
    total_rows = R_pad + 2 * H

    # (row_offset, lane_shift, lane-weight vector) terms. Lane weights fold
    # in the x-direction boundary handling for free:
    #   * dx = +-1 taps: the roll wraps the opposite edge element into the
    #     first/last nb lanes — zeroing the weight there removes the
    #     pollution AND is the correct value (the out-of-domain neighbor
    #     contributes nothing);
    #   * dx = 0 taps: the x-side diagonal corrections dD[0, side] live
    #     only on the first/last nb lanes — added to the periodic weight.
    dD_np = np.asarray(dD_sides, np.float64)
    terms = []
    lanes_mod = np.arange(L) % nb           # local mode index per lane
    W_by_tap = {}
    for t, off in enumerate(np.asarray(offsets)):
        dx = int(off[0])
        dy = int(off[1])
        dz = int(off[2]) if dim == 3 else 0
        W = np.asarray(W_taps[t])
        W_by_tap[(dx, dy, dz)] = W.astype(np.float32)
        ro = dz * ny + dy
        for d in range(-(nb - 1), nb):
            a = lanes_mod
            b = a + d
            valid = (b >= 0) & (b < nb)
            w = np.where(valid, W[a, np.clip(b, 0, nb - 1)], 0.0)
            if dx == 1:
                w[L - nb:] = 0.0
            elif dx == -1:
                w[:nb] = 0.0
            elif dy == 0 and dz == 0:       # diagonal tap: x-side dD
                wd0 = np.where(valid[:nb],
                               dD_np[0, 0][a[:nb],
                                           np.clip(b[:nb], 0, nb - 1)], 0.0)
                wd1 = np.where(valid[-nb:],
                               dD_np[0, 1][a[-nb:],
                                           np.clip(b[-nb:], 0, nb - 1)], 0.0)
                w[:nb] += wd0
                w[L - nb:] += wd1
            if not np.any(w):
                continue
            terms.append((ro, dx * nb + d, w.astype(np.float32)))
    wvecs = np.stack([w for (_, _, w) in terms])         # (nterms, L)
    meta = [(ro, s) for (ro, s, _) in terms]

    def kernel(zp_ref, w_ref, out_ref, scratch, sem):
        i = pl.program_id(0)
        start = i * RB
        dma = pltpu.make_async_copy(
            zp_ref.at[pl.ds(start, RB + 2 * H), :], scratch, sem)
        dma.start()
        dma.wait()
        # accumulate straight into the output window: each rolled segment's
        # live range ends per term, keeping VMEM pressure at one block
        # (a single `acc = acc + term` chain spills ~n_terms blocks)
        out_ref[:, :] = jnp.zeros_like(out_ref)
        for ti, (ro, s) in enumerate(meta):
            seg = scratch[pl.ds(H + ro, RB), :]
            if s != 0:
                seg = pltpu.roll(seg, (-s) % L, 1)
            out_ref[:, :] += seg * w_ref[ti, :][None, :]

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R_pad, L), jnp.float32),
        grid=(nblocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((len(terms), L), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((RB, L), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((RB + 2 * H, L), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )

    wv = jnp.asarray(wvecs)
    W_ym = W_by_tap.get((0, -1, 0))         # 3D: crosses into z-1 slab
    W_yp = W_by_tap.get((0, 1, 0))
    dD = np.asarray(dD_sides, np.float32)    # (dim, 2, nb, nb)
    el_shape = ((nz, ny, nx, nb) if dim == 3 else (ny, nx, nb))

    @jax.jit
    def apply(z):
        dt = z.dtype
        zf = z.astype(jnp.float32)
        zp = jnp.zeros((total_rows, L), jnp.float32)
        zp = jax.lax.dynamic_update_slice(zp, zf.reshape(R, L), (H, 0))
        out = call(zp, wv)[:R].reshape(el_shape)
        zel = zf.reshape(el_shape)
        # x-direction handling is folded into the lane weights; only the
        # row-direction (y/z) corrections remain as slab updates
        if dim == 3:
            # subtract z-slab-crossing pollution on the y-edge planes
            if W_ym is not None:
                out = out.at[1:, 0].add(
                    -jnp.einsum("...b,ab->...a", zel[:-1, -1],
                                jnp.asarray(W_ym)))
            if W_yp is not None:
                out = out.at[:-1, -1].add(
                    -jnp.einsum("...b,ab->...a", zel[1:, 0],
                                jnp.asarray(W_yp)))
        # per-side boundary corrections for the row dims (additive)
        for d in range(1, dim):
            ax = dim - 1 - d                # C-order axis of mesh dim d
            for side in (0, 1):
                sl = [slice(None)] * (dim + 1)
                sl[ax] = 0 if side == 0 else -1
                sl = tuple(sl)
                out = out.at[sl].add(jnp.einsum(
                    "...b,ab->...a", zel[sl], jnp.asarray(dD[d, side])))
        return out.reshape(-1).astype(dt)

    return apply


def try_pallas_block_stencil(block_op, interpret=False, row_block=256):
    """Lower a 2D/3D BlockStencilOperator to the Pallas kernel; None when
    it does not qualify (nx*nb must be a multiple of 128 for lane tiles)."""
    cells = block_op.cells
    if len(cells) not in (2, 3):
        return None
    import jax
    if jax.config.jax_enable_x64 and not interpret:
        return None   # Pallas TPU has no f64; fp64 mode stays on XLA
        # (W_taps are float64 numpy even in fp32 mode — gate on x64)
    L = int(cells[0]) * block_op.nb
    if L % 128 != 0 and not interpret:
        return None
    return build_block_stencil_apply(
        cells, block_op.nb, block_op.W_taps, block_op.offsets,
        block_op.dD_sides, row_block=row_block, interpret=interpret)


# backward-compatible alias
build_block_stencil_apply_2d = build_block_stencil_apply
