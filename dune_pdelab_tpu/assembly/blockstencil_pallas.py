"""Pallas lowering of the DG block stencil (2D): one HBM pass, all block
taps as lane-rolls with periodic per-lane weights.

The XLA conv lowering of `BlockStencilOperator` moves the grid several
times (layout transposes + conv + slab corrections). This kernel views the
DG DOF array as (rows = ny, lanes = nx*nb) and applies every block tap
on-chip in a single streamed pass:

  * y offsets -> row offsets (sublane-direction slices, 1-row halo),
  * an (dx, d = b - a) pair -> ONE lane roll by dx*nb + d, multiplied by a
    lane-periodic weight vector w[p] = W_t[p % nb, p % nb + d] — so the
    5 * (2 nb - 1) rolls replace the 5 nb^2 masked shift-MACs a naive
    lowering would need.

The lane wrap of a roll only pollutes the first/last ELEMENT column; the
wrapper subtracts the wrapped contribution explicitly (DG has no Dirichlet
rows to hide behind), then adds the per-side boundary-correction blocks.
2D only; 3D stays on the XLA conv path.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def build_block_stencil_apply_2d(cells, nb, W_taps, offsets, dD_sides,
                                 row_block=256, interpret=False):
    """cells = (nx, ny) element lattice (dim0 fastest); returns z -> A z."""
    nx, ny = int(cells[0]), int(cells[1])
    L = nx * nb
    H = 8                                   # 1-row halo, sublane-tile padded
    # keep the row block small enough that the ~n_terms live (RB, L) roll
    # intermediates fit VMEM (observed: register spills ~ 16 * RB * L * 4 B)
    row_block = min(row_block, max(8, (2 * 1024 * 1024) // (L * 4)))
    RB = min(row_block, ny)
    nblocks = -(-ny // RB)
    R_pad = nblocks * RB
    total_rows = R_pad + 2 * H

    # (row_offset, lane_shift, lane-weight vector) terms
    terms = []
    lanes_mod = np.arange(L) % nb           # local mode index per lane
    for t, off in enumerate(np.asarray(offsets)):
        dx, dy = int(off[0]), int(off[1])
        W = np.asarray(W_taps[t])
        for d in range(-(nb - 1), nb):
            a = lanes_mod
            b = a + d
            valid = (b >= 0) & (b < nb)
            w = np.where(valid, W[a, np.clip(b, 0, nb - 1)], 0.0)
            if not np.any(w):
                continue
            terms.append((dy, dx * nb + d, w.astype(np.float32)))
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
    # x-edge un-wrap blocks: tap dx = -1 wraps the rightmost element into
    # column 0 and dx = +1 wraps the leftmost into column nx-1
    W_xm = W_xp = None
    for t, off in enumerate(np.asarray(offsets)):
        if int(off[1]) == 0 and int(off[0]) == -1:
            W_xm = np.asarray(W_taps[t], np.float32)
        if int(off[1]) == 0 and int(off[0]) == 1:
            W_xp = np.asarray(W_taps[t], np.float32)
    dD = np.asarray(dD_sides, np.float32)    # (2, 2, nb, nb)

    @jax.jit
    def apply(z):
        dt = z.dtype
        zb = z.astype(jnp.float32).reshape(ny, L)
        zp = jnp.zeros((total_rows, L), jnp.float32)
        zp = jax.lax.dynamic_update_slice(zp, zb, (H, 0))
        out = call(zp, wv)[:ny]
        zel = zb.reshape(ny, nx, nb)
        out = out.reshape(ny, nx, nb)
        # subtract wrapped-lane pollution on the x edges
        if W_xm is not None:
            out = out.at[:, 0, :].add(
                -jnp.einsum("yb,ab->ya", zel[:, -1, :], jnp.asarray(W_xm)))
        if W_xp is not None:
            out = out.at[:, -1, :].add(
                -jnp.einsum("yb,ab->ya", zel[:, 0, :], jnp.asarray(W_xp)))
        # per-side boundary corrections (additive, corners get both)
        out = out.at[:, 0, :].add(
            jnp.einsum("yb,ab->ya", zel[:, 0, :], jnp.asarray(dD[0, 0])))
        out = out.at[:, -1, :].add(
            jnp.einsum("yb,ab->ya", zel[:, -1, :], jnp.asarray(dD[0, 1])))
        out = out.at[0, :, :].add(
            jnp.einsum("xb,ab->xa", zel[0], jnp.asarray(dD[1, 0])))
        out = out.at[-1, :, :].add(
            jnp.einsum("xb,ab->xa", zel[-1], jnp.asarray(dD[1, 1])))
        return out.reshape(-1).astype(dt)

    return apply


def try_pallas_block_stencil(block_op, interpret=False, row_block=256):
    """Lower a 2D BlockStencilOperator to the Pallas kernel; None when it
    does not qualify (needs nx*nb to be a multiple of 128 for lane tiles)."""
    cells = block_op.cells
    if len(cells) != 2:
        return None
    L = int(cells[0]) * block_op.nb
    if L % 128 != 0 and not interpret:
        return None
    return build_block_stencil_apply_2d(
        cells, block_op.nb, block_op.W_taps, block_op.offsets,
        block_op.dD_sides, row_block=row_block, interpret=interpret)
