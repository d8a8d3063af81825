"""Mode-major Pallas lowering of the 3D DG block stencil.

The round-2 lane-roll kernel (`blockstencil_pallas.py`) keeps the DG DOF
array in element-major layout (lanes = x*nb) and pays one lane-roll per
(tap, mode-offset) pair — VPU-bound at ~1.1 Gdof/s. This kernel instead
transposes to MODE-MAJOR planes, (nz, nb, ny, nx): each DG mode becomes
its own scalar field on the element lattice, and the block stencil

    out[a] = sum_t sum_b W_t[a, b] * shift_t( z[b] )

decomposes into nb^2 *scalar* shift-MAC stencils sharing input planes —
exactly the structure of the fused-CG scalar kernel (fused_cg_pallas.py),
which streams at the HBM envelope. Per z-plane the kernel does

  * 4*nb lane/sublane rolls + boundary-column masks (the dx/dy = +-1
    segments, computed once and reused by all nb output modes),
  * 7*nb^2 vector FMAs with *static scalar* weights,
  * dz = +-1 terms from a 3-slot plane ring (each plane DMA'd once),

so traffic is read-z + write-out = 2N * 4 bytes — the same 8 B/DOF as the
scalar stencil, with the VPU (not HBM) as the expected limiter.

Boundary handling: x/y wrap columns are masked in-kernel (the out-of-domain
neighbor contributes nothing); dz terms at the z faces are zeroed by a
scalar factor (ring slots hold clamped real planes, never garbage); the
per-side diagonal corrections dD are O(surface) slab updates outside the
kernel, exactly as in `BlockStencilOperator._apply_impl`.

Reference analog: the FastDG blocked apply (dune/pdelab/gridoperator/
fastdg/assembler.hh:25) over assembled BCRS blocks — here the blocks are
(2*dim+1) compile-time constants and the apply is pure streaming.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def build_mm_block_apply(cells, nb, W_taps, offsets, dD_sides,
                         interpret=False):
    """cells = (nx, ny, nz) element lattice (dim0 fastest), 3D only.
    Returns (apply_flat, apply_mm, to_mm, from_mm): apply_flat takes the
    standard element-major flat vector; apply_mm operates on the
    (nz, nb, ny, nx) mode-major grid (use inside solvers to amortize the
    transposes)."""
    nx, ny, nz = int(cells[0]), int(cells[1]), int(cells[2])
    nb = int(nb)
    f32 = jnp.float32

    W = {}
    for t, off in enumerate(np.asarray(offsets)):
        W[(int(off[0]), int(off[1]), int(off[2]))] = np.asarray(
            W_taps[t], np.float64)
    W0 = W[(0, 0, 0)]
    Wxm, Wxp = W.get((-1, 0, 0)), W.get((1, 0, 0))
    Wym, Wyp = W.get((0, -1, 0)), W.get((0, 1, 0))
    Wzm, Wzp = W.get((0, 0, -1)), W.get((0, 0, 1))

    def dma(z_hbm, raw, sems, k, slot):
        idx = jnp.clip(k, 0, nz - 1)
        return pltpu.make_async_copy(z_hbm.at[idx], raw.at[slot],
                                     sems.at[slot])

    def kernel(z_hbm, out_ref, raw, sems):
        z = pl.program_id(0)

        # 4-slot ring: the compute below reads planes z-1, z, z+1 while
        # plane z+2 is in flight — with 3 slots the prefetch target
        # (z+2)%3 would collide with the still-live plane z-1
        @pl.when(z == 0)
        def _():
            # slot 3 is read as "plane -1" at z == 0 before its first real
            # fill; its term is scaled by zm = 0, but stale VMEM could be
            # NaN and NaN * 0 propagates — zero it
            raw[3] = jnp.zeros((nb, ny, nx), f32)
            for k in range(3):
                dma(z_hbm, raw, sems, k, k).start()
            dma(z_hbm, raw, sems, 0, 0).wait()

        @pl.when(jnp.logical_and(z > 0, z + 2 <= nz - 1))
        def _():
            dma(z_hbm, raw, sems, z + 2, (z + 2) % 4).start()

        @pl.when(z + 1 <= nz - 1)
        def _():
            dma(z_hbm, raw, sems, z + 1, (z + 1) % 4).wait()

        xi = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 1)
        yi = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 0)
        mxm = xi >= 1           # column x-1 exists
        mxp = xi <= nx - 2
        mym = yi >= 1
        myp = yi <= ny - 2
        zero = jnp.zeros((ny, nx), f32)
        zm = jnp.where(z > 0, 1.0, 0.0).astype(f32)
        zp = jnp.where(z < nz - 1, 1.0, 0.0).astype(f32)

        cur = [raw[z % 4, b] for b in range(nb)]
        prev = [raw[(z - 1) % 4, b] for b in range(nb)]
        nxt = [raw[(z + 1) % 4, b] for b in range(nb)]
        sxm = [jnp.where(mxm, pltpu.roll(cur[b], 1, 1), zero)
               for b in range(nb)] if Wxm is not None else None
        sxp = [jnp.where(mxp, pltpu.roll(cur[b], nx - 1, 1), zero)
               for b in range(nb)] if Wxp is not None else None
        sym = [jnp.where(mym, pltpu.roll(cur[b], 1, 0), zero)
               for b in range(nb)] if Wym is not None else None
        syp = [jnp.where(myp, pltpu.roll(cur[b], ny - 1, 0), zero)
               for b in range(nb)] if Wyp is not None else None

        for a in range(nb):
            acc = None

            def fma(acc, Wt, segs):
                if Wt is None:
                    return acc
                for b in range(nb):
                    w = float(Wt[a, b])
                    if w == 0.0:
                        continue
                    term = w * segs[b]
                    acc = term if acc is None else acc + term
                return acc

            acc = fma(acc, W0, cur)
            acc = fma(acc, Wxm, sxm)
            acc = fma(acc, Wxp, sxp)
            acc = fma(acc, Wym, sym)
            acc = fma(acc, Wyp, syp)
            accm = fma(None, Wzm, prev)
            if accm is not None:
                acc = (zm * accm) if acc is None else acc + zm * accm
            accp = fma(None, Wzp, nxt)
            if accp is not None:
                acc = (zp * accp) if acc is None else acc + zp * accp
            out_ref[0, a] = zero if acc is None else acc

    call = pl.pallas_call(
        kernel,
        grid=(nz,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, nb, ny, nx), lambda z: (z, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nz, nb, ny, nx), f32),
        scratch_shapes=[
            pltpu.VMEM((4, nb, ny, nx), f32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    dD = np.asarray(dD_sides, np.float32)       # (dim, 2, nb, nb)

    def to_mm(zflat):
        return jnp.transpose(
            zflat.astype(f32).reshape(nz, ny, nx, nb), (0, 3, 1, 2))

    def from_mm(zmm, dtype=jnp.float32):
        return jnp.transpose(zmm, (0, 2, 3, 1)).reshape(-1).astype(dtype)

    def apply_mm(zmm):
        """call + per-side diagonal boundary corrections (additive) as
        O(surface) slab updates; the mode axis sits at 1 for x/y faces
        and at 0 for z faces (the leading z index is consumed)."""
        out = call(zmm)
        # x faces: zmm[:, :, :, xf] -> (nz, nb, ny); mode axis 1
        for side, xf in ((0, 0), (1, nx - 1)):
            corr = jnp.einsum("ab,zby->zay", jnp.asarray(dD[0, side]),
                              zmm[:, :, :, xf])
            out = out.at[:, :, :, xf].add(corr)
        # y faces: zmm[:, :, yf, :] -> (nz, nb, nx); mode axis 1
        for side, yf in ((0, 0), (1, ny - 1)):
            corr = jnp.einsum("ab,zbx->zax", jnp.asarray(dD[1, side]),
                              zmm[:, :, yf, :])
            out = out.at[:, :, yf, :].add(corr)
        # z faces: zmm[zf] -> (nb, ny, nx); mode axis 0
        for side, zf in ((0, 0), (1, nz - 1)):
            corr = jnp.einsum("ab,byx->ayx", jnp.asarray(dD[2, side]),
                              zmm[zf])
            out = out.at[zf].add(corr)
        return out

    @jax.jit
    def apply_flat(zflat):
        return from_mm(apply_mm(to_mm(zflat)), zflat.dtype)

    return apply_flat, jax.jit(apply_mm), to_mm, from_mm


def try_mm_block_stencil(block_op, interpret=False):
    """Lower a 3D BlockStencilOperator to the mode-major kernel. Returns
    (apply_flat, apply_mm, to_mm, from_mm) or None if it does not qualify
    (3D, face-neighbor taps only, aligned planes, ring fits VMEM)."""
    cells = block_op.cells
    if len(cells) != 3:
        return None
    nx, ny, nz = int(cells[0]), int(cells[1]), int(cells[2])
    nb = block_op.nb
    if not interpret and (nx % 128 != 0 or ny % 8 != 0):
        return None
    for off in np.asarray(block_op.offsets):
        if int(np.sum(np.abs(off))) > 1:
            return None
    if not interpret and (4 + 2) * nb * ny * nx * 4 > 80 * 1024 * 1024:
        return None
    return build_mm_block_apply(cells, nb, block_op.W_taps,
                                block_op.offsets, block_op.dD_sides,
                                interpret=interpret)
