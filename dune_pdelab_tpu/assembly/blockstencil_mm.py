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
                         interpret=False, bz=8):
    """cells = (nx, ny, nz) element lattice (dim0 fastest), 3D only.
    Returns (apply_flat, apply_mm, to_mm, from_mm): apply_flat takes the
    standard element-major flat vector; apply_mm operates on the
    (nz, nb, ny, nx) mode-major grid (use inside solvers to amortize the
    transposes).

    bz = z-planes per grid step. The single-plane variant spent ~65 us of
    per-step overhead on 512 KB of work (2.0 Gdof/s at 128^3 Q1 DG);
    blocking amortizes the DMA waits, iota/mask setup, and step turnaround
    over bz output planes."""
    nx, ny, nz = int(cells[0]), int(cells[1]), int(cells[2])
    nb = int(nb)
    f32 = jnp.float32
    while nz % bz:
        bz -= 1                # largest divisor of nz not above requested
    nzb = nz // bz

    W = {}
    for t, off in enumerate(np.asarray(offsets)):
        W[(int(off[0]), int(off[1]), int(off[2]))] = np.asarray(
            W_taps[t], np.float64)
    W0 = W[(0, 0, 0)]
    Wxm, Wxp = W.get((-1, 0, 0)), W.get((1, 0, 0))
    Wym, Wyp = W.get((0, -1, 0)), W.get((0, 1, 0))
    Wzm, Wzp = W.get((0, 0, -1)), W.get((0, 0, 1))

    def slab_dma(z_hbm, raw, sems, zb, slot):
        """Copy input planes [zb*bz - 1, zb*bz + bz] (clamped) into slab
        ring slot `slot` — bz+2 per-plane copies so each end can clamp;
        the clamped duplicates' dz contributions are zeroed by the zm/zp
        scalar factors below."""
        copies = []
        for j in range(bz + 2):
            idx = jnp.clip(zb * bz + j - 1, 0, nz - 1)
            copies.append(pltpu.make_async_copy(
                z_hbm.at[idx], raw.at[slot, j], sems.at[slot, j]))
        return copies

    def kernel(z_hbm, out_ref, raw, sems):
        zb = pl.program_id(0)

        @pl.when(zb == 0)
        def _():
            for c in slab_dma(z_hbm, raw, sems, zb, 0):
                c.start()

        @pl.when(zb + 1 <= nzb - 1)
        def _():
            for c in slab_dma(z_hbm, raw, sems, zb + 1, (zb + 1) % 2):
                c.start()

        for c in slab_dma(z_hbm, raw, sems, zb, zb % 2):
            c.wait()

        xi = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 1)
        yi = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 0)
        mxm = xi >= 1           # column x-1 exists
        mxp = xi <= nx - 2
        mym = yi >= 1
        myp = yi <= ny - 2
        zero = jnp.zeros((ny, nx), f32)
        slot = zb % 2

        for j in range(bz):
            zg = zb * bz + j    # global output plane
            zm = jnp.where(zg > 0, 1.0, 0.0).astype(f32)
            zp = jnp.where(zg < nz - 1, 1.0, 0.0).astype(f32)

            cur = [raw[slot, j + 1, b] for b in range(nb)]
            prev = [raw[slot, j, b] for b in range(nb)]
            nxt = [raw[slot, j + 2, b] for b in range(nb)]
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
                out_ref[j, a] = zero if acc is None else acc

    call = pl.pallas_call(
        kernel,
        grid=(nzb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((bz, nb, ny, nx), lambda zb: (zb, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nz, nb, ny, nx), f32),
        scratch_shapes=[
            pltpu.VMEM((2, bz + 2, nb, ny, nx), f32),
            pltpu.SemaphoreType.DMA((2, bz + 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
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
                              zmm[:, :, :, xf], precision="highest")
            out = out.at[:, :, :, xf].add(corr)
        # y faces: zmm[:, :, yf, :] -> (nz, nb, nx); mode axis 1
        for side, yf in ((0, 0), (1, ny - 1)):
            corr = jnp.einsum("ab,zbx->zax", jnp.asarray(dD[1, side]),
                              zmm[:, :, yf, :], precision="highest")
            out = out.at[:, :, yf, :].add(corr)
        # z faces: zmm[zf] -> (nb, ny, nx); mode axis 0
        for side, zf in ((0, 0), (1, nz - 1)):
            corr = jnp.einsum("ab,byx->ayx", jnp.asarray(dD[2, side]),
                              zmm[zf], precision="highest")
            out = out.at[zf].add(corr)
        return out

    @jax.jit
    def apply_flat(zflat):
        return from_mm(apply_mm(to_mm(zflat)), zflat.dtype)

    return apply_flat, jax.jit(apply_mm), to_mm, from_mm


def build_mm_flat_apply(cells, nb, W_taps, offsets, dD_sides,
                        interpret=False, bz=8, seg_scratch=False,
                        fold_dd=True):
    """MXU variant of the mode-major kernel: planes are stored FLAT as
    (nb, ny*nx) 2D tiles, so

      * x/y shifts are lane-rolls on the flattened axis (x-shift = roll 1,
        y-shift = roll nx) with iota-modulo boundary masks, and
      * the whole block-tap contraction collapses to ONE matmul per output
        plane:  out = Wcat (nb, 7*nb) @ Scat (7*nb, L)  — MXU work instead
        of 7*nb^2 VPU plane-FMAs (the VPU variant is VMEM-op-bound at
        ~2.2 Gdof/s; the matmul form cuts the per-plane op count ~20x).

    Same return contract as build_mm_block_apply."""
    nx, ny, nz = int(cells[0]), int(cells[1]), int(cells[2])
    nb = int(nb)
    L = ny * nx
    f32 = jnp.float32
    while nz % bz:
        bz -= 1
    nzb = nz // bz

    offs = [tuple(int(v) for v in off) for off in np.asarray(offsets)]
    order = [(0, 0, 0), (-1, 0, 0), (1, 0, 0), (0, -1, 0), (0, 1, 0),
             (0, 0, -1), (0, 0, 1)]
    W = {o: np.zeros((nb, nb)) for o in order}
    for t, o in enumerate(offs):
        W[o] = np.asarray(W_taps[t], np.float64)
    # Wcat rows = output modes; columns grouped per segment: the 7 taps in
    # `order`, then (fold_dd) the 6 per-face diagonal corrections dD
    # (applied to face-masked copies of the current plane) — the whole
    # apply incl. boundary handling is ONE matmul, no post-kernel slice
    # updates. With fold_dd=False the dD corrections instead become
    # O(surface) slice updates outside the kernel: the 6 face-masked
    # segments are ~99% zeros yet cost full-plane VMEM stores, so dropping
    # them cuts segment traffic ~45% and the matmul K from 13*nb to 7*nb.
    dD_np = np.asarray(dD_sides, np.float64)          # (3, 2, nb, nb)
    nseg = 13 if fold_dd else 7
    Wcat = jnp.asarray(np.concatenate(
        [W[o] for o in order]
        + ([dD_np[d, s] for d in range(3) for s in (0, 1)]
           if fold_dd else []), axis=1), f32)

    def slab_dma(z_hbm, raw, sems, zb, slot):
        copies = []
        for j in range(bz + 2):
            idx = jnp.clip(zb * bz + j - 1, 0, nz - 1)
            copies.append(pltpu.make_async_copy(
                z_hbm.at[idx], raw.at[slot, j], sems.at[slot, j]))
        return copies

    def kernel(wcat_ref, z_hbm, out_ref, raw, sems, *maybe_scat):
        zb = pl.program_id(0)

        @pl.when(zb == 0)
        def _():
            for c in slab_dma(z_hbm, raw, sems, zb, 0):
                c.start()

        @pl.when(zb + 1 <= nzb - 1)
        def _():
            for c in slab_dma(z_hbm, raw, sems, zb + 1, (zb + 1) % 2):
                c.start()

        for c in slab_dma(z_hbm, raw, sems, zb, zb % 2):
            c.wait()

        pi = jax.lax.broadcasted_iota(jnp.int32, (1, nb, L), 2)
        xc = pi % nx                     # x column of the flat position
        mxm = (xc >= 1).astype(f32)      # x-1 exists
        mxp = (xc <= nx - 2).astype(f32)
        mym = (pi >= nx).astype(f32)     # y-1 exists
        myp = (pi < L - nx).astype(f32)
        slot = zb % 2
        wc = wcat_ref[...]

        # whole-block segment construction: ONE roll/multiply per segment
        # per grid step (the per-plane variant was op-dispatch-bound)
        cur = raw[slot, 1:bz + 1]        # (bz, nb, L)
        prv = raw[slot, 0:bz]
        nxt = raw[slot, 2:bz + 2]
        zi = zb * bz + jax.lax.broadcasted_iota(jnp.int32, (bz, 1, 1), 0)
        zm = (zi > 0).astype(f32)        # z-1 exists (per plane of block)
        zp = (zi < nz - 1).astype(f32)
        def seg_exprs():
            segs = [
                cur,
                mxm * pltpu.roll(cur, 1, 2),
                mxp * pltpu.roll(cur, L - 1, 2),
                mym * pltpu.roll(cur, nx, 2),
                myp * pltpu.roll(cur, L - nx, 2),
                zm * prv,
                zp * nxt,
            ]
            if fold_dd:
                # face-masked copies for the dD boundary corrections
                segs += [
                    (1.0 - mxm) * cur,
                    (1.0 - mxp) * cur,
                    (1.0 - mym) * cur,
                    (1.0 - myp) * cur,
                    (1.0 - zm) * cur,
                    (1.0 - zp) * cur,
                ]
            return segs

        if seg_scratch:
            # store each segment straight into its scat slice — removes
            # the concatenate's extra (bz, 13nb, L) write+read pass
            sref = maybe_scat[0]
            for si, seg in enumerate(seg_exprs()):
                sref[:, si * nb:(si + 1) * nb, :] = seg
            scat = sref
        else:
            scat = jnp.concatenate(seg_exprs(), axis=1)  # (bz, 13*nb, L)
        for j in range(bz):
            # precision=HIGHEST: MXU dots default to bf16 operands even
            # inside Pallas — bf16-rounded weights are an O(1e-3)
            # operator perturbation (fatal at SIPG condition numbers)
            out_ref[j] = jax.lax.dot_general(
                wc, scat[j], (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
                precision=jax.lax.Precision.HIGHEST)

    call = pl.pallas_call(
        kernel,
        grid=(nzb,),
        in_specs=[
            pl.BlockSpec((nb, nseg * nb), lambda zb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((bz, nb, L), lambda zb: (zb, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nz, nb, L), f32),
        scratch_shapes=[
            pltpu.VMEM((2, bz + 2, nb, L), f32),
            pltpu.SemaphoreType.DMA((2, bz + 2)),
        ] + ([pltpu.VMEM((bz, nseg * nb, L), f32)] if seg_scratch else []),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )

    def to_mm(zflat):
        return jnp.transpose(
            zflat.astype(f32).reshape(nz, ny, nx, nb), (0, 3, 1, 2))

    def from_mm(zmm, dtype=jnp.float32):
        return jnp.transpose(zmm, (0, 2, 3, 1)).reshape(-1).astype(dtype)

    if fold_dd:
        def apply_mm(zmm):
            # boundary corrections ride the matmul (face-masked segments)
            # — the kernel output is final
            return call(Wcat, zmm.reshape(nz, nb, L)).reshape(
                nz, nb, ny, nx)
    else:
        dD32 = np.asarray(dD_sides, np.float32)

        def apply_mm(zmm):
            # O(surface) dD corrections as in-place slice updates (XLA
            # lowers .at[].add to in-place dynamic-update-slice here)
            out = call(Wcat, zmm.reshape(nz, nb, L)).reshape(
                nz, nb, ny, nx)
            for side, xf in ((0, 0), (1, nx - 1)):
                corr = jnp.einsum("ab,zby->zay", jnp.asarray(dD32[0, side]),
                                  zmm[:, :, :, xf], precision="highest")
                out = out.at[:, :, :, xf].add(corr)
            for side, yf in ((0, 0), (1, ny - 1)):
                corr = jnp.einsum("ab,zbx->zax", jnp.asarray(dD32[1, side]),
                                  zmm[:, :, yf, :], precision="highest")
                out = out.at[:, :, yf, :].add(corr)
            for side, zf in ((0, 0), (1, nz - 1)):
                corr = jnp.einsum("ab,byx->ayx", jnp.asarray(dD32[2, side]),
                                  zmm[zf], precision="highest")
                out = out.at[zf].add(corr)
            return out

    @jax.jit
    def apply_flat(zflat):
        return from_mm(apply_mm(to_mm(zflat)), zflat.dtype)

    return apply_flat, jax.jit(apply_mm), to_mm, from_mm


def build_mm_vreg_apply(cells, nb, W_taps, offsets, dD_sides,
                        interpret=False):
    """VREG-resident tile variant: per z-plane and per 8-row y-block, the
    nb mode tiles (8, nx) and their six shifted variants are materialized
    once and ALL 7*nb^2 tap FMAs run register-resident (the fused-CG
    structure with modes as a leading dim). The VMEM-streaming variants
    ('mxu'/'vpu') are bound at ~7 ms/apply at 128^3 Q1 DG because every
    plane-op re-streams its operands through VMEM; here each input tile is
    read once per y-block.

    The per-side dD boundary corrections stay as O(surface) XLA updates
    outside the kernel (as in the original plane kernel). 3D only;
    ny % 8 == 0 and lane-aligned nx required on hardware."""
    nx, ny, nz = int(cells[0]), int(cells[1]), int(cells[2])
    nb = int(nb)
    f32 = jnp.float32
    nyb = ny // 8

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

        @pl.when(z == 0)
        def _():
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

        xi = jax.lax.broadcasted_iota(jnp.int32, (8, nx), 1)
        mxm = (xi >= 1).astype(f32)
        mxp = (xi <= nx - 2).astype(f32)
        yi = jax.lax.broadcasted_iota(jnp.int32, (8, nx), 0)
        row0 = (yi >= 1).astype(f32)        # zero row 0 (missing y-1)
        rowl = (yi <= 6).astype(f32)        # zero row 7 (missing y+1)
        zm = jnp.where(z > 0, 1.0, 0.0).astype(f32)
        zp = jnp.where(z < nz - 1, 1.0, 0.0).astype(f32)
        cs, ps, ns_ = z % 4, (z - 1) % 4, (z + 1) % 4

        for yb in range(nyb):
            top = yb * 8
            c_, xm_, xp_, ym_, yp_, pm_, pp_ = [], [], [], [], [], [], []
            for b in range(nb):
                c = raw[cs, b, top:top + 8]
                c_.append(c)
                xm_.append(None if Wxm is None else mxm
                           * pltpu.roll(c, 1, 1))
                xp_.append(None if Wxp is None else mxp
                           * pltpu.roll(c, nx - 1, 1))
                if Wym is not None:
                    ym_.append(row0 * pltpu.roll(c, 1, 0) if yb == 0
                               else raw[cs, b, top - 1:top + 7])
                else:
                    ym_.append(None)
                if Wyp is not None:
                    yp_.append(rowl * pltpu.roll(c, 7, 0) if yb == nyb - 1
                               else raw[cs, b, top + 1:top + 9])
                else:
                    yp_.append(None)
                pm_.append(None if Wzm is None else zm
                           * raw[ps, b, top:top + 8])
                pp_.append(None if Wzp is None else zp
                           * raw[ns_, b, top:top + 8])

            for a in range(nb):
                acc = None
                for Wt, segs in ((W0, c_), (Wxm, xm_), (Wxp, xp_),
                                 (Wym, ym_), (Wyp, yp_), (Wzm, pm_),
                                 (Wzp, pp_)):
                    if Wt is None:
                        continue
                    for b in range(nb):
                        w = float(Wt[a, b])
                        if w == 0.0:
                            continue
                        term = w * segs[b]
                        acc = term if acc is None else acc + term
                out_ref[0, a, top:top + 8] = (
                    jnp.zeros((8, nx), f32) if acc is None else acc)

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

    dD = np.asarray(dD_sides, np.float32)

    def to_mm(zflat):
        return jnp.transpose(
            zflat.astype(f32).reshape(nz, ny, nx, nb), (0, 3, 1, 2))

    def from_mm(zmm, dtype=jnp.float32):
        return jnp.transpose(zmm, (0, 2, 3, 1)).reshape(-1).astype(dtype)

    def apply_mm(zmm):
        out = call(zmm)
        for side, xf in ((0, 0), (1, nx - 1)):
            corr = jnp.einsum("ab,zby->zay", jnp.asarray(dD[0, side]),
                              zmm[:, :, :, xf], precision="highest")
            out = out.at[:, :, :, xf].add(corr)
        for side, yf in ((0, 0), (1, ny - 1)):
            corr = jnp.einsum("ab,zbx->zax", jnp.asarray(dD[1, side]),
                              zmm[:, :, yf, :], precision="highest")
            out = out.at[:, :, yf, :].add(corr)
        for side, zf in ((0, 0), (1, nz - 1)):
            corr = jnp.einsum("ab,byx->ayx", jnp.asarray(dD[2, side]),
                              zmm[zf], precision="highest")
            out = out.at[zf].add(corr)
        return out

    @jax.jit
    def apply_flat(zflat):
        return from_mm(apply_mm(to_mm(zflat)), zflat.dtype)

    return apply_flat, jax.jit(apply_mm), to_mm, from_mm


class MMBlockStencil:
    """Solver-facing wrapper of a mode-major lowering: callable on flat
    element-major vectors (includes the to/from transposes), and exposes
    `apply_mm`/`to_mm`/`from_mm` so Krylov loops can run ENTIRELY in the
    mode-major layout (one transpose at solve entry/exit instead of two
    per iteration — the transposes cost ~6 ms at 16.8M DOFs, the
    mm-resident apply 7 ms)."""

    def __init__(self, lowered):
        self.apply_flat, self.apply_mm, self.to_mm, self.from_mm = lowered

    def __call__(self, z):
        return self.apply_flat(z)


def try_mm_block_stencil(block_op, interpret=False, bz=8, mode="mxu"):
    """Lower a 3D BlockStencilOperator to the mode-major kernel. Returns
    (apply_flat, apply_mm, to_mm, from_mm) or None if it does not qualify
    (3D, face-neighbor taps only, aligned planes, ring fits VMEM).
    mode='mxu' (the default used by LinearSolverBackend) is the
    flat-plane matmul contraction; 'mxu2' stores segments directly to a
    VMEM scratch (no concatenate pass); 'mxu3' additionally drops the six
    face-masked dD segments from the matmul (K=7*nb instead of 13*nb) and
    applies the corrections as O(surface) slice updates; 'vreg' the
    register-resident tile kernel; 'vpu' the per-tap shift-FMA variant."""
    cells = block_op.cells
    if len(cells) != 3:
        return None
    nx, ny, nz = int(cells[0]), int(cells[1]), int(cells[2])
    nb = block_op.nb
    if mode == "vreg" and ny % 8 != 0:
        return None          # vreg tiles are 8 y-rows even in interpret
    if not interpret and (nx % 128 != 0 or ny % 8 != 0):
        return None
    if not interpret and jax.config.jax_enable_x64:
        return None   # Pallas TPU has no f64; fp64 mode stays on XLA
    for off in np.asarray(block_op.offsets):
        if int(np.sum(np.abs(off))) > 1:
            return None
    while nz % bz:
        bz -= 1
    # VMEM: 2 input-slab ring slots of bz+2 planes + double-buffered
    # output blocks of bz planes (+ the per-plane Scat temp in mxu mode)
    if not interpret and (2 * (bz + 2) + 2 * bz + 7) * nb * ny * nx * 4 \
            > 100 * 1024 * 1024:
        return None
    if mode == "vreg":
        return build_mm_vreg_apply(cells, nb, block_op.W_taps,
                                   block_op.offsets, block_op.dD_sides,
                                   interpret=interpret)
    if mode == "mxu2":   # mxu with direct-to-scratch segment stores
        return build_mm_flat_apply(cells, nb, block_op.W_taps,
                                   block_op.offsets, block_op.dD_sides,
                                   interpret=interpret, bz=bz,
                                   seg_scratch=True)
    if mode == "mxu3":   # 7-segment matmul + O(surface) dD slice updates
        return build_mm_flat_apply(cells, nb, block_op.W_taps,
                                   block_op.offsets, block_op.dD_sides,
                                   interpret=interpret, bz=bz,
                                   seg_scratch=True, fold_dd=False)
    build = build_mm_flat_apply if mode == "mxu" else build_mm_block_apply
    return build(cells, nb, block_op.W_taps, block_op.offsets,
                 block_op.dD_sides, interpret=interpret, bz=bz)
