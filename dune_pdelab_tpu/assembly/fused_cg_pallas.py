"""Fully fused CG on a compiled k=1 stencil: two Pallas passes per iteration.

The round-1 bench path paid for (a) separate Dirichlet-mask and zero-pad
passes around the stencil kernel, (b) unfused CG vector updates and dots,
and (c) ~2x DMA read amplification (the z-plane halo of a row-blocked
window). This module removes all three:

  * vectors live as (nz, ny, nx) grids; NO padding, NO mask arrays — the
    Dirichlet boundary (all six faces, the compile_stencil qualification)
    is enforced in-kernel from iota row/lane indices, and roll wrap-around
    only ever lands on those masked faces;
  * each CG iteration is exactly two Pallas kernels:
      K1(r, p, beta)  -> p' = r + beta*p,  <p', A p'>
      K2(x, r, p, al) -> x + al*p,  r' = r - al*(A p),  <r', r'>
    with the 27-tap stencil recomputed in-register from a sliding window
    of z-planes (3-slot VMEM rings, each plane DMA'd from HBM exactly
    once => read amplification 1.0);
  * per arriving plane the kernel computes its three 2D *pattern*
    transforms pat_k = sum_{dy,dx} w[k,dy,dx] shift_{dy,dx}(plane) once
    (9 rolls + 27 FMA per plane) and caches them; each output plane is
    then 3 adds: out(z) = pat_{-1}(z-1) + pat_0(z) + pat_{+1}(z+1). This
    halves the VPU roll work vs rolling per output plane — the kernels
    are VPU-bound, not HBM-bound, on v5e;
  * dots accumulate in SMEM across the sequential TPU grid.

Byte traffic per CG iteration: K1 reads r,p + writes p' = 3N, K2 reads
x,r,p + writes x,r = 5N  =>  8N total vs the 12N naive model — the fused
solver can therefore exceed "100%" of the naive-model roofline.

This is the TPU answer to the reference's assembled-BCRS + ISTL-CG hot
path (reference: dune/pdelab/backend/istl/seqistlsolverbackend.hh:112-1060
solver combos; bcrsmatrix.hh SpMV): instead of streaming N*27 stored
matrix entries, the operator is (2k+1)^d scalars and the solver streams
only the vectors.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class FusedCGStats(NamedTuple):
    iterations: jnp.ndarray
    defect: jnp.ndarray
    converged: jnp.ndarray


def _tap_tensor(offsets, weights):
    """(3, 3, 3) weight tensor w[dz+1, dy+1, dx+1] of a k=1 stencil."""
    w = np.zeros((3, 3, 3))
    for t in range(len(offsets)):
        dx, dy, dz = (int(offsets[t][0]), int(offsets[t][1]),
                      int(offsets[t][2]))
        w[dz + 1, dy + 1, dx + 1] = float(weights[t])
    return w


def _interior_mask(ny, nx):
    yi = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 0)
    xi = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 1)
    return (yi > 0) & (yi < ny - 1) & (xi > 0) & (xi < nx - 1)


def build_fused_cg_kernels(dims, offsets, weights, interpret=False):
    """dims = (nx, ny, nz) dof-grid dims (dim0 fastest). Returns (k1, k2):

      k1(r, p, beta) -> (p_new, pAp)       with p_new = r + beta*p
      k2(x, r, p, alpha) -> (x_new, r_new, rr)

    All vector args/results are (nz, ny, nx) f32 grids. A is the masked
    stencil: rows/columns on the six grid faces act as identity/zero —
    valid because every CG vector is zero there (b is Dirichlet-masked and
    the kernels re-zero the faces each pass).
    """
    nx, ny, nz = int(dims[0]), int(dims[1]), int(dims[2])
    W = _tap_tensor(offsets, weights)
    f32 = jnp.float32

    grid_spec = lambda: pl.BlockSpec((1, ny, nx), lambda z: (z, 0, 0))
    smem_scalar = pl.BlockSpec(memory_space=pltpu.SMEM)
    # rings + pipelined blocks + tap temporaries exceed the default 16MB
    # scoped-VMEM budget at 512^2 planes; raise the cap for these kernels
    cparams = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)

    def dma(hbm_ref, slots, sems, k, slot):
        idx = jnp.clip(k, 0, nz - 1)
        return pltpu.make_async_copy(hbm_ref.at[idx], slots.at[slot],
                                     sems.at[slot])

    def compute_patterns(plane, pat_ring, slot):
        """pat_k = sum_{dy,dx} w[k,dy,dx] shift_{dy,dx}(plane) for
        k = -1,0,1 -> pat_ring[slot, k+1]. Roll wrap-around only lands on
        Dirichlet-masked faces."""
        pats = [None, None, None]
        for dy in (-1, 0, 1):
            s1 = pltpu.roll(plane, (-dy) % ny, 0) if dy != 0 else plane
            for dx in (-1, 0, 1):
                s2 = pltpu.roll(s1, (-dx) % nx, 1) if dx != 0 else s1
                for k in range(3):
                    w = float(W[k, dy + 1, dx + 1])  # python float: no
                    if w == 0.0:                     # f64 promotion in x64
                        continue
                    pats[k] = w * s2 if pats[k] is None else pats[k] + w * s2
        for k in range(3):
            pat_ring[slot, k] = (jnp.zeros((ny, nx), f32)
                                 if pats[k] is None else pats[k])

    def out_plane(pat_ring, raw_ring, z, m2d):
        """Masked A-application at plane z from cached patterns."""
        q = (pat_ring[(z - 1) % 3, 2] + pat_ring[z % 3, 1]
             + pat_ring[(z + 1) % 3, 0])
        zvalid = jnp.logical_and(z > 0, z < nz - 1)
        return jnp.where(jnp.logical_and(m2d, zvalid), q, 0.0)

    # ---------------- K1: p' = r + beta*p ; dot <p', A p'> ---------------
    def k1_kernel(beta_ref, r_hbm, p_hbm, pn_ref, papd_ref,
                  rs, ps, raw_ring, pat_ring, rsem, psem):
        z = pl.program_id(0)
        beta = beta_ref[0]
        m2d = _interior_mask(ny, nx)

        @pl.when(z == 0)
        def _():
            papd_ref[0] = 0.0
            # warm the 3-slot rings: planes 0, 1, 2
            for k in range(3):
                dma(r_hbm, rs, rsem, k, k).start()
                dma(p_hbm, ps, psem, k, k).start()
            dma(r_hbm, rs, rsem, 0, 0).wait()
            dma(p_hbm, ps, psem, 0, 0).wait()
            pp0 = rs[0] + beta * ps[0]
            raw_ring[0] = pp0
            compute_patterns(pp0, pat_ring, 0)

        # prefetch plane z+2 FIRST so its transfer overlaps this step's
        # compute; slot (z+2)%3 held r/p(z-1), consumed at step z-2. The
        # z==0 warm-up above already started planes 0-2.
        @pl.when(jnp.logical_and(z > 0, z + 2 <= nz - 1))
        def _():
            dma(r_hbm, rs, rsem, z + 2, (z + 2) % 3).start()
            dma(p_hbm, ps, psem, z + 2, (z + 2) % 3).start()

        @pl.when(z + 1 <= nz - 1)
        def _():
            dma(r_hbm, rs, rsem, z + 1, (z + 1) % 3).wait()
            dma(p_hbm, ps, psem, z + 1, (z + 1) % 3).wait()
            ppn = rs[(z + 1) % 3] + beta * ps[(z + 1) % 3]
            raw_ring[(z + 1) % 3] = ppn
            compute_patterns(ppn, pat_ring, (z + 1) % 3)

        q = out_plane(pat_ring, raw_ring, z, m2d)
        pc = raw_ring[z % 3]
        pn_ref[0] = pc
        papd_ref[0] += jnp.sum(pc * q)

    k1_call = pl.pallas_call(
        k1_kernel,
        grid=(nz,),
        in_specs=[smem_scalar,
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[grid_spec(),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((nz, ny, nx), f32),
                   jax.ShapeDtypeStruct((1,), f32)],
        scratch_shapes=[
            pltpu.VMEM((3, ny, nx), f32),      # r planes
            pltpu.VMEM((3, ny, nx), f32),      # p planes
            pltpu.VMEM((3, ny, nx), f32),      # p' raw sliding window
            pltpu.VMEM((3, 3, ny, nx), f32),   # pattern cache per plane
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=cparams,
        interpret=interpret,
    )

    def k1(r, p, beta):
        pn, pap = k1_call(jnp.reshape(beta, (1,)).astype(f32), r, p)
        return pn, pap[0]

    # -------- K2: x += al*p ; r' = r - al*(A p) ; dot <r',r'> ------------
    def k2_kernel(al_ref, p_hbm, x_ref, r_ref, xn_ref, rn_ref, rrd_ref,
                  raw_ring, pat_ring, psem):
        z = pl.program_id(0)
        al = al_ref[0]
        m2d = _interior_mask(ny, nx)

        @pl.when(z == 0)
        def _():
            rrd_ref[0] = 0.0
            for k in range(3):
                dma(p_hbm, raw_ring, psem, k, k).start()
            dma(p_hbm, raw_ring, psem, 0, 0).wait()
            compute_patterns(raw_ring[0], pat_ring, 0)

        # prefetch p(z+2) FIRST (overlaps this step's compute) into the
        # slot of dead plane p(z-1): its patterns were taken at step z-2
        # and its raw value was last read (pc) at step z-1.
        @pl.when(jnp.logical_and(z > 0, z + 2 <= nz - 1))
        def _():
            dma(p_hbm, raw_ring, psem, z + 2, (z + 2) % 3).start()

        @pl.when(z + 1 <= nz - 1)
        def _():
            dma(p_hbm, raw_ring, psem, z + 1, (z + 1) % 3).wait()
            compute_patterns(raw_ring[(z + 1) % 3], pat_ring, (z + 1) % 3)

        q = out_plane(pat_ring, raw_ring, z, m2d)
        pc = raw_ring[z % 3]
        xn_ref[0] = x_ref[0] + al * pc
        rn = r_ref[0] - al * q
        rn_ref[0] = rn
        rrd_ref[0] += jnp.sum(rn * rn)

    k2_call = pl.pallas_call(
        k2_kernel,
        grid=(nz,),
        in_specs=[smem_scalar,
                  pl.BlockSpec(memory_space=pl.ANY),
                  grid_spec(), grid_spec()],
        out_specs=[grid_spec(), grid_spec(),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((nz, ny, nx), f32),
                   jax.ShapeDtypeStruct((nz, ny, nx), f32),
                   jax.ShapeDtypeStruct((1,), f32)],
        scratch_shapes=[
            pltpu.VMEM((3, ny, nx), f32),      # p raw sliding window
            pltpu.VMEM((3, 3, ny, nx), f32),   # pattern cache per plane
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=cparams,
        interpret=interpret,
    )

    def k2(x, r, p, alpha):
        xn, rn, rr = k2_call(jnp.reshape(alpha, (1,)).astype(f32), p, x, r)
        return xn, rn, rr[0]

    return k1, k2


def qualifies(stencil_op, interpret=False):
    """Fused CG requires: k=1, 3D, single class, lane-aligned nx, and the
    constraint mask == exactly the grid-boundary faces. Interpret mode
    (CPU testing) waives the alignment requirements."""
    if stencil_op.k != 1 or stencil_op.weights.shape[0] != 1:
        return False
    if jax.config.jax_enable_x64 and not interpret:
        return False   # Pallas TPU has no f64; fp64 mode stays on XLA
        # (weights are float64 numpy even in fp32 mode — gate on x64)
    dims = stencil_op.dims
    if len(dims) != 3:
        return False
    if not interpret and (dims[0] % 128 != 0 or dims[1] % 8 != 0):
        return False
    if stencil_op.mask is None:
        return False
    nx, ny, nz = int(dims[0]), int(dims[1]), int(dims[2])
    m = np.asarray(stencil_op.mask).reshape(nz, ny, nx)
    bnd = np.zeros((nz, ny, nx), bool)
    bnd[0] = bnd[-1] = True
    bnd[:, 0] = bnd[:, -1] = True
    bnd[:, :, 0] = bnd[:, :, -1] = True
    return bool(np.array_equal(m, bnd))


def make_fused_cg(stencil_op, maxiter=100, tol=1e-8, interpret=False):
    """Compile a fused-CG solver for a qualifying StencilOperator.

    Returns solve(b) -> (z, FusedCGStats) solving A z = b with z0 = 0,
    where A is the masked stencil. b must be zero on Dirichlet rows (the
    residual convention). Matches linalg.cg semantics: stop when
    ||r|| <= tol * ||b|| or maxiter.
    """
    if not qualifies(stencil_op, interpret=interpret):
        raise ValueError("stencil does not qualify for fused CG")
    dims = stencil_op.dims
    nx, ny, nz = int(dims[0]), int(dims[1]), int(dims[2])
    k1, k2 = build_fused_cg_kernels(dims, stencil_op.offsets,
                                    stencil_op.weights[0],
                                    interpret=interpret)

    @partial(jax.jit, static_argnames=())
    def solve(b):
        bg = b.astype(jnp.float32).reshape(nz, ny, nx)
        x0 = jnp.zeros_like(bg)
        p0, pap0 = k1(bg, bg, jnp.float32(0.0))  # p0 = r0 = b
        rr0 = jnp.vdot(bg.reshape(-1), bg.reshape(-1))  # init-only XLA pass
        stop2 = (tol * tol) * rr0

        def cond(state):
            x, r, p, rr, pap, it = state
            return jnp.logical_and(it < maxiter, rr > stop2)

        def body(state):
            x, r, p, rr, pap, it = state
            alpha = rr / pap
            x, r, rr_new = k2(x, r, p, alpha)
            beta = rr_new / rr
            p, pap = k1(r, p, beta)
            return x, r, p, rr_new, pap, it + 1

        x, r, p, rr, pap, it = jax.lax.while_loop(
            cond, body, (x0, bg, p0, rr0.astype(jnp.float32),
                         pap0, jnp.int32(0)))
        stats = FusedCGStats(iterations=it, defect=jnp.sqrt(rr),
                             converged=rr <= stop2)
        return x.reshape(-1).astype(b.dtype), stats

    return solve
