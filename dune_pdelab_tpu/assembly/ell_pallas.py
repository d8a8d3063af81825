"""Roofline Pallas SpMV for the assembled lattice-ELL matrix (3D, k=1).

The assembled half of BASELINE's primary metric runs through this kernel.
Traffic model per apply (fp32): the 27 per-row tap-value planes stream
through VMEM exactly once (27N), the DOF vector is read once through a
3-slot plane ring (N), the mask plane once (N), and the result is written
once (N) => (27+3)*4 bytes/DOF — within a few percent of the information-
theoretic minimum for a stored 27-point matrix. This is the TPU analog of
the reference's assembled BCRS SpMV hot loop (reference:
dune/pdelab/backend/istl/bcrsmatrix.hh; seqistlsolverbackend.hh:112-1060),
replacing CSR row-pointer gathers with offset-keyed dense streams.

Kernel structure (grid = nz, one output z-plane per step):

  * values laid out (nz, 27, ny, nx): one (27, ny, nx) block pipelined per
    step by the Pallas grid machinery (auto double-buffered);
  * x-planes arrive via manual ring DMA (3 raw slots); on arrival each
    plane's three lane-rolls (dx = -1, 0, +1) are cached in a (3, 3) ring
    so rolls happen once per plane, not once per tap;
  * per output plane: 27 FMA of (ny, nx) + 18 sublane-rolls (dy = +-1);
  * wrap-around of rolls is annihilated because out-of-domain couplings
    are exact zeros in the assembled values (no masking passes needed);
  * Dirichlet identity rows fold in-kernel: out = where(mask, z, A z).
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def build_plane_ell_apply(dims, offsets, values, mask, interpret=False):
    """dims = (nx, ny, nz) DOF-lattice dims (dim0 fastest); offsets
    (27, 3) in dim order (dx, dy, dz); values (27, nz, ny, nx);
    mask (N,) bool or None. Returns jitted z -> (mask ? z : A z)."""
    nx, ny, nz = int(dims[0]), int(dims[1]), int(dims[2])
    nt = int(np.asarray(offsets).shape[0])
    f32 = jnp.float32

    # tap metadata: (dz, dy, dx-index) with dx-index in {0,1,2} = dx+1
    taps = [(int(offsets[t][2]), int(offsets[t][1]), int(offsets[t][0]) + 1)
            for t in range(nt)]

    # (nz, nt, ny, nx) layout: the per-step block is contiguous per plane
    vals = jnp.transpose(jnp.asarray(values, f32), (1, 0, 2, 3))
    mgrid = (jnp.asarray(mask).reshape(nz, ny, nx).astype(f32)
             if mask is not None else jnp.zeros((nz, ny, nx), f32))

    def dma(z_hbm, raw, sems, k, slot):
        idx = jnp.clip(k, 0, nz - 1)
        return pltpu.make_async_copy(z_hbm.at[idx], raw.at[slot],
                                     sems.at[slot])

    def cache_rolls(raw, xring, slot):
        p = raw[slot]
        xring[slot, 0] = pltpu.roll(p, 1 % nx, 1)        # dx = -1
        xring[slot, 1] = p
        xring[slot, 2] = pltpu.roll(p, (-1) % nx, 1)     # dx = +1

    def kernel(z_hbm, vals_ref, mask_ref, out_ref, raw, xring, sems):
        z = pl.program_id(0)

        @pl.when(z == 0)
        def _():
            # slot 2 is read (x plane z-1) before its first real fill;
            # zero it so stale VMEM (possibly NaN) never multiplies in
            xring[2] = jnp.zeros((3, ny, nx), f32)
            for k in range(3):
                dma(z_hbm, raw, sems, k, k).start()
            dma(z_hbm, raw, sems, 0, 0).wait()
            cache_rolls(raw, xring, 0)

        # prefetch plane z+2 first so its transfer overlaps this step's
        # compute; its slot's rolls were cached at step z-1
        @pl.when(jnp.logical_and(z > 0, z + 2 <= nz - 1))
        def _():
            dma(z_hbm, raw, sems, z + 2, (z + 2) % 3).start()

        @pl.when(z + 1 <= nz - 1)
        def _():
            dma(z_hbm, raw, sems, z + 1, (z + 1) % 3).wait()
            cache_rolls(raw, xring, (z + 1) % 3)

        acc = None
        for t, (dz, dy, dxi) in enumerate(taps):
            seg = xring[(z + dz) % 3, dxi]
            if dy != 0:
                seg = pltpu.roll(seg, (-dy) % ny, 0)
            term = vals_ref[0, t] * seg
            acc = term if acc is None else acc + term
        center = xring[z % 3, 1]
        out_ref[0] = jnp.where(mask_ref[0] > 0, center, acc)

    call = pl.pallas_call(
        kernel,
        grid=(nz,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, nt, ny, nx), lambda z: (z, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ny, nx), lambda z: (z, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ny, nx), lambda z: (z, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nz, ny, nx), f32),
        scratch_shapes=[
            pltpu.VMEM((3, ny, nx), f32),        # raw arrival ring
            pltpu.VMEM((3, 3, ny, nx), f32),     # lane-roll cache ring
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    @jax.jit
    def _run(z, vals, mgrid):
        zg = z.astype(f32).reshape(nz, ny, nx)
        out = call(zg, vals, mgrid)
        return out.reshape(-1).astype(z.dtype)

    def apply(z):
        # vals/mgrid as jit arguments (GB-scale captured constants break
        # the remote-compile relay)
        return _run(z, vals, mgrid)

    return apply


def try_plane_ell(ell, interpret=False):
    """Lower an EllMatrix to the plane-streamed kernel; None if it does
    not qualify (3D k=1, lane/sublane-aligned plane dims, and a per-step
    values block that fits VMEM)."""
    if ell.k != 1 or len(ell.dims) != 3:
        return None
    nx, ny, nz = ell.dims
    if not interpret:
        import jax
        if jax.config.jax_enable_x64:
            return None   # Pallas TPU has no f64; fp64 mode stays on XLA
        if nx % 128 != 0 or ny % 8 != 0:
            return None
        # per-step VMEM: vals block x2 (pipelining) + 12 cached planes
        if (2 * 27 + 12) * ny * nx * 4 > 100 * 1024 * 1024:
            return None
    return build_plane_ell_apply(ell.dims, ell.offsets, ell.values,
                                 ell.mask, interpret=interpret)
