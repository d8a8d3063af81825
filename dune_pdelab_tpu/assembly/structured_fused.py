"""Fused structured Q1 assembly: one Pallas pass for gather+quadrature+scatter.

The general (variable-coefficient) assembled-residual path is HBM-bound on
its materialized intermediates: the batched volume kernel streams (E, nqp)
values, (E, nqp, d) gradients and fluxes, and (E, nloc) local residuals
through HBM between fusions — measured 0.17-0.23 Gelem/s at 16.8M DOFs,
~250 floats/element of traffic (and the XLA qp-loop retry measured WORSE:
rematerialization, see gridoperator.py:143-155). This module collapses the
whole chain into one Pallas kernel over z/y tiles of the DOF lattice:

  * the (dy, dx) corner neighbors come from four XLA-built pre-shifted
    copies of the node grid, so every DMA slice is aligned and NO
    in-kernel rolls/unaligned slices exist (Mosaic's DMA slices on tiled
    axes must be 8/128-aligned, and roll-heavy kernel bodies hung the
    compiler),
  * the dz corner neighbor is a dim-0 slice (the major axis is untiled),
  * the quadrature loop runs entirely in VMEM (unrolled over qps; the
    qp-loop that loses in XLA wins here because the element data is
    on-chip), with coefficient fields A/b/c/f evaluated inline at the
    tile's quadrature points (traced into the kernel),
  * the kernel emits four element-indexed partial outputs (one per
    (dy, dx) corner group, z-resolved in-kernel); XLA applies the +1
    y/x scatter shifts outside as padded adds. Elements are computed
    exactly once in y/x; only the z halo is recomputed ((tz+1)/tz).

HBM traffic is ~17 floats/element (vs ~250 in the batched path) — a
~12 Gelem/s roofline at v5e bandwidth, above the qp-loop compute
ceiling, so the kernel stays compute-bound.

Scope (checked by make_*; None returned otherwise): single-leaf Q1 tensor
C0 space, 3D uniform non-periodic cube mesh, ConvectionDiffusionFEM volume
kernels (arbitrary spatially varying A/b/c/f — scalar, field, or tensor A),
no boundary/skeleton kernels (skip_boundary / pure-Dirichlet problems), no
selective-assembly masks, no affine (hanging-node) constraints.

Reference analog: the element loop of the default assembler
(dune/pdelab/gridoperator/default/assembler.hh:84-279) jointly with
convectiondiffusionfem.hh:63-138 — re-fused for the TPU memory hierarchy
instead of cache-blocked per element.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _qualifies(go, include_lambda):
    from dune_pdelab_tpu.ops.convectiondiffusion import ConvectionDiffusionFEM
    space = go.space
    if not getattr(space, "is_leaf", False) or go.nleaves != 1:
        return False
    fem, mesh = space.fem, space.mesh
    if (fem.continuity != "C0" or not hasattr(fem, "_mi")
            or fem.degree != 1 or mesh.dim != 3
            or mesh.geometry_type != "cube" or not mesh.uniform
            or any(mesh.periodic)):
        return False
    lop = go.lop
    if not isinstance(lop, ConvectionDiffusionFEM):
        return False
    # the kernel hard-codes the CD weak form; a subclass overriding the
    # volume terms would silently diverge
    if (type(lop).alpha_volume is not ConvectionDiffusionFEM.alpha_volume
            or type(lop).lambda_volume
            is not ConvectionDiffusionFEM.lambda_volume):
        return False
    if go.skel_groups or (go.bnd_groups and (
            go.has.get("alpha_boundary") or go.has.get("lambda_boundary"))):
        return False
    if getattr(go, "_sel_elem", None) is not None or go._qp_loop:
        return False
    if go.cg is not None and go.cg.has_affine:
        return False
    if include_lambda and not go.has.get("lambda_volume"):
        return False
    return True


def _build_core(go, time, include_lambda, interpret, tz, cy):
    """The unconstrained fused volume kernel: x (N,) -> r (N,).

    Mosaic-friendly tiling (the tunnel compiler hung on roll-heavy
    variants): NO in-kernel rolls or unaligned slices at all.

      * the (dy, dx) corner neighbors come from FOUR pre-shifted HBM
        copies of the node grid (u00, u01, u10, u11 = u shifted by one
        y/x node), built by XLA outside the kernel — every DMA slice is
        then (z-tile, aligned y-chunk, full x) at the SAME index,
      * the dz neighbor is a dim-0 slice (the major axis is untiled —
        offsets there are unconstrained),
      * the kernel emits FOUR element-indexed partial outputs S_g,
        g = (dy, dx): S_g[e] = sum_qp (corner-(:,dy,dx) test-function
        weights) at element e, z-resolved in-kernel; XLA applies the
        +dy/+dx scatter shifts outside (padded adds). Elements are
        computed exactly once in y/x (no halo redundancy); only the
        z halo is recomputed ((tz+1)/tz).

    Extra HBM traffic vs the ideal single-pass form: ~17 floats/element
    (4 shifted input builds + 4 partial outputs + the final combine) —
    a ~12 Gelem/s roofline at v5e bandwidth, far above the compute
    ceiling of the qp loop, so the scheme stays compute-bound.
    """
    space = go.space
    fem, mesh = space.fem, space.mesh
    problem = go.lop.set_time(time).problem
    nx, ny, nz = mesh.cells
    nx1, ny1, nz1 = space._dof_grid_dims
    vg = go.vol_geo
    tab = go._vol_tabs[0]
    phi = np.asarray(tab[0], np.float32)            # (nqp, 8)
    grad = np.asarray(tab[1][0], np.float32)        # (nqp, 8, 3)
    factor = np.asarray(vg.factor[0], np.float32)   # (nqp,)
    qp_off = np.asarray(vg.qp_phys_offset, np.float32)   # (nqp, 3)
    nqp = phi.shape[0]
    mi = np.asarray(fem._mi, np.int64)              # (8, 3) corner offsets
    lower = np.asarray(mesh.lower, np.float32)
    h = np.asarray(mesh.h, np.float32)
    ncorner = phi.shape[1]

    # coefficient shape classes, probed once on the host (static)
    xprobe = jnp.asarray(np.linspace(0.1, 0.9, 6).reshape(2, 3))
    A_kind = np.asarray(problem.A(xprobe)).ndim     # 0 scalar / 1 field / 3 tensor
    b_is_zero = not np.any(np.asarray(problem.b(xprobe)))
    c_is_zero = not np.any(np.asarray(problem.c(xprobe)))

    nxp = _round_up(nx1, 128)
    gz = -(-nz1 // tz)
    cy = max(8, _round_up(cy, 8))
    gy = -(-ny1 // cy)
    # trim trailing-chunk waste: smallest 8-multiple chunk covering ny1 in gy
    cy = _round_up(-(-ny1 // gy), 8)
    erz = tz + 1                      # element z-planes per program
    groups = ((0, 0), (0, 1), (1, 0), (1, 1))     # (dy, dx)

    def kernel(u00, u01, u10, u11, o00, o01, o10, o11,
               s00, s01, s10, s11, m0, m1, m2, m3):
        iz = pl.program_id(0)
        jy = pl.program_id(1)
        dmas = []
        for src, dst, sm in ((u00, s00, m0), (u01, s01, m1),
                             (u10, s10, m2), (u11, s11, m3)):
            dma = pltpu.make_async_copy(
                src.at[pl.ds(iz * tz, tz + 2), pl.ds(jy * cy, cy), :],
                dst, sm)
            dma.start()
            dmas.append(dma)
        for dma in dmas:
            dma.wait()
        slabs = {(0, 0): s00[:], (0, 1): s01[:],
                 (1, 0): s10[:], (1, 1): s11[:]}
        dt = slabs[0, 0].dtype

        # global element indices of this program's (erz, cy, nxp) elements
        lez = jax.lax.broadcasted_iota(jnp.int32, (erz, 1, 1), 0)
        ley = jax.lax.broadcasted_iota(jnp.int32, (1, cy, 1), 1)
        lex = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nxp), 2)
        ez = iz * tz - 1 + lez
        ey = jy * cy + ley
        valid = ((ez >= 0) & (ez < nz) & (ey < ny)
                 & (lex < nx)).astype(dt)          # (erz, cy, nxp)

        # element-origin coordinates, clamped so coefficient evaluation
        # stays inside the domain for masked halo/pad elements (a NaN at a
        # masked point would still poison the product with the 0 mask)
        ox = (jnp.clip(lex, 0, nx - 1).astype(dt) * h[0] + lower[0])
        oy = (jnp.clip(ey, 0, ny - 1).astype(dt) * h[1] + lower[1])
        oz = (jnp.clip(ez, 0, nz - 1).astype(dt) * h[2] + lower[2])

        # corner node values: element (lz, ly, lx) reads node
        # (lz+dz, ly+dy, lx+dx) = pre-shifted slab (dy,dx) at (lz+dz, ly, lx)
        W = [slabs[int(mi[a][1]), int(mi[a][0])][int(mi[a][2]):
                                                 int(mi[a][2]) + erz]
             for a in range(ncorner)]

        # z-resolved per-(dy,dx)-group node accumulators: owned node plane
        # t takes element planes t+1 (dz=0) and t (dz=1) of the local range
        S = {g: jnp.zeros((tz, cy, nxp), dt) for g in groups}
        for q in range(nqp):
            uq = None
            gu = [None, None, None]
            for a in range(ncorner):
                pw = float(phi[q, a])
                uq = pw * W[a] if uq is None else uq + pw * W[a]
                for d in range(3):
                    gw = float(grad[q, a, d])
                    if gw == 0.0:
                        continue
                    gu[d] = gw * W[a] if gu[d] is None else gu[d] + gw * W[a]
            gu = [g if g is not None else jnp.zeros_like(uq) for g in gu]

            xq = jnp.stack([ox + jnp.zeros_like(uq) + float(qp_off[q, 0]),
                            oy + jnp.zeros_like(uq) + float(qp_off[q, 1]),
                            oz + jnp.zeros_like(uq) + float(qp_off[q, 2])],
                           axis=-1)
            # flux = A grad u  (componentwise; the stacked xq/tensor
            # intermediates are slice-consumed and fold away in Mosaic)
            if A_kind == 0:
                Aq = problem.A(xq)
                flux = [jnp.asarray(Aq, dt) * g for g in gu]
            elif A_kind == 1:
                a_f = problem.A(xq).astype(dt)
                flux = [a_f * g for g in gu]
            else:
                At = problem.A(xq).astype(dt)
                flux = [sum(At[..., i, j] * gu[j] for j in range(3))
                        for i in range(3)]
            if not b_is_zero:
                bq = problem.b(xq).astype(dt)
                flux = [flux[d] - uq * bq[..., d] for d in range(3)]
            sval = None
            if not c_is_zero:
                cq = jnp.asarray(problem.c(xq), dt)
                sval = cq * uq
            if include_lambda:
                fq = jnp.asarray(problem.f(xq), dt)
                fq = jnp.zeros_like(uq) + fq
                sval = -fq if sval is None else sval - fq

            m = valid * float(factor[q])
            flux = [fd * m for fd in flux]
            if sval is not None:
                sval = sval * m
            for a in range(ncorner):
                contrib = None
                for d in range(3):
                    gw = float(grad[q, a, d])
                    if gw == 0.0:
                        continue
                    t = gw * flux[d]
                    contrib = t if contrib is None else contrib + t
                if sval is not None:
                    pw = float(phi[q, a])
                    t = pw * sval
                    contrib = t if contrib is None else contrib + t
                if contrib is None:
                    continue
                dz = int(mi[a][2])
                g = (int(mi[a][1]), int(mi[a][0]))
                S[g] = S[g] + contrib[1 - dz:1 - dz + tz]
        o00[:] = S[0, 0]
        o01[:] = S[0, 1]
        o10[:] = S[1, 0]
        o11[:] = S[1, 1]

    oshape = jax.ShapeDtypeStruct((gz * tz, gy * cy, nxp), jnp.float32)
    ospec = pl.BlockSpec((tz, cy, nxp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        out_shape=(oshape,) * 4,
        grid=(gz, gy),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=(ospec,) * 4,
        scratch_shapes=(
            [pltpu.VMEM((tz + 2, cy, nxp), jnp.float32)] * 4
            + [pltpu.SemaphoreType.DMA] * 4
        ),
        interpret=bool(interpret),
    )

    def core(x):
        dt = jnp.float32
        u = x.astype(dt).reshape(nz1, ny1, nx1)
        # one z halo plane each side; +1 extra y/x margin feeds the
        # pre-shifted copies; tails pad to tile multiples
        up = jnp.pad(u, ((1, gz * tz - nz1 + 1),
                         (0, gy * cy - ny1 + 1), (0, nxp - nx1 + 1)))
        # group key (dy, dx): u01 = x-shift, u10 = y-shift
        u00 = up[:, :gy * cy, :nxp]
        u01 = up[:, :gy * cy, 1:nxp + 1]
        u10 = up[:, 1:gy * cy + 1, :nxp]
        u11 = up[:, 1:gy * cy + 1, 1:nxp + 1]
        S00, S01, S10, S11 = call(u00, u01, u10, u11)
        # node (z, y, x) += S_(dy,dx)[z, y-dy, x-dx]: shift the element-
        # indexed partials forward and add (XLA fuses the pads into one pass)
        r = (S00
             + jnp.pad(S01, ((0, 0), (0, 0), (1, 0)))[:, :, :nxp]
             + jnp.pad(S10, ((0, 0), (1, 0), (0, 0)))[:, :gy * cy, :]
             + jnp.pad(S11, ((0, 0), (1, 0), (1, 0)))[:, :gy * cy, :nxp])
        return r[:nz1, :ny1, :nx1].reshape(-1).astype(x.dtype)

    return core


class _Missing:
    pass


def make_fused_residual(go, time=0.0, interpret=None, tz=4, cy=64):
    """Fused residual matching go.residual(x) (constrained rows zeroed).

    Returns a jitted callable or None when the operator does not qualify.
    """
    if not _qualifies(go, include_lambda=True):
        return None
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    core = _build_core(go, time, True, interpret, tz, cy)
    mask = go.cg.mask if go.cg is not None else None

    @jax.jit
    def apply(x):
        r = core(x)
        if mask is not None:
            r = jnp.where(mask, jnp.zeros((), r.dtype), r)
        return r

    return apply


def make_fused_japply(go, time=0.0, interpret=None, tz=4, cy=64):
    """Fused linear-operator apply matching go.jacobian_apply(0, z):
    y = mask ? z : A z with constrained columns zeroed. Linear LOPs only.
    This is the variable-coefficient matrix-free operator for the
    rediscretized-GMG hierarchy (linalg/gmg_varcoeff.py)."""
    if not getattr(go.lop, "is_linear", False):
        return None
    if not _qualifies(go, include_lambda=False):
        return None
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    core = _build_core(go, time, False, interpret, tz, cy)
    mask = go.cg.mask if go.cg is not None else None

    @jax.jit
    def apply(z):
        if mask is None:
            return core(z)
        zf = jnp.where(mask, jnp.zeros((), z.dtype), z)
        y = core(zf)
        return jnp.where(mask, z, y)

    return apply
