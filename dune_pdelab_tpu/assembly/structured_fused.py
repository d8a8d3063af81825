"""Fused structured Q1 assembly: one Pallas pass for gather+quadrature+scatter.

The general (variable-coefficient) assembled-residual path is HBM-bound on
its materialized intermediates: the batched volume kernel streams (E, nqp)
values, (E, nqp, d) gradients and fluxes, and (E, nloc) local residuals
through HBM between fusions — measured 0.17-0.23 Gelem/s at 16.8M DOFs,
~250 floats/element of traffic (and the XLA qp-loop retry measured WORSE:
rematerialization, see gridoperator.py:143-155). This module collapses the
whole chain into one Pallas kernel over z/y tiles of the DOF lattice:

  * the tile's node values are DMA'd to VMEM once (one-element halo),
  * the 2^d corner gathers are static shifted VMEM slices,
  * the quadrature loop runs entirely in VMEM (unrolled over qps; the
    qp-loop that loses in XLA wins here because the element data is
    on-chip), with coefficient fields A/b/c/f evaluated inline at the
    tile's quadrature points (traced into the kernel),
  * the 2^d scatter-adds are static shifted VMEM slices into the owned
    output tile — tiles own disjoint node ranges, halo elements are
    recomputed by both neighbors (~(1+1/tz)(1+1/ty) redundancy).

HBM traffic is ~1 read + 1 write of the DOF vector (+halo) — the
speed-of-light form of FEM assembly on TPU.

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


def _build_core(go, time, include_lambda, interpret, tz, ty):
    """The unconstrained fused volume kernel: x (N,) -> r (N,)."""
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

    # coefficient shape classes, probed once on the host (static)
    xprobe = jnp.asarray(np.linspace(0.1, 0.9, 6).reshape(2, 3))
    A_kind = np.asarray(problem.A(xprobe)).ndim     # 0 scalar / 1 field / 3 tensor
    b_is_zero = not np.any(np.asarray(problem.b(xprobe)))
    c_is_zero = not np.any(np.asarray(problem.c(xprobe)))

    nxp = _round_up(nx1, 128)
    gz, gy = -(-nz1 // tz), -(-ny1 // ty)
    erows_z, erows_y = tz + 1, ty + 1

    def kernel(up_ref, out_ref, slab_ref, sem):
        # overlapping (tz+2, ty+2) halo slabs cannot be expressed as
        # BlockSpec blocks (index maps are in block-shape units); the
        # padded node grid stays in HBM (ANY) and each program DMAs its
        # slab into VMEM scratch — the stencil_pallas.py pattern.
        iz = pl.program_id(0)
        jy = pl.program_id(1)
        dma = pltpu.make_async_copy(
            up_ref.at[pl.ds(iz * tz, tz + 2), pl.ds(jy * ty, ty + 2), :],
            slab_ref, sem)
        dma.start()
        dma.wait()
        slab = slab_ref[:]
        dt = slab.dtype

        # global element indices of the tile's (tz+1, ty+1, nxp) elements
        lez = jax.lax.broadcasted_iota(jnp.int32, (erows_z, 1, 1), 0)
        ley = jax.lax.broadcasted_iota(jnp.int32, (1, erows_y, 1), 1)
        lex = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nxp), 2)
        ez = iz * tz - 1 + lez
        ey = jy * ty - 1 + ley
        valid = ((ez >= 0) & (ez < nz) & (ey >= 0) & (ey < ny)
                 & (lex < nx)).astype(dt)          # (tz+1, ty+1, nxp)

        # element-origin coordinates, clamped so coefficient evaluation
        # stays inside the domain for masked halo/pad elements (a NaN at a
        # masked point would still poison the product with the 0 mask)
        ox = (jnp.clip(lex, 0, nx - 1).astype(dt) * h[0] + lower[0])
        oy = (jnp.clip(ey, 0, ny - 1).astype(dt) * h[1] + lower[1])
        oz = (jnp.clip(ez, 0, nz - 1).astype(dt) * h[2] + lower[2])

        # corner node values: static shifted slices of the VMEM slab;
        # dx=1 is a lane roll (the wrapped last column is always masked)
        def corner(dz, dy, dx):
            w = slab[dz:dz + erows_z, dy:dy + erows_y, :]
            if dx:
                # pltpu.roll wants non-negative shifts: -1 == nxp-1 circular
                w = pltpu.roll(w, nxp - 1, 2) if not interpret else jnp.roll(
                    w, -1, 2)
            return w

        W = [corner(int(mi[a][2]), int(mi[a][1]), int(mi[a][0]))
             for a in range(phi.shape[1])]

        racc = [jnp.zeros((erows_z, erows_y, nxp), dt)
                for _ in range(phi.shape[1])]
        for q in range(nqp):
            uq = None
            gu = [None, None, None]
            for a in range(phi.shape[1]):
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

            fq_fac = float(factor[q])
            m = valid * fq_fac
            flux = [fd * m for fd in flux]
            if sval is not None:
                sval = sval * m
            for a in range(phi.shape[1]):
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
                if contrib is not None:
                    racc[a] = racc[a] + contrib

        # scatter: node (oz', oy') takes corner-a contributions from the
        # element at (oz'-dz, oy'-dy) -> static slice + forward lane roll
        out = jnp.zeros((tz, ty, nxp), dt)
        for a in range(phi.shape[1]):
            dz, dy, dx = int(mi[a][2]), int(mi[a][1]), int(mi[a][0])
            piece = racc[a][1 - dz:1 - dz + tz, 1 - dy:1 - dy + ty, :]
            if dx:
                piece = pltpu.roll(piece, 1, 2) if not interpret else \
                    jnp.roll(piece, 1, 2)
            out = out + piece
        out_ref[:] = out

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((gz * tz, gy * ty, nxp), jnp.float32),
        grid=(gz, gy),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((tz, ty, nxp), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tz + 2, ty + 2, nxp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=bool(interpret),
    )

    def core(x):
        dt = jnp.float32
        u = x.astype(dt).reshape(nz1, ny1, nx1)
        # pad: one halo node in z/y (so tile -1/+1 reads are in-bounds),
        # plus tile-multiple tails; x pads to the 128-lane multiple
        up = jnp.pad(u, ((1, gz * tz - nz1 + 1), (1, gy * ty - ny1 + 1),
                         (0, nxp - nx1)))
        r = call(up)
        return r[:nz1, :ny1, :nx1].reshape(-1).astype(x.dtype)

    return core


class _Missing:
    pass


def make_fused_residual(go, time=0.0, interpret=None, tz=8, ty=8):
    """Fused residual matching go.residual(x) (constrained rows zeroed).

    Returns a jitted callable or None when the operator does not qualify.
    """
    if not _qualifies(go, include_lambda=True):
        return None
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    core = _build_core(go, time, True, interpret, tz, ty)
    mask = go.cg.mask if go.cg is not None else None

    @jax.jit
    def apply(x):
        r = core(x)
        if mask is not None:
            r = jnp.where(mask, jnp.zeros((), r.dtype), r)
        return r

    return apply


def make_fused_japply(go, time=0.0, interpret=None, tz=8, ty=8):
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
    core = _build_core(go, time, False, interpret, tz, ty)
    mask = go.cg.mask if go.cg is not None else None

    @jax.jit
    def apply(z):
        if mask is None:
            return core(z)
        zf = jnp.where(mask, jnp.zeros((), z.dtype), z)
        y = core(zf)
        return jnp.where(mask, z, y)

    return apply
