"""Variable-coefficient geometric multigrid on structured Q1 lattices.

Removes LatticeGMG's "translation-invariant operator" restriction
(gmg_lattice.py:34-38): level operators are REDISCRETIZED — a GridOperator
is built per level on the 2x-coarsened mesh and the analytic coefficient
fields A(x)/b(x)/c(x) are re-evaluated at the level's quadrature points —
and applied matrix-free through the fused Pallas assembly kernel
(assembly/structured_fused.make_fused_japply; the batched jvp path on CPU).
Nothing at any level stores a matrix: the hierarchy is O(1) memory beyond
the DOF vectors, like LatticeGMG, but valid for any spatially varying
coefficients the Q1 CD kernel supports.

Per-level smoother data comes from 27 residue-comb probes of the level
operator: a comb with unit spikes on the (i mod 3 == s) sublattice isolates,
for every row i, exactly one stencil entry A[i, j_s(i)] (reach-1 coupling,
spacing-3 spikes). Summing |y_s| over the 27 combs gives exact per-row
Gershgorin sums, and the s = (i mod 3) entries give the exact diagonal —
so Chebyshev gets a rigorous lambda_max(D^-1 A) bound without power
iteration, at 27 operator applies per level (milliseconds each).

The cycle/smoother/solver logic is inherited from LatticeGMG unchanged;
only the level-operator construction differs (stencils -> rediscretized
fused operators).

Validity: single-leaf Q1 C0 space, 3D uniform non-periodic cube mesh with
even cell counts per level, linear ConvectionDiffusionFEM volume kernels,
fully Dirichlet boundary. Rediscretization (vs Galerkin RAP) is the
classical choice for smoothly varying coefficients; for rough coefficients
expect iteration growth (the reference's answer there is AMG, linalg/amg.py).

Reference analog: ISTLBackend_SEQ_CG_AMG_SSOR solves any assembled operator
at scale (dune/pdelab/backend/istl/seqistlsolverbackend.hh:983); on a
structured mesh with analytic coefficients the rediscretized geometric
hierarchy replaces the algebraic one.
"""
from __future__ import annotations

import itertools

import numpy as np
import jax
import jax.numpy as jnp

from dune_pdelab_tpu.linalg.gmg_lattice import (
    LatticeGMG, _transpose_transfer_1d)
from dune_pdelab_tpu.linalg.multigrid import _transfer_1d


class _FusedLevelOp:
    """Level operator adapter with the StencilOperator protocol pieces the
    inherited V-cycle uses: __call__(z), .mask, .diagonal(dtype)."""

    def __init__(self, apply_fn, mask, diag):
        self._apply = apply_fn
        self.mask = mask
        self._diag = diag

    def __call__(self, z):
        return self._apply(z)

    def diagonal(self, dtype=None):
        return self._diag.astype(dtype or self._diag.dtype)


def _probe_gershgorin(apply_fn, dims, dtype=jnp.float32):
    """Exact diagonal + per-row Gershgorin ratio of a reach-1 lattice
    operator via 27 residue combs. Returns (diag, lmax_bound)."""
    dim = len(dims)
    rev = tuple(reversed(dims))
    axes_iota = [
        jax.lax.broadcasted_iota(jnp.int32, rev, dim - 1 - d) % 3
        for d in range(dim)
    ]

    @jax.jit
    def probe_step(s, abs_acc, diag_acc):
        comb = jnp.ones(rev, jnp.bool_)
        for d in range(dim):
            comb = comb & (axes_iota[d] == s[d])
        comb = comb.reshape(-1).astype(dtype)
        y = apply_fn(comb)
        return abs_acc + jnp.abs(y), diag_acc + comb * y

    abs_acc = jnp.zeros(int(np.prod(dims)), dtype)
    diag_acc = jnp.zeros(int(np.prod(dims)), dtype)
    for s in itertools.product(range(3), repeat=dim):
        abs_acc, diag_acc = probe_step(jnp.asarray(s, jnp.int32),
                                       abs_acc, diag_acc)
    lmax = float(jnp.max(abs_acc / jnp.abs(diag_acc)))
    return diag_acc, lmax


class VarCoeffGMG(LatticeGMG):
    """Rediscretized matrix-free GMG: LatticeGMG semantics (apply/solve_host/
    make_solver) for variable-coefficient Q1 operators."""

    def __init__(self, go, *, pre=2, post=2, smoother="chebyshev",
                 omega=0.8, coarsest_cells=4, cycle="v", interpret=None):
        from dune_pdelab_tpu.assembly.gridoperator import GridOperator
        from dune_pdelab_tpu.assembly.structured_fused import (
            make_fused_japply)
        from dune_pdelab_tpu.constraints.dirichlet import (
            constraints as make_constraints)
        from dune_pdelab_tpu.space.space import FunctionSpace

        space = go.space
        mesh, fem = space.mesh, space.fem
        if fem.degree != 1:
            raise ValueError("VarCoeffGMG is Q1-only (the fused kernel "
                             "contract); use LatticeGMG for invariant Qk")
        if any(mesh.periodic) or not mesh.uniform:
            raise ValueError("VarCoeffGMG requires a uniform non-periodic "
                             "structured mesh")
        if go.cg is None:
            raise ValueError("VarCoeffGMG requires Dirichlet constraints")
        from dune_pdelab_tpu.space.space import _leaf_boundary_dof_mask
        bmask = _leaf_boundary_dof_mask(space)
        if not np.all(go.cg.mask_np[np.nonzero(bmask)[0]]):
            raise ValueError("VarCoeffGMG requires a fully Dirichlet "
                             "boundary (coarse levels impose it)")
        self.pre, self.post = pre, post
        self.omega = omega
        self.cycle = cycle
        self.smoother = smoother

        meshes = [mesh]
        while True:
            m = meshes[-1]
            if any(c % 2 or c < 2 * coarsest_cells for c in m.cells):
                break
            meshes.append(m.coarsen(2))
        if len(meshes) < 2:
            raise ValueError(f"mesh {mesh.cells} supports no coarsening")
        self.meshes = meshes
        self.dims = [tuple(c + 1 for c in m.cells) for m in meshes]

        lop = go.lop
        gos = [go]
        for m in meshes[1:]:
            Vl = FunctionSpace(m, fem)
            gos.append(GridOperator(Vl, lop,
                                    constraints=make_constraints(True, Vl),
                                    quad_order=go.qorder,
                                    skip_boundary=True))
        self.level_gos = gos

        self.stencils = []
        self.lmax = []
        for l, gol in enumerate(gos):
            fused = make_fused_japply(gol, interpret=interpret)
            if fused is None:
                # CPU / non-qualifying fallback: the batched jvp operator
                x0 = jnp.zeros(gol.space.ndofs, jnp.float32)
                golc = gol

                def fused(z, _go=golc, _x0=x0):
                    return _go.jacobian_apply(_x0, z)
            diag, lmax = _probe_gershgorin(fused, self.dims[l])
            self.stencils.append(
                _FusedLevelOp(fused, gol.cg.mask, diag))
            self.lmax.append(lmax)

        self.transfers = []
        for l in range(len(meshes) - 1):
            per_axis = []
            for d in range(mesh.dim):
                idx, w, nfd, ncd = _transfer_1d(1, meshes[l + 1].cells[d],
                                                False)
                assert nfd == self.dims[l][d] and ncd == self.dims[l + 1][d]
                ridx, rw = _transpose_transfer_1d(idx, w, ncd)
                per_axis.append((idx.astype(np.int32), w, ridx, rw))
            self.transfers.append(per_axis)

        # coarsest level: dense LU of the assembled coarse operator
        goc = gos[-1]
        Ac = np.asarray(
            goc.jacobian(jnp.zeros(goc.space.ndofs)).todense())
        import scipy.linalg as sla
        lu, piv = sla.lu_factor(Ac)
        self._coarse_lu = (np.asarray(lu), piv.astype(np.int32))
        self._vcycle_jit = None
        self._host_steps = None
