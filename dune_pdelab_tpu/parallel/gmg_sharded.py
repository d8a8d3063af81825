"""Sharded stencil-resident geometric multigrid: the north-star solver
(linalg/gmg_lattice.LatticeGMG) distributed over a device mesh.

Round-4 verdict item 5: BASELINE's north-star hardware is v5p-8 (eight
chips) and the reference's scalable solve is parallel AMG over distributed
index sets (reference: dune/pdelab/backend/istl/novlpistlsolverbackend.hh:
330-1128 + parallelhelper.hh:273-440).  The TPU-native composition:

  * every level's operator application (the smoother/residual hot path)
    goes through `DofShardedStencil` (parallel/dofsharded.py) — lattice
    decomposition over a 1D/2D device mesh, k halo planes per sharded axis
    per apply via `lax.ppermute`, the measured 108x lattice fast path;
  * vectors live as zero-padded grid-shaped sharded arrays; padded rows
    are zero throughout, so Krylov dots (XLA-inserted `psum`) match the
    sequential arithmetic exactly;
  * inter-level transfers along SHARDED axes are neighbor-local too: level
    paddings are chosen with 2:1 alignment (padded_f = 2 * padded_c per
    sharded axis), so restriction needs one fine halo plane and
    prolongation one coarse halo plane — a single `ppermute` each, no
    all-gathers on the fine levels.  (Q1 transfers are translation-
    invariant with zero extension: [1/2, 1, 1/2] / its transpose — exact
    equality with the clipped boundary maps because all boundary rows are
    Dirichlet-masked and clipped entries hit zero-padded rows.)
  * levels coarser than `gather_below` DOFs are replicated ("coarse levels
    gathered"): one `with_sharding_constraint` to replicated at the switch,
    then the sequential LatticeGMG level logic runs unchanged on every
    device redundantly — cheaper than communicating V-cycles on lattices
    that fit in a single core's VMEM.

Iteration parity with the sequential solver is exact by construction
(same stencil weights, same transfer weights, same Chebyshev scalars);
`tests/test_gmg_sharded.py` asserts it and MULTICHIP dryrun mode runs
64^3 GMG-CG on the virtual 8-device mesh.

Scope: the LatticeGMG contract, plus k == 1 (Q1) for sharded-axis
transfers — Qk lattices still work but transfer through a replicated
constraint (documented fallback) rather than neighbor permutes.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from dune_pdelab_tpu.linalg.gmg_lattice import LatticeGMG
from dune_pdelab_tpu.linalg.multigrid import _transfer_1d  # noqa: F401
from dune_pdelab_tpu.parallel.dofsharded import DofShardedStencil, _ceil_to


def _axis_apply_np(g, idx, w, axis):
    taken = jnp.take(g, jnp.asarray(idx), axis=axis)
    wshape = [1] * taken.ndim
    wshape[axis] = idx.shape[0]
    wshape[axis + 1] = idx.shape[1]
    return jnp.sum(taken * jnp.asarray(w, g.dtype).reshape(wshape),
                   axis=axis + 1)


def _slice_axis(x, sl, axis):
    idx = [slice(None)] * x.ndim
    idx[axis] = sl
    return x[tuple(idx)]


class ShardedLatticeGMG:
    """Distributed V-cycle + GMG-preconditioned CG over a device mesh.

    Parameters
    ----------
    gmg : a built sequential `LatticeGMG` (its stencils/transfers/lmax are
        the single source of truth — parity is by construction).
    devices, mesh_shape, axis_names : as DofShardedStencil (default: 1D
        mesh over the slowest lattice axis with all of jax.devices()).
    gather_below : levels with fewer DOFs than this are replicated.
    """

    def __init__(self, gmg: LatticeGMG, devices=None, mesh_shape=None,
                 axis_names=("sz", "sy"), gather_below=32**3):
        self.seq = gmg
        devices = list(devices) if devices is not None else jax.devices()
        if mesh_shape is None:
            mesh_shape = (len(devices),)
        self.mesh_shape = tuple(mesh_shape)
        nshard_axes = len(self.mesh_shape)
        k = gmg.stencils[0].k

        # how many fine levels stay sharded: big enough AND shardable
        n_sharded = 0
        for l, dims in enumerate(gmg.dims):
            n = int(np.prod(dims))
            grid = tuple(reversed(dims))
            ok = n >= gather_below and all(
                grid[a] >= nd_a for a, nd_a in enumerate(self.mesh_shape))
            if not ok:
                break
            n_sharded = l + 1
        # the coarsest (dense-LU) level always runs replicated
        n_sharded = min(n_sharded, gmg.nlevels - 1)
        if n_sharded == 0:
            raise ValueError(
                f"no level above gather_below={gather_below}; use the "
                "sequential LatticeGMG")
        self.n_sharded = n_sharded
        self.k = k
        # k == 1: neighbor-local sharded-axis transfers (2:1 aligned
        # padding). k > 1: transfers go through a replicated constraint.
        self.local_transfers = (k == 1)

        # 2:1-aligned padded shapes, coarsest sharded level up
        padded = [None] * n_sharded
        coarsest = n_sharded - 1
        grid_c = tuple(reversed(gmg.dims[coarsest]))
        pc = [_ceil_to(grid_c[a], nd_a * k)
              for a, nd_a in enumerate(self.mesh_shape)]
        padded[coarsest] = tuple(pc)
        for l in range(coarsest - 1, -1, -1):
            padded[l] = tuple(2 * p for p in padded[l + 1])

        self.sstencils = []
        for l in range(n_sharded):
            self.sstencils.append(DofShardedStencil(
                gmg.stencils[l], devices=devices, mesh_shape=mesh_shape,
                axis_names=axis_names,
                padded_shape=padded[l] if self.local_transfers else None))
        self.device_mesh = self.sstencils[0].device_mesh
        self.axis_names = self.sstencils[0].axis_names
        self.repl_sharding = NamedSharding(self.device_mesh, P())

        # padded grid diagonals (1.0 on masked/padded rows)
        self.dinv_grid = []
        for l in range(n_sharded):
            st = gmg.stencils[l]
            sst = self.sstencils[l]
            d = np.asarray(st.diagonal(jnp.float32)).reshape(sst.grid_shape)
            d = np.pad(d, [(0, p) for p in sst.pad_amount],
                       constant_values=1.0)
            self.dinv_grid.append(jax.device_put(
                jnp.asarray(1.0 / d), sst.sharding))
        self._vcycle_jit = None
        self._host_steps = None

    # -- flat <-> sharded ----------------------------------------------------
    def device_put(self, x_flat):
        return self.sstencils[0].device_put(x_flat)

    def gather(self, xg):
        return self.sstencils[0].gather(xg)

    # -- sharded-axis 2:1 transfers (k == 1) ---------------------------------
    def _halo_plane(self, x, axis, name, nd, forward):
        """One neighbor plane along `axis` (zeros at the chain end)."""
        if nd == 1:
            shp = list(x.shape)
            shp[axis] = 1
            return jnp.zeros(shp, x.dtype)
        pairs = ([(i, i + 1) for i in range(nd - 1)] if forward
                 else [(i + 1, i) for i in range(nd - 1)])
        plane = (_slice_axis(x, slice(-1, None), axis) if forward
                 else _slice_axis(x, slice(0, 1), axis))
        return lax.ppermute(plane, name, pairs)

    def _restrict_sharded(self, l, res):
        """fine sharded grid (level l) -> level l+1 sharded grid, both
        sharded, neighbor-local ([1/2, 1, 1/2]^T per sharded axis)."""
        sst_f, sst_c = self.sstencils[l], self.sstencils[l + 1]
        seq = self.seq
        dim = len(seq.dims[l])

        def local(g):
            # sharded axes: halo-extend by 1, strided combine
            for a, (name, nd) in enumerate(zip(self.axis_names,
                                               self.mesh_shape)):
                lo = self._halo_plane(g, a, name, nd, forward=True)
                hi = self._halo_plane(g, a, name, nd, forward=False)
                ext = jnp.concatenate([lo, g, hi], axis=a)
                n2 = g.shape[a]                      # = 2 * Lc
                g = (_slice_axis(ext, slice(1, n2, 2), a)
                     + 0.5 * (_slice_axis(ext, slice(0, n2, 2), a)
                              + _slice_axis(ext, slice(2, n2 + 2, 2), a)))
            # unsharded axes: exact sequential restriction maps, then
            # clip masked fine halo contributions exactly like the global
            # form (identical maps => identical arithmetic)
            for d in range(dim):
                ax = dim - 1 - d
                if ax < len(self.mesh_shape):
                    continue
                _, _, ridx, rw = seq.transfers[l][d]
                g = _axis_apply_np(g, ridx, rw, ax)
            return g

        return jax.shard_map(local, mesh=self.device_mesh,
                             in_specs=sst_f.pspec,
                             out_specs=sst_c.pspec)(res)

    def _prolong_sharded(self, l, zc):
        """level l+1 sharded grid -> fine level l sharded grid."""
        sst_f, sst_c = self.sstencils[l], self.sstencils[l + 1]
        seq = self.seq
        dim = len(seq.dims[l])

        def local(g):
            for a, (name, nd) in enumerate(zip(self.axis_names,
                                               self.mesh_shape)):
                nxt = self._halo_plane(g, a, name, nd, forward=False)
                ext = jnp.concatenate([g, nxt], axis=a)   # (Lc+1, ...)
                Lc = g.shape[a]
                even = _slice_axis(ext, slice(0, Lc), a)
                odd = 0.5 * (even + _slice_axis(ext, slice(1, Lc + 1), a))
                # interleave even/odd along axis a -> 2*Lc
                st = jnp.stack([even, odd], axis=a + 1)
                shp = list(even.shape)
                shp[a] = 2 * Lc
                g = st.reshape(shp)
            for d in range(dim):
                ax = dim - 1 - d
                if ax < len(self.mesh_shape):
                    continue
                idx, w, _, _ = seq.transfers[l][d]
                g = _axis_apply_np(g, idx, w, ax)
            return g

        return jax.shard_map(local, mesh=self.device_mesh,
                             in_specs=sst_c.pspec,
                             out_specs=sst_f.pspec)(zc)

    # -- gather-switch transfers ---------------------------------------------
    def _to_flat_replicated(self, l, g):
        """strip level-l padding, return flat replicated vector."""
        sst = self.sstencils[l]
        g = lax.with_sharding_constraint(g, self.repl_sharding)
        sl = tuple(slice(0, n) for n in sst.grid_shape)
        return g[sl].reshape(-1)

    def _from_flat_replicated(self, l, x):
        sst = self.sstencils[l]
        g = x.reshape(sst.grid_shape)
        g = jnp.pad(g, [(0, p) for p in sst.pad_amount])
        return lax.with_sharding_constraint(g, sst.sharding)

    # -- sharded smoother (mirrors LatticeGMG._smooth on grid arrays) --------
    def _smooth(self, l, z, r, steps):
        seq = self.seq
        sst = self.sstencils[l]
        mask = sst.mask_grid
        dinv = self.dinv_grid[l].astype(r.dtype)
        if seq.smoother == "jacobi":
            for _ in range(steps):
                z = z + seq.omega * dinv * (r - sst._apply_impl(z))
                z = jnp.where(mask, r, z)
            return z
        lmax = seq.lmax[l]
        lmin = lmax / 4.0
        theta = 0.5 * (lmax + lmin)
        delta = 0.5 * (lmax - lmin)
        sigma = theta / delta
        res = r - sst._apply_impl(z)
        d = (1.0 / theta) * (dinv * res)
        z = jnp.where(mask, r, z + d)
        rho = 1.0 / sigma
        for _ in range(steps - 1):
            res = r - sst._apply_impl(z)
            rho_new = 1.0 / (2.0 * sigma - rho)
            d = (rho_new * rho) * d + (2.0 * rho_new / delta) * (dinv * res)
            z = jnp.where(mask, r, z + d)
            rho = rho_new
        return z

    # -- V-cycle ---------------------------------------------------------------
    def _vcycle(self, l, r):
        seq = self.seq
        if l >= self.n_sharded:
            return seq._vcycle(l, r)        # replicated, sequential logic
        sst = self.sstencils[l]
        z = self._smooth(l, jnp.zeros_like(r), r, seq.pre)
        res = r - sst._apply_impl(z)
        to_sharded = (l + 1 < self.n_sharded)
        if to_sharded and self.local_transfers:
            rc = self._restrict_sharded(l, res)
            maskc = self.sstencils[l + 1].mask_grid
        else:
            # gather switch (or k > 1 fallback): replicated transfer via
            # the sequential maps
            res_f = self._to_flat_replicated(l, res)
            rc = seq._restrict(l, res_f)
            if to_sharded:
                rc = self._from_flat_replicated(l + 1, rc)
                maskc = self.sstencils[l + 1].mask_grid
            else:
                maskc = seq.stencils[l + 1].mask
        rc = jnp.where(maskc, 0.0, rc)
        zc = self._vcycle(l + 1, rc)
        if to_sharded and self.local_transfers:
            corr = self._prolong_sharded(l, zc)
        else:
            zc_f = zc if not to_sharded else self._to_flat_replicated(
                l + 1, zc)
            corr = seq._prolong(l, zc_f)
            corr = self._from_flat_replicated(l, corr)
        z = z + jnp.where(sst.mask_grid, 0.0, corr)
        return self._smooth(l, z, r, seq.post)

    def apply(self, rg):
        """One V-cycle on a sharded grid vector."""
        if self._vcycle_jit is None:
            self._vcycle_jit = jax.jit(lambda rr: self._vcycle(0, rr))
        return self._vcycle_jit(rg)

    def apply_flat(self, r_flat):
        return self.gather(self.apply(self.device_put(r_flat)))

    # -- host-loop GMG-CG (LatticeGMG.solve_host semantics, sharded) ---------
    def solve_host(self, b, tol=1e-8, atol=0.0, maxiter=200, history=False):
        sst = self.sstencils[0]
        if self._host_steps is None:
            @jax.jit
            def update(x, r, p, q, rho):
                alpha = rho / jnp.vdot(p, q)
                x = x + alpha * p
                r = r - alpha * q
                return x, r, jnp.linalg.norm(r)

            @jax.jit
            def direction(r, z, p, rho):
                rho_new = jnp.vdot(r, z)
                p = z + (rho_new / rho) * p
                return p, rho_new

            self._host_steps = (update, direction)
        update, direction = self._host_steps

        bg = b if hasattr(b, "sharding") and b.ndim > 1 else self.device_put(b)
        x = jnp.zeros_like(bg)
        r = bg
        defect0 = float(jnp.linalg.norm(r))
        target = max(tol * defect0, atol)
        z = self.apply(r)
        p = z
        rho = jnp.vdot(r, z)
        defect = defect0
        hist = [defect0]
        it = 0
        while defect > target and it < maxiter:
            q = sst(p)
            x, r, dnorm = update(x, r, p, q, rho)
            defect = float(dnorm)
            hist.append(defect)
            it += 1
            if defect <= target:
                break
            z = self.apply(r)
            p, rho = direction(r, z, p, rho)
        true_defect = float(jnp.linalg.norm(bg - sst(x)))
        info = {
            "iterations": it,
            "converged": defect <= target,
            "defect0": defect0,
            "defect": defect,
            "true_defect": true_defect,
        }
        if history:
            info["history"] = hist
        return x, info
