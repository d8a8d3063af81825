"""Nonoverlapping sharded assembly: DOF-sharded vectors + border exchange.

TPU-native analog of the reference's nonoverlapping parallel backends
(reference: dune/pdelab/backend/istl/novlpistlsolverbackend.hh:96 SpMV with
border add-exchange; gridoperator/common/borderdofexchanger.hh:498). This is
the lattice-specialized fast path (contiguous-slab halos on the global index
order); the general path for arbitrary meshes/spaces/device meshes is
parallel/windowed.py. Here the DOF vector is sharded in equal contiguous
blocks over a 1D device mesh and ALL communication is nearest-neighbor:

  * gathers read from a halo-extended local block built with two
    `lax.ppermute`s of H rows each (H = the widest cross-block coupling,
    computed statically from the dof maps);
  * each shard assembles only entities assigned to it (assignment by dof
    locality, so couplings stay within the halo) and scatters into its
    extended block;
  * the H-row overlap regions are then ppermuted back and added — the
    AddDataHandle border-sum analog, but sized H instead of N.

Works for any local operator the sequential GridOperator handles (CG, DG
skeleton/boundary terms, systems), because it reuses the same batched
kernels and tabulations — only gather/scatter indices are localized.

Krylov dots on the block-sharded vectors are plain vdots; XLA inserts the
psum (the nonoverlapping scalar-product analog, reference:
novlpistlsolverbackend.hh:46-90 — no owner masking needed because blocks
are disjoint by construction).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dune_pdelab_tpu.parallel.sharded import ShardedContextMixin


def _assign_localize(index_arrays, aux_arrays, owner, ndev, B, H):
    """Group entity rows by owning shard and localize dof indices.

    index_arrays: list of (E, nloc) global dof maps (localized by the
    owner's window start d*B - H); aux_arrays: carried along unlocalized.
    Each shard is padded to the max per-shard count with repeats of its own
    first entry, mask 0 on padding. Returns (local_idx, aux, mask) with
    leading shape (ndev * Emax, ...).
    """
    E = owner.shape[0]
    counts = np.bincount(owner, minlength=ndev)
    Emax = max(int(counts.max()), 1)
    W = B + 2 * H
    mask = np.zeros((ndev, Emax))
    loc = [np.zeros((ndev, Emax) + a.shape[1:], np.int32)
           for a in index_arrays]
    aux = [np.zeros((ndev, Emax) + a.shape[1:], a.dtype) for a in aux_arrays]
    for d in range(ndev):
        idx = np.nonzero(owner == d)[0]
        c = len(idx)
        mask[d, :c] = 1.0
        if c == 0:
            continue
        start = d * B - H
        for o, a in zip(loc, index_arrays):
            m = np.asarray(a[idx], np.int64) - start
            if m.min() < 0 or m.max() >= W:
                raise ValueError(
                    f"coupling wider than halo H={H} on shard {d}")
            o[d, :c] = m
            o[d, c:] = m[0]
        for o, a in zip(aux, aux_arrays):
            o[d, :c] = a[idx]
            o[d, c:] = a[idx[0]]
    flat = lambda a: jnp.asarray(a.reshape((-1,) + a.shape[2:]))
    return ([flat(o) for o in loc], [flat(o) for o in aux],
            flat(mask))


class NonoverlappingShardedGridOperator(ShardedContextMixin):
    """GridOperator with block-sharded DOF vectors and halo-only comm.

    API subset: residual / jacobian_apply (flat (N,) in/out, resharded at
    the boundary) plus padded-sharded variants for use inside Krylov loops
    (device_put / gather / residual_padded / jacobian_apply_padded).
    jacobian_diagonal delegates to the sequential operator — it is a
    setup-phase quantity (probing), not a per-iteration one.
    """

    def __init__(self, go, devices=None, axis_name="blk"):
        if not go.mesh.uniform:
            raise NotImplementedError("sharded assembly requires a uniform mesh")
        self.go = go
        devices = list(devices) if devices is not None else jax.devices()
        self.ndev = len(devices)
        self.device_mesh = Mesh(np.asarray(devices), (axis_name,))
        self.axis_name = axis_name
        self.cg = go.cg
        N = go.space.ndofs
        self.N = N
        B = -(-N // self.ndev)
        self.B = B

        # -- entity -> shard assignment by dof-range center ------------------
        def owner_of(maps):
            mn = np.min([m.min(axis=1) for m in maps], axis=0)
            mx = np.max([m.max(axis=1) for m in maps], axis=0)
            own = ((mn + mx) // 2) // B
            return np.clip(own, 0, self.ndev - 1), mn, mx

        def halo_need(own, mn, mx):
            lo = np.maximum(own * B - mn, 0)
            hi = np.maximum(mx - (own + 1) * B + 1, 0)
            return int(max(lo.max(initial=0), hi.max(initial=0)))

        vol_maps = [np.asarray(m) for m in go.leaf_dofs]
        vown, vmn, vmx = owner_of(vol_maps)
        H = halo_need(vown, vmn, vmx)
        bnd_assign = []
        for g in go.bnd_groups:
            maps = [np.asarray(m) for m in g.leaf_dofs_in]
            own, mn, mx = owner_of(maps)
            H = max(H, halo_need(own, mn, mx))
            bnd_assign.append((maps, own))
        skel_assign = []
        for g in go.skel_groups:
            maps_i = [np.asarray(m) for m in g.leaf_dofs_in]
            maps_o = [np.asarray(m) for m in g.leaf_dofs_out]
            own, mn, mx = owner_of(maps_i + maps_o)
            H = max(H, halo_need(own, mn, mx))
            skel_assign.append((maps_i, maps_o, own))
        if H > B:
            raise ValueError(
                f"halo H={H} exceeds block size B={B}: too many devices for "
                f"this mesh (couplings must be nearest-neighbor)")
        self.H = H

        # -- localized, shard-grouped index/aux arrays -----------------------
        vg = go.vol_geo
        loc, aux, mask = _assign_localize(
            vol_maps, [np.asarray(vg.origins)], vown, self.ndev, B, H)
        self._sh = {
            "vol": {"dofs": loc, "origins": aux[0], "mask": mask},
            "bnd": [], "skel": [],
        }
        for g, (maps, own) in zip(go.bnd_groups, bnd_assign):
            loc, aux, mask = _assign_localize(
                maps, [np.asarray(g.x)], own, self.ndev, B, H)
            self._sh["bnd"].append({"dofs": loc, "x": aux[0], "mask": mask})
        for g, (maps_i, maps_o, own) in zip(go.skel_groups, skel_assign):
            nin = len(maps_i)
            loc, aux, mask = _assign_localize(
                maps_i + maps_o, [np.asarray(g.x)], own, self.ndev, B, H)
            self._sh["skel"].append({
                "dofs_in": loc[:nin], "dofs_out": loc[nin:],
                "x": aux[0], "mask": mask,
            })

        self.sharding = NamedSharding(self.device_mesh, P(axis_name))
        mask_np = np.ones(self.ndev * B, bool)
        mask_np[:N] = (np.asarray(go.cg.mask_np, bool) if go.cg is not None
                       else False)
        # padded rows behave like Dirichlet rows fixed at zero
        self.mask_padded = jax.device_put(jnp.asarray(mask_np), self.sharding)

    # -- padded flat <-> (N,) conversions ------------------------------------
    def device_put(self, x):
        xp = np.zeros(self.ndev * self.B, np.asarray(x).dtype)
        xp[:self.N] = np.asarray(x)
        return jax.device_put(jnp.asarray(xp), self.sharding)

    def gather(self, xp):
        return np.asarray(jax.device_get(xp))[:self.N]

    # -- halo-extended local residual ----------------------------------------
    def _local_residual(self, xloc, sh, time):
        go = self.go
        ax, nd, H, B = self.axis_name, self.ndev, self.H, self.B
        dtype = xloc.dtype
        lop = go.lop.set_time(time)
        fwd = [(i, i + 1) for i in range(nd - 1)]
        bwd = [(i + 1, i) for i in range(nd - 1)]
        prev = lax.ppermute(xloc[B - H:], ax, fwd)
        nxt = lax.ppermute(xloc[:H], ax, bwd)
        ext = jnp.concatenate([prev, xloc, nxt])    # rows [dB-H, (d+1)B+H)
        r = jnp.zeros_like(ext)

        def scatter(r, dof_maps, r_loc, mask):
            for m, rl in zip(dof_maps, go._pack(r_loc)):
                r = r.at[m].add((rl * mask[:, None]).astype(r.dtype))
            return r

        v = sh["vol"]
        ctx = self._vol_ctx(v["origins"], time, dtype)
        u = [ext[m] for m in v["dofs"]]
        if go.has["alpha_volume"]:
            r = scatter(r, v["dofs"], lop.alpha_volume(ctx, go._uarg(u)),
                        v["mask"])
        if go.has["lambda_volume"]:
            r = scatter(r, v["dofs"], lop.lambda_volume(ctx), v["mask"])
        for g, sg in zip(go.bnd_groups, sh["bnd"]):
            fctx = self._face_ctx(g, sg["x"], time, dtype)
            uf = [ext[m] for m in sg["dofs"]]
            if go.has["alpha_boundary"]:
                r = scatter(r, sg["dofs"],
                            lop.alpha_boundary(fctx, go._uarg(uf)), sg["mask"])
            if go.has["lambda_boundary"]:
                r = scatter(r, sg["dofs"], lop.lambda_boundary(fctx),
                            sg["mask"])
        for g, sg in zip(go.skel_groups, sh["skel"]):
            sctx = self._skel_ctx(g, sg["x"], time, dtype)
            ui = [ext[m] for m in sg["dofs_in"]]
            uo = [ext[m] for m in sg["dofs_out"]]
            r_in, r_out = lop.alpha_skeleton(sctx, go._uarg(ui), go._uarg(uo))
            r = scatter(r, sg["dofs_in"], r_in, sg["mask"])
            r = scatter(r, sg["dofs_out"], r_out, sg["mask"])

        # border add-exchange: ship the H-row overlaps to their owners
        tail = lax.ppermute(r[:H], ax, bwd)        # -> shard d-1's tail
        head = lax.ppermute(r[B + H:], ax, fwd)    # -> shard d+1's head
        r_own = r[H:B + H]
        r_own = r_own.at[B - H:].add(tail).at[:H].add(head)
        return r_own

    # -- padded-sharded API (for use inside Krylov loops) --------------------
    def residual_unconstrained_padded(self, xp, time=0.0):
        # jitted once with time as a replicated operand: an eager
        # shard_map executes (and compiles) primitive-by-primitive — see
        # parallel/windowed.py residual_unconstrained_padded
        if not hasattr(self, "_rup_jit"):
            sm = jax.shard_map(
                lambda x, t, sh: self._local_residual(x, sh, t),
                mesh=self.device_mesh,
                in_specs=(P(self.axis_name), P(), P(self.axis_name)),
                out_specs=P(self.axis_name),
            )
            self._rup_jit = jax.jit(sm)
        return self._rup_jit(xp, jnp.asarray(time, xp.dtype), self._sh)

    def residual_padded(self, xp, time=0.0):
        r = self.residual_unconstrained_padded(xp, time)
        return jnp.where(self.mask_padded, 0.0, r)

    def jacobian_apply_padded(self, xp, zp, time=0.0):
        zf = jnp.where(self.mask_padded, 0.0, zp)
        _, jz = jax.jvp(
            lambda y: self.residual_unconstrained_padded(y, time), (xp,), (zf,))
        return jnp.where(self.mask_padded, zp, jz)

    # -- generic data handles (Add/Copy/Min/Max) -------------------------------
    # the genericdatahandle.hh:646-790 analog on the block-sharded layout:
    # `exchange_window` is the Copy handle (each shard reads a ghost window
    # [dB-H, (d+1)B+H) of neighbor data), `combine_window` ships per-shard
    # window CONTRIBUTIONS back to their owner rows under a reduction
    # policy — 'add' is the border sum the residual uses, 'min'/'max' give
    # the non-additive consistency patterns (e.g. slope limiting across
    # shard boundaries).
    def exchange_window_padded(self, xp):
        """(ndev*(B+2H),) array of per-shard ghost windows (Copy policy)."""
        ax, nd, H, B = self.axis_name, self.ndev, self.H, self.B
        fwd = [(i, i + 1) for i in range(nd - 1)]
        bwd = [(i + 1, i) for i in range(nd - 1)]

        def local(x):
            prev = lax.ppermute(x[B - H:], ax, fwd)
            nxt = lax.ppermute(x[:H], ax, bwd)
            return jnp.concatenate([prev, x, nxt])

        return jax.shard_map(local, mesh=self.device_mesh,
                             in_specs=P(ax), out_specs=P(ax))(xp)

    def combine_window_padded(self, wp, policy: str = "add"):
        """Reduce per-shard window contributions onto owner rows."""
        ax, nd, H, B = self.axis_name, self.ndev, self.H, self.B
        fwd = [(i, i + 1) for i in range(nd - 1)]
        bwd = [(i + 1, i) for i in range(nd - 1)]
        neutral = {"add": 0.0, "min": jnp.inf, "max": -jnp.inf}[policy]
        comb = {"add": jnp.add, "min": jnp.minimum,
                "max": jnp.maximum}[policy]

        def local(w):
            i = lax.axis_index(ax)
            tail = lax.ppermute(w[:H], ax, bwd)      # from next shard
            head = lax.ppermute(w[B + H:], ax, fwd)  # from prev shard
            # chain ends receive ppermute zeros: replace with the neutral
            tail = jnp.where(i == nd - 1, neutral, tail)
            head = jnp.where(i == 0, neutral, head)
            own = w[H:B + H]
            own = own.at[B - H:].set(comb(own[B - H:], tail))
            own = own.at[:H].set(comb(own[:H], head))
            return own

        return jax.shard_map(local, mesh=self.device_mesh,
                             in_specs=P(ax), out_specs=P(ax))(wp)

    # -- flat (N,) convenience API -------------------------------------------
    def _pad(self, x):
        return jnp.pad(x, (0, self.ndev * self.B - self.N))

    def residual(self, x, time=0.0):
        return self.residual_padded(self._pad(x), time)[:self.N]

    def jacobian_apply(self, x, z, time=0.0):
        return self.jacobian_apply_padded(
            self._pad(x), self._pad(z), time)[:self.N]

    def solve_cg(self, x_lin, b, diag=None, tol=1e-10, maxiter=5000, time=0.0):
        """CG on the block-sharded vectors; halo-only comm per iteration."""
        from dune_pdelab_tpu.linalg.krylov import cg

        xp = self.device_put(np.asarray(x_lin))
        bp = self.device_put(np.asarray(b))
        if diag is not None:
            dp = self.device_put(np.asarray(diag))
            dp = jnp.where(dp == 0, 1.0, dp)
            M = lambda r: r / dp
        else:
            M = lambda r: r

        @jax.jit
        def run(xp, bp):
            return cg(lambda z: self.jacobian_apply_padded(xp, z, time),
                      bp, M=M, tol=tol, maxiter=maxiter)

        zp, stats = run(xp, bp)
        return self.gather(zp), stats
