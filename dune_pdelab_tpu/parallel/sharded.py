"""Sharded assembly: domain-decomposed residual/operator over a device mesh.

TPU-native analog of PDELab's parallel assembly + solver stack (reference:
overlapping backends dune/pdelab/backend/istl/ovlpistlsolverbackend.hh,
border accumulation gridoperator/common/borderdofexchanger.hh:498, data
handles gridfunctionspace/genericdatahandle.hh:130). Design translation:

  * MPI ranks -> named axes of a jax.sharding.Mesh;
  * per-rank entity sets -> static padded (ndev, E_loc, ...) index blocks
    (parallel/partition.py);
  * `AddDataHandle.communicate()` border sums -> one `lax.psum` of the
    locally scattered residual partials over the element axis (the DOF
    vector stays replicated in this round-1 scheme — an overlapping
    additive decomposition with zero-cost gathers);
  * parallel scalar products (OverlappingScalarProduct, reference:
    ovlpistlsolverbackend.hh:104-116) are plain dots on the replicated
    vector — no owner masking needed since no DOF is duplicated.

The element axis is split into contiguous lexicographic slabs, so each
shard's elements are spatially contiguous and face groups mostly stay local.
A DOF-sharded halo-exchange (`ppermute`) path is the planned next step for
HBM scaling beyond replicated vectors.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from dune_pdelab_tpu.parallel.partition import pad_partition


class ShardedGridOperator:
    """Wraps a (uniform-mesh) GridOperator for SPMD execution.

    API subset of GridOperator: residual / jacobian_apply / jacobian_diagonal.
    DOF vectors are replicated across the mesh axis; assembly work is
    sharded by element/face blocks.
    """

    def __init__(self, go, devices=None, axis_name="elems"):
        if not go.mesh.uniform:
            raise NotImplementedError("sharded assembly requires a uniform mesh")
        self.go = go
        devices = devices if devices is not None else jax.devices()
        self.ndev = len(devices)
        self.device_mesh = Mesh(np.asarray(devices), (axis_name,))
        self.axis_name = axis_name
        self.cg = go.cg

        # arrays are stored flattened (ndev*Bloc, ...); sharding the leading
        # axis over the mesh gives each shard its contiguous (Bloc, ...) block
        def flat(a):
            a = np.asarray(a)
            return jnp.asarray(a.reshape((-1,) + a.shape[2:]))

        vg = go.vol_geo
        vol_ops, vol_mask = pad_partition(
            [np.asarray(m) for m in go.leaf_dofs] + [vg.origins], self.ndev
        )
        self._sh = {
            "vol": {
                "dofs": [flat(m).astype(jnp.int32) for m in vol_ops[:-1]],
                "origins": flat(vol_ops[-1]),
                "mask": flat(vol_mask),
            },
            "bnd": [],
            "skel": [],
        }
        for g in go.bnd_groups:
            ops, mask = pad_partition(
                [np.asarray(m) for m in g.leaf_dofs_in] + [g.x], self.ndev
            )
            self._sh["bnd"].append({
                "dofs": [flat(m).astype(jnp.int32) for m in ops[:-1]],
                "x": flat(ops[-1]),
                "mask": flat(mask),
            })
        for g in go.skel_groups:
            nin = len(g.leaf_dofs_in)
            ops, mask = pad_partition(
                [np.asarray(m) for m in g.leaf_dofs_in]
                + [np.asarray(m) for m in g.leaf_dofs_out] + [g.x], self.ndev
            )
            self._sh["skel"].append({
                "dofs_in": [flat(m).astype(jnp.int32) for m in ops[:nin]],
                "dofs_out": [flat(m).astype(jnp.int32) for m in ops[nin:-1]],
                "x": flat(ops[-1]),
                "mask": flat(mask),
            })

    # -- context builders reusing the GridOperator's static tabulations -----
    def _vol_ctx(self, origins_local, time, dtype):
        go = self.go
        from dune_pdelab_tpu.ops.base import VolumeContext
        vg = go.vol_geo
        x = origins_local[:, None, :].astype(dtype) + jnp.asarray(
            vg.qp_phys_offset, dtype)[None]
        return VolumeContext(
            weights=jnp.asarray(vg.weights, dtype),
            x=x,
            factor=jnp.asarray(vg.factor, dtype),
            tabs=go._leaf_tabs(go._vol_tabs, dtype),
            jac_inv_T=jnp.asarray(vg.jac_inv_T, dtype),
            cell_volume=jnp.asarray(vg.cell_volume, dtype),
            time=time,
        )

    def _face_ctx(self, g, x_local, time, dtype):
        from dune_pdelab_tpu.ops.base import FaceContext
        go = self.go
        return FaceContext(
            weights=jnp.asarray(g.weights, dtype),
            x=x_local.astype(dtype),
            factor=jnp.asarray(g.factor, dtype),
            normal=jnp.asarray(g.normal, dtype),
            tabs=go._leaf_tabs(g.tabs_in, dtype),
            h_inside=jnp.asarray(g.h_in, dtype),
            time=time,
        )

    def _skel_ctx(self, g, x_local, time, dtype):
        from dune_pdelab_tpu.ops.base import SkeletonContext
        go = self.go
        return SkeletonContext(
            weights=jnp.asarray(g.weights, dtype),
            x=x_local.astype(dtype),
            factor=jnp.asarray(g.factor, dtype),
            normal=jnp.asarray(g.normal, dtype),
            tabs_in=go._leaf_tabs(g.tabs_in, dtype),
            tabs_out=go._leaf_tabs(g.tabs_out, dtype),
            h_inside=jnp.asarray(g.h_in, dtype),
            h_outside=jnp.asarray(g.h_out, dtype),
            time=time,
        )

    # -- local (per-shard) residual -----------------------------------------
    def _local_residual(self, x, sh, time):
        go = self.go
        dtype = x.dtype
        lop = go.lop.set_time(time)
        r = jnp.zeros_like(x)

        def scatter(r, dof_maps, r_loc, mask):
            for m, rl in zip(dof_maps, go._pack(r_loc)):
                r = r.at[m].add((rl * mask[:, None]).astype(r.dtype))
            return r

        v = sh["vol"]
        ctx = self._vol_ctx(v["origins"], time, dtype)
        u = [x[m] for m in v["dofs"]]
        if go.has["alpha_volume"]:
            r = scatter(r, v["dofs"], lop.alpha_volume(ctx, go._uarg(u)), v["mask"])
        if go.has["lambda_volume"]:
            r = scatter(r, v["dofs"], lop.lambda_volume(ctx), v["mask"])
        for g, sg in zip(go.bnd_groups, sh["bnd"]):
            fctx = self._face_ctx(g, sg["x"], time, dtype)
            uf = [x[m] for m in sg["dofs"]]
            if go.has["alpha_boundary"]:
                r = scatter(r, sg["dofs"],
                            lop.alpha_boundary(fctx, go._uarg(uf)), sg["mask"])
            if go.has["lambda_boundary"]:
                r = scatter(r, sg["dofs"], lop.lambda_boundary(fctx), sg["mask"])
        for g, sg in zip(go.skel_groups, sh["skel"]):
            sctx = self._skel_ctx(g, sg["x"], time, dtype)
            ui = [x[m] for m in sg["dofs_in"]]
            uo = [x[m] for m in sg["dofs_out"]]
            r_in, r_out = lop.alpha_skeleton(sctx, go._uarg(ui), go._uarg(uo))
            r = scatter(r, sg["dofs_in"], r_in, sg["mask"])
            r = scatter(r, sg["dofs_out"], r_out, sg["mask"])
        # border/overlap accumulation: AddDataHandle.communicate() analog
        return jax.lax.psum(r, self.axis_name)

    # -- public API ----------------------------------------------------------
    def residual_unconstrained(self, x, time=0.0):
        fn = jax.shard_map(
            lambda x, sh: self._local_residual(x, sh, time),
            mesh=self.device_mesh,
            in_specs=(P(), P(self.axis_name)),
            out_specs=P(),
        )
        return fn(x, self._sh)

    def residual(self, x, time=0.0):
        r = self.residual_unconstrained(x, time)
        if self.cg is not None:
            r = jnp.where(self.cg.mask, 0.0, r)
        return r

    def jacobian_apply(self, x, z, time=0.0):
        if self.cg is not None:
            z_f = jnp.where(self.cg.mask, 0.0, z)
        else:
            z_f = z
        _, jz = jax.jvp(lambda y: self.residual_unconstrained(y, time), (x,), (z_f,))
        if self.cg is not None:
            jz = jnp.where(self.cg.mask, z, jz)
        return jz

    def jacobian_diagonal(self, x, time=0.0):
        # replicated x: reuse the sequential probing path (setup-phase cost)
        return self.go.jacobian_diagonal(x, time)

    @property
    def space(self):
        return self.go.space

    @property
    def lop(self):
        return self.go.lop
