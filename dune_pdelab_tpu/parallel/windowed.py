"""Window-sharded assembly: general meshes, composite spaces, any device mesh.

Round-3 generalization of `parallel/novlp.py`. That module shards the DOF
vector in contiguous blocks of the *global index order* and builds halos as
contiguous index slabs — which restricts it to uniform lattice meshes, a 1D
device chain, and halo H <= block B. This module drops all three
restrictions with one abstraction, the per-shard **DOF window**:

  * elements (and faces, keyed by their inside element) are partitioned by
    an arbitrary `element_owner` array — contiguous element-order slabs by
    default (the mesh's element order is spatially coherent: lexicographic
    slabs on structured meshes, refinement-tree order on adaptive ones), or
    `block_partition(mesh, mesh_shape)` for torus-aligned 2D/3D device
    meshes on structured grids;
  * each DOF is owned by the lowest-numbered shard whose elements touch it;
    DOFs are *renumbered* so each shard's owned DOFs are one contiguous
    padded block (the ParallelHelper "winner takes border DOF" ownership,
    reference: dune/pdelab/backend/istl/parallelhelper.hh:50-230, realized
    as a permutation instead of masks);
  * a shard's window = sorted union of the (renumbered) DOFs of its
    entities, augmented by hanging-node parent DOFs. Window values are
    fetched with one grouped `lax.ppermute` per *shard-offset class* (the
    set of distinct owner-shard offsets, small for coherent partitions) —
    the neighborwise `communicate()` analog (reference:
    dune/pdelab/gridfunctionspace/genericdatahandle.hh:130);
  * assembly scatters into the window; window contributions are shipped
    back to owner rows by the reverse permutes and summed — the border
    add-exchange (reference: novlpistlsolverbackend.hh:96,
    borderdofexchanger.hh:498);
  * hanging-node (affine) constraints apply *window-locally*: prolong
    before gathering, restrict-transpose on the partial window residual
    before the combine (P^T sum_d r_d = sum_d P^T r_d — linearity makes
    the local application exact);
  * per-entity context arrays (quadrature positions, per-element Jacobians
    and Piola tabulations on simplex/mapped meshes, face normals ...) are
    detected generically by their leading entity dimension and sharded
    alongside the DOF maps, so ANY local operator / mesh / space the
    sequential GridOperator handles runs under shard_map unchanged.

Krylov dots on the block-sharded padded vectors are plain vdots (disjoint
ownership by construction; XLA inserts the psum).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dune_pdelab_tpu.ops.base import (
    LeafTab, VolumeContext, FaceContext, SkeletonContext,
)


def block_partition(mesh, mesh_shape):
    """Element owner array for a structured mesh partitioned in blocks
    matching a device grid `mesh_shape` (slowest mesh axes first). Device
    id = C-order ravel of the block coordinates, so neighboring blocks map
    to neighboring devices along each torus axis."""
    cells = tuple(mesh.cells)                # dim0 fastest
    dim = len(cells)
    nblk = tuple(mesh_shape)
    if len(nblk) > dim:
        raise ValueError("device grid has more axes than the mesh")
    # pad with singleton block axes (fastest mesh axes unsplit)
    nblk = tuple(nblk) + (1,) * (dim - len(nblk))
    # mesh axes slowest-first: cells reversed
    mi = mesh.element_multi_index()          # (E, dim) dim0 fastest
    owner = np.zeros(mesh.nelements, np.int64)
    for a, nb_a in enumerate(nblk):          # a-th slowest mesh axis
        d = dim - 1 - a                      # mesh dim index
        c = cells[d]
        blk = np.minimum(mi[:, d] * nb_a // c, nb_a - 1)
        owner = owner * nb_a + blk
    return owner.astype(np.int32)


def _pad_stack(arrays, owner, ndev):
    """Group rows of each array by owner shard, pad each shard to the max
    count (repeating the shard's first row), stack, and flatten the shard
    axis. Returns (stacked_list, mask) with leading dim ndev * Emax."""
    n = len(owner)
    counts = np.bincount(owner, minlength=ndev)
    Emax = max(int(counts.max()), 1)
    mask = np.zeros((ndev, Emax))
    outs = [np.zeros((ndev, Emax) + a.shape[1:], a.dtype) for a in arrays]
    for d in range(ndev):
        idx = np.nonzero(owner == d)[0]
        c = len(idx)
        mask[d, :c] = 1.0
        for o, a in zip(outs, arrays):
            if c == 0:
                # pad empty shards with VALID entity data (row 0), not
                # zeros: zero geometry (h = 0, det J = 0) turns masked
                # padding rows into NaN factories (NaN * 0 = NaN)
                o[d, :] = a[0] if len(a) else 0
            else:
                o[d, :c] = a[idx]
                o[d, c:] = a[idx[0]]
    flat = lambda a: a.reshape((-1,) + a.shape[2:])
    return [flat(o) for o in outs], flat(mask)


def _split_tab(tab, n_ent):
    """Split a raw tab tuple (v, gphys, gref, degree, vec, div, curl) into
    (shared dict, per-entity dict) by leading entity dimension."""
    names = ("phi", "grad", "ref_grad", "degree", "vec_phi", "div", "curl")
    shared, per = {}, {}
    for name, a in zip(names, tab):
        if (isinstance(a, np.ndarray) and a.ndim > 0
                and a.shape[0] == n_ent and n_ent > 1):
            per[name] = a
        else:
            shared[name] = a
    return shared, per


class WindowShardedGridOperator:
    """GridOperator with window-sharded vectors; works on any mesh/space."""

    def __init__(self, go, devices=None, axis_name="shard",
                 element_owner=None):
        self.go = go
        devices = list(devices) if devices is not None else jax.devices()
        ndev = len(devices)
        self.ndev = ndev
        self.device_mesh = Mesh(np.asarray(devices), (axis_name,))
        self.axis_name = axis_name
        self.cg = go.cg
        N = go.space.ndofs
        self.N = N
        E = go.mesh.nelements

        if element_owner is None:
            Eb = -(-E // ndev)
            element_owner = np.minimum(np.arange(E) // Eb, ndev - 1)
        eo = np.asarray(element_owner, np.int64)
        self.element_owner = eo   # public: pairs with ParallelVTKWriter

        leaf_maps = [np.asarray(m, np.int64) for m in go._leaf_maps()]

        # ---- DOF ownership (lowest-touching-shard) + renumbering ----------
        dof_owner = np.full(N, ndev, np.int64)
        for m in leaf_maps:
            np.minimum.at(dof_owner, m.reshape(-1),
                          np.repeat(eo, m.shape[1]))
        dof_owner[dof_owner == ndev] = 0     # untouched DOFs (none expected)
        counts = np.bincount(dof_owner, minlength=ndev)
        B = max(int(counts.max()), 1)
        self.B = B
        order = np.lexsort((np.arange(N), dof_owner))   # stable (owner, idx)
        pos_in_shard = np.empty(N, np.int64)
        start = 0
        for d in range(ndev):
            c = int(counts[d])
            pos_in_shard[order[start:start + c]] = np.arange(c)
            start += c
        pi = dof_owner * B + pos_in_shard
        self._pi = pi
        # eager device copy: lazy in-trace conversion would cache a tracer
        self._pi_dev = jnp.asarray(pi, jnp.int32 if ndev * B < 2**31
                                   else jnp.int64)
        self.NP = ndev * B

        # ---- entity groups: owners + new-index dof maps -------------------
        groups = []          # (kind, owner, dofmaps_new, aux_ctx, group_ref)
        vol_shared, vol_per = self._vol_template()
        groups.append(("vol", eo, [pi[m] for m in leaf_maps],
                       vol_per, vol_shared, None))
        for g in go.bnd_groups:
            own = eo[g.elements]
            maps = [pi[np.asarray(m, np.int64)] for m in g.leaf_dofs_in]
            shared, per = self._face_template(g, skeleton=False)
            groups.append(("bnd", own, maps, per, shared, g))
        for g in go.skel_groups:
            own = eo[g.elements]
            maps = ([pi[np.asarray(m, np.int64)] for m in g.leaf_dofs_in]
                    + [pi[np.asarray(m, np.int64)] for m in g.leaf_dofs_out])
            shared, per = self._face_template(g, skeleton=True)
            groups.append(("skel", own, maps, per, shared, g))

        # ---- per-shard windows (incl. affine parents) ---------------------
        dof_sets = [set() for _ in range(ndev)]
        for kind, own, maps, per, shared, g in groups:
            for d in range(ndev):
                sel = own == d
                if not sel.any():
                    continue
                for m in maps:
                    dof_sets[d].update(np.unique(m[sel]).tolist())
        if go.cg is not None and go.cg.has_affine:
            arows = pi[np.asarray(go.cg._arows, np.int64)]
            acols = pi[np.asarray(go.cg._acols, np.int64)]
            aw = np.asarray(go.cg._aw, np.float64)
            by_row = {}
            for r, c, w in zip(arows, acols, aw):
                by_row.setdefault(int(r), []).append((int(c), float(w)))
            for d in range(ndev):
                extra = set()
                for r in dof_sets[d]:
                    for c, _ in by_row.get(r, ()):
                        extra.add(c)
                # parents of parents are already resolved transitively by
                # the constraints layer — one augmentation round suffices
                dof_sets[d].update(extra)
        else:
            by_row = {}

        wins = [np.array(sorted(s), np.int64) if s else
                np.array([d * B], np.int64)
                for d, s in enumerate(dof_sets)]
        Wmax = max(len(w) for w in wins)
        self.Wmax = Wmax
        win_pad = np.zeros((ndev, Wmax), np.int64)
        for d, w in enumerate(wins):
            win_pad[d, :len(w)] = w
            win_pad[d, len(w):] = d * B     # own first row (harmless)
        self._wins = wins

        # ---- localize group dof maps into window coordinates --------------
        self._sh_groups = []
        for kind, own, maps, per, shared, g in groups:
            loc_maps = []
            for m in maps:
                lm = np.zeros_like(m)
                for d in range(ndev):
                    sel = own == d
                    if sel.any():
                        lm[sel] = np.searchsorted(wins[d], m[sel])
                loc_maps.append(lm.astype(np.int32))
            per_names = sorted(per.keys())
            stacked, mask = _pad_stack(
                loc_maps + [np.asarray(per[k]) for k in per_names],
                own, ndev)
            nmaps = len(loc_maps)
            self._sh_groups.append({
                "kind": kind,
                "dofs": [jnp.asarray(a) for a in stacked[:nmaps]],
                "per": {k: jnp.asarray(a) for k, a in
                        zip(per_names, stacked[nmaps:])},
                "shared": shared,
                "mask": jnp.asarray(mask),
                "g": g,
            })

        # ---- exchange plan -------------------------------------------------
        # own rows of the window
        own_pos_l, own_idx_l = [], []
        send = {}            # delta -> per-shard (send_local_rows, recv_pos)
        for d in range(ndev):
            w = wins[d]
            wo = w // B
            mine = np.nonzero(wo == d)[0]
            own_pos_l.append(mine)
            own_idx_l.append(w[mine] - d * B)
            for o in np.unique(wo):
                o = int(o)
                if o == d:
                    continue
                delta = d - o
                pos = np.nonzero(wo == o)[0]
                send.setdefault(delta, {})[o] = (w[pos] - o * B, pos)
        Omax = max(len(p) for p in own_pos_l)
        own_pos = np.full((ndev, Omax), Wmax, np.int64)    # Wmax = trash
        own_idx = np.zeros((ndev, Omax), np.int64)
        own_mask = np.zeros((ndev, Omax))
        for d in range(ndev):
            c = len(own_pos_l[d])
            own_pos[d, :c] = own_pos_l[d]
            own_idx[d, :c] = own_idx_l[d]
            own_mask[d, :c] = 1.0
        self._own = (jnp.asarray(own_pos.reshape(-1)),
                     jnp.asarray(own_idx.reshape(-1)),
                     jnp.asarray(own_mask.reshape(-1)))
        self._plan = []
        for delta in sorted(send.keys()):
            per_pair = send[delta]
            S = max(len(v[0]) for v in per_pair.values())
            send_idx = np.zeros((ndev, S), np.int64)
            send_mask = np.zeros((ndev, S))
            recv_pos = np.full((ndev, S), Wmax, np.int64)  # trash by default
            for o, (srows, rpos) in per_pair.items():
                c = len(srows)
                send_idx[o, :c] = srows
                send_mask[o, :c] = 1.0
                recv_pos[o + delta, :c] = rpos
            perm = [(o, o + delta) for o in range(ndev)
                    if 0 <= o + delta < ndev]
            rperm = [(b, a) for (a, b) in perm]
            self._plan.append({
                "delta": delta, "perm": perm, "rperm": rperm,
                "send_idx": jnp.asarray(send_idx.reshape(-1)),
                "send_mask": jnp.asarray(send_mask.reshape(-1)),
                "recv_pos": jnp.asarray(recv_pos.reshape(-1)),
            })

        # ---- window-local affine triples ----------------------------------
        self._aff = []
        if by_row:
            ar_l, ac_l, aw_l = [], [], []
            for d in range(ndev):
                w = wins[d]
                wset = {int(v): i for i, v in enumerate(w)}
                rows, cols, ws = [], [], []
                for r_new, plist in by_row.items():
                    if r_new in wset:
                        for c_new, wgt in plist:
                            rows.append(wset[r_new])
                            cols.append(wset[c_new])
                            ws.append(wgt)
                ar_l.append(np.asarray(rows, np.int64))
                ac_l.append(np.asarray(cols, np.int64))
                aw_l.append(np.asarray(ws))
            Amax = max(max(len(a) for a in ar_l), 1)
            ar = np.full((ndev, Amax), Wmax, np.int64)     # trash
            ac = np.zeros((ndev, Amax), np.int64)
            aww = np.zeros((ndev, Amax))
            for d in range(ndev):
                c = len(ar_l[d])
                ar[d, :c] = ar_l[d]
                ac[d, :c] = ac_l[d]
                aww[d, :c] = aw_l[d]
            self._aff = [jnp.asarray(ar.reshape(-1)),
                         jnp.asarray(ac.reshape(-1)),
                         jnp.asarray(aww.reshape(-1))]
            # static hanging-row mask in window coordinates
            hm_old = np.asarray(go.cg.hanging_mask_np, bool)
            old_of_new = np.full(ndev * B, -1, np.int64)
            old_of_new[pi] = np.arange(N)
            hw = np.zeros((ndev, Wmax + 1), bool)
            for d in range(ndev):
                oo = old_of_new[wins[d]]
                hw[d, :len(wins[d])] = (oo >= 0) & hm_old[np.clip(oo, 0, N - 1)]
            self._hang_win = jnp.asarray(hw.reshape(-1))

        self.sharding = NamedSharding(self.device_mesh, P(axis_name))
        mask_np = np.ones(self.NP, bool)
        old_mask = (np.asarray(go.cg.mask_np, bool) if go.cg is not None
                    else np.zeros(N, bool))
        mask_np[pi] = old_mask
        self.mask_padded = jax.device_put(jnp.asarray(mask_np), self.sharding)
        # window-coordinate mask per shard (for local prolong)
        mwin = np.zeros((ndev, Wmax + 1), bool)
        for d in range(ndev):
            mwin[d, :len(wins[d])] = mask_np[wins[d]]
        self._mask_win = jnp.asarray(mwin.reshape(-1))

    # ---- context templates (numpy; split shared vs per-entity) ------------
    def _vol_template(self):
        go = self.go
        vg = go.vol_geo
        E = go.mesh.nelements
        if go.mesh.uniform:
            x = (np.asarray(vg.origins)[:, None, :]
                 + np.asarray(vg.qp_phys_offset)[None])
        else:
            x = np.asarray(vg.qp_phys)
        fields = {
            "weights": np.asarray(vg.weights),
            "x": x,
            "factor": np.asarray(vg.factor),
            "jac_inv_T": np.asarray(vg.jac_inv_T),
            "cell_volume": np.asarray(vg.cell_volume),
        }
        shared, per = {}, {}
        for k, a in fields.items():
            if a.ndim > 0 and a.shape[0] == E and E > 1:
                per[k] = a
            else:
                shared[k] = a
        tabs_sh, tabs_per = [], []
        for t in go._vol_tabs:
            s, p = _split_tab(t, E)
            tabs_sh.append(s)
            tabs_per.append(p)
        for i, p in enumerate(tabs_per):
            for k, a in p.items():
                per[f"tab{i}_{k}"] = a
        shared["_tabs"] = tabs_sh
        return shared, per

    def _face_template(self, g, skeleton):
        F = len(g.elements)
        fields = {
            "weights": np.asarray(g.weights),
            "x": np.asarray(g.x),
            "factor": np.asarray(g.factor),
            "normal": np.asarray(g.normal),
            "h_in": np.asarray(g.h_in),
        }
        if skeleton:
            fields["h_out"] = np.asarray(g.h_out)
        shared, per = {}, {}
        for k, a in fields.items():
            if a.ndim > 0 and a.shape[0] == F and F > 1:
                per[k] = a
            else:
                shared[k] = a
        tabs_sh = []
        for pre, tabs in (("tin", g.tabs_in),
                          ("tout", g.tabs_out if skeleton else None)):
            if tabs is None:
                continue
            row = []
            for i, t in enumerate(tabs):
                s, p = _split_tab(t, F)
                row.append(s)
                for k, a in p.items():
                    per[f"{pre}{i}_{k}"] = a
            tabs_sh.append(row)
        shared["_tabs_in"] = tabs_sh[0]
        if skeleton:
            shared["_tabs_out"] = tabs_sh[1]
        return shared, per

    def _mk_tabs(self, shared_tabs, per, prefix, dtype):
        out = []
        for i, s in enumerate(shared_tabs):
            kw = {}
            for k in ("phi", "grad", "ref_grad", "vec_phi", "div", "curl"):
                key = f"{prefix}{i}_{k}"
                if key in per:
                    kw[k] = per[key].astype(dtype)
                else:
                    a = s.get(k)
                    kw[k] = None if a is None else jnp.asarray(a, dtype)
            out.append(LeafTab(degree=s["degree"], **kw))
        return tuple(out)

    @staticmethod
    def _take(shared, per, name, dtype):
        if name in per:
            return per[name].astype(dtype)
        a = shared[name]
        if a is None:
            return None
        return jnp.asarray(a, dtype)

    # ---- window exchange / combine (inside shard_map) ----------------------
    def _exchange(self, xloc, ops):
        """xloc (B,) -> window values (Wmax + 1,) (last slot = trash)."""
        ax = self.axis_name
        own_pos, own_idx, own_mask = ops["own"]
        w = jnp.zeros(self.Wmax + 1, xloc.dtype)
        w = w.at[own_pos].set(xloc[own_idx] * own_mask.astype(xloc.dtype))
        for pl, plan in zip(ops["plan"], self._plan):
            buf = xloc[pl["send_idx"]]
            recv = lax.ppermute(buf, ax, plan["perm"])
            w = w.at[pl["recv_pos"]].set(recv)
        return w

    def _combine(self, rw, ops):
        """Window contributions (Wmax + 1,) -> owned rows (B,), summed."""
        ax = self.axis_name
        own_pos, own_idx, own_mask = ops["own"]
        r = jnp.zeros(self.B, rw.dtype)
        r = r.at[own_idx].add(rw[own_pos] * own_mask.astype(rw.dtype))
        for pl, plan in zip(ops["plan"], self._plan):
            buf = rw[pl["recv_pos"]]
            back = lax.ppermute(buf, ax, plan["rperm"])
            r = r.at[pl["send_idx"]].add(back * pl["send_mask"].astype(rw.dtype))
        return r

    def _prolong_win(self, w, ops):
        """Window-local P: overwrite hanging rows with their parent
        interpolation (matches DirichletConstraints.prolong)."""
        if not self._aff:
            return w
        ar, ac, aw = ops["aff"]
        vals = jnp.zeros_like(w).at[ar].add(aw.astype(w.dtype) * w[ac])
        return jnp.where(ops["hang_win"], vals, w)

    def _restrictT_win(self, rw, ops):
        """Window-local P^T on PARTIAL sums (exact by linearity):
        distribute hanging-row contributions to parents, zero them."""
        if not self._aff:
            return rw
        ar, ac, aw = ops["aff"]
        rw = rw.at[ac].add(aw.astype(rw.dtype) * rw[ar])
        return jnp.where(ops["hang_win"], 0.0, rw)

    # ---- sharded residual ---------------------------------------------------
    def _ops_operand(self):
        ops = {
            "own": self._own,
            "plan": [{k: p[k] for k in ("send_idx", "send_mask", "recv_pos")}
                     for p in self._plan],
            "groups": [{"dofs": g["dofs"], "per": g["per"],
                        "mask": g["mask"]} for g in self._sh_groups],
            "mask_win": self._mask_win,
        }
        if self._aff:
            ops["aff"] = self._aff
            ops["hang_win"] = self._hang_win
        return ops

    def _local_residual(self, xloc, ops, time):
        go = self.go
        dtype = xloc.dtype
        lop = go.lop.set_time(time)
        w = self._exchange(xloc, ops)
        w = self._prolong_win(w, ops)
        rw = jnp.zeros_like(w)

        def scatter(rw, dof_maps, r_loc, mask):
            for m, rl in zip(dof_maps, go._pack(r_loc)):
                rw = rw.at[m].add((rl * mask[:, None]).astype(rw.dtype))
            return rw

        for sg_full, sg in zip(self._sh_groups, ops["groups"]):
            kind = sg_full["kind"]
            shared = sg_full["shared"]
            per = sg["per"]
            take = lambda n: self._take(shared, per, n, dtype)
            if kind == "vol":
                ctx = VolumeContext(
                    weights=jnp.asarray(shared["weights"], dtype),
                    x=take("x"), factor=take("factor"),
                    tabs=self._mk_tabs(shared["_tabs"], per, "tab", dtype),
                    jac_inv_T=take("jac_inv_T"),
                    cell_volume=take("cell_volume"), time=time)
                u = [w[m] for m in sg["dofs"]]
                if go.has["alpha_volume"]:
                    rw = scatter(rw, sg["dofs"],
                                 lop.alpha_volume(ctx, go._uarg(u)),
                                 sg["mask"])
                if go.has["lambda_volume"]:
                    rw = scatter(rw, sg["dofs"], lop.lambda_volume(ctx),
                                 sg["mask"])
            elif kind == "bnd":
                ctx = FaceContext(
                    weights=jnp.asarray(shared["weights"], dtype),
                    x=take("x"), factor=take("factor"),
                    normal=take("normal"),
                    tabs=self._mk_tabs(shared["_tabs_in"], per, "tin",
                                       dtype),
                    h_inside=take("h_in"), time=time)
                uf = [w[m] for m in sg["dofs"]]
                if go.has["alpha_boundary"]:
                    rw = scatter(rw, sg["dofs"],
                                 lop.alpha_boundary(ctx, go._uarg(uf)),
                                 sg["mask"])
                if go.has["lambda_boundary"]:
                    rw = scatter(rw, sg["dofs"], lop.lambda_boundary(ctx),
                                 sg["mask"])
            else:
                nin = len(sg["dofs"]) // 2
                ctx = SkeletonContext(
                    weights=jnp.asarray(shared["weights"], dtype),
                    x=take("x"), factor=take("factor"),
                    normal=take("normal"),
                    tabs_in=self._mk_tabs(shared["_tabs_in"], per, "tin",
                                          dtype),
                    tabs_out=self._mk_tabs(shared["_tabs_out"], per, "tout",
                                           dtype),
                    h_inside=take("h_in"), h_outside=take("h_out"),
                    time=time)
                ui = [w[m] for m in sg["dofs"][:nin]]
                uo = [w[m] for m in sg["dofs"][nin:]]
                r_in, r_out = lop.alpha_skeleton(
                    ctx, go._uarg(ui), go._uarg(uo))
                rw = scatter(rw, sg["dofs"][:nin], r_in, sg["mask"])
                rw = scatter(rw, sg["dofs"][nin:], r_out, sg["mask"])

        rw = self._restrictT_win(rw, ops)
        return self._combine(rw, ops)

    # ---- padded-sharded API -------------------------------------------------
    def residual_unconstrained_padded(self, xp, time=0.0):
        # jit the whole sharded residual: an eager shard_map executes (and
        # compiles) primitive-by-primitive, which stalls on kernels with
        # many small ops (observed: the CCFV family never finished its
        # first eager apply). time travels as a replicated operand so one
        # compilation serves every linearization point / time step.
        if not hasattr(self, "_rup_jit"):
            sm = jax.shard_map(
                lambda x, t, ops: self._local_residual(x, ops, t),
                mesh=self.device_mesh,
                in_specs=(P(self.axis_name), P(), P(self.axis_name)),
                out_specs=P(self.axis_name),
            )
            self._rup_jit = jax.jit(sm)
        return self._rup_jit(xp, jnp.asarray(time, xp.dtype),
                             self._ops_operand())

    def residual_padded(self, xp, time=0.0):
        r = self.residual_unconstrained_padded(xp, time)
        return jnp.where(self.mask_padded, 0.0, r)

    def jacobian_apply_padded(self, xp, zp, time=0.0):
        zf = jnp.where(self.mask_padded, 0.0, zp)
        _, jz = jax.jvp(
            lambda y: self.residual_unconstrained_padded(y, time),
            (xp,), (zf,))
        return jnp.where(self.mask_padded, zp, jz)

    # ---- flat (N,) conversions ----------------------------------------------
    def device_put(self, x):
        xp = np.zeros(self.NP, np.asarray(x).dtype)
        xp[self._pi] = np.asarray(x)
        return jax.device_put(jnp.asarray(xp), self.sharding)

    def gather(self, xp):
        return np.asarray(jax.device_get(xp))[self._pi]

    def _pad_traced(self, x):
        """Flat (N,) -> padded permuted (NP,), trace-safe (usable inside
        an outer jit, unlike device_put)."""
        pi = self._pi_jnp()
        return jnp.zeros(self.NP, x.dtype).at[pi].set(x)

    def residual(self, x, time=0.0):
        return self.residual_padded(self._pad_traced(x), time)[self._pi_jnp()]

    def residual_unconstrained(self, x, time=0.0):
        """Flat unmasked residual — the duck-type the OneStepGridOperator
        stage machinery combines (instationary/onestep.py), so windowed
        operators drive distributed time integration directly."""
        return self.residual_unconstrained_padded(
            self._pad_traced(x), time)[self._pi_jnp()]

    def jacobian_apply(self, x, z, time=0.0):
        return self.jacobian_apply_padded(
            self._pad_traced(x), self._pad_traced(z), time)[self._pi_jnp()]

    def jacobian_diagonal(self, x, time=0.0):
        """Delegates to the sequential probe (per linearization point
        only — preconditioner setup, not the iteration hot path)."""
        return self.go.jacobian_diagonal(x, time)

    def _pi_jnp(self):
        return self._pi_dev

    def solve_cg(self, x_lin, b, diag=None, tol=1e-10, maxiter=5000,
                 time=0.0):
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

    def solve_bicgstab(self, x_lin, b, diag=None, tol=1e-10, maxiter=5000,
                       time=0.0):
        from dune_pdelab_tpu.linalg.krylov import bicgstab

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
            return bicgstab(
                lambda z: self.jacobian_apply_padded(xp, z, time),
                bp, M=M, tol=tol, maxiter=maxiter)

        zp, stats = run(xp, bp)
        return self.gather(zp), stats

    @property
    def space(self):
        return self.go.space

    @property
    def lop(self):
        return self.go.lop
