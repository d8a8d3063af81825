"""Distributed smoothed-aggregation AMG: the parallel-AMG analog.

The reference runs dune-istl's AMG on MPI ranks through the
overlapping/nonoverlapping backends (reference:
dune/pdelab/backend/istl/novlpistlsolverbackend.hh:330-1128 NOVLP AMG,
ovlpistlsolverbackend.hh parallel AMG, parallelhelper.hh:273-440 building
the ParallelIndexSet AMG needs). The TPU-native equivalent here:

* Every level's matrices (A_l, R_l, P_l) are ROW-PARTITIONED over the
  device mesh in contiguous padded blocks; column accesses outside the
  owned block are served by per-shard WINDOWS materialized with grouped
  `lax.ppermute` exchanges (the windowed-operator scheme of
  parallel/windowed.py, applied to raw CSR matrices). Comm per SpMV is
  O(window), never a full-vector collective.
* The dense coarse solve is gathered (one `all_gather` of the
  coarse-level residual, O(n_coarse)) and solved redundantly on every
  shard — the same "coarse levels gathered onto shrinking sub-meshes"
  stance as the sharded geometric multigrid (parallel/gmg.py) and the
  reference's redistributed AMG coarse levels.
* The whole V-cycle is ONE jitted shard_map; the level recursion unrolls
  statically.

The cycle runs the SAME arithmetic as the sequential
linalg.amg.AlgebraicMultigrid it is built from (same hierarchy, same
damped-Jacobi smoothers, same coarse LU), so sharded-vs-sequential
parity is exact to roundoff and preconditioned-CG iteration counts
match — the testable contract.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _pad_rows(n, ndev):
    """Contiguous row partition: shard d owns rows [d*B, min((d+1)*B, n))."""
    return -(-n // ndev)


class _ShardedCSR:
    """Row-partitioned CSR -> per-shard padded ELL with window columns.

    Device arrays are stacked (ndev * rows_B, k) / (ndev * X,) so a
    shard_map with P(axis) hands each shard its own slice (the
    parallel/windowed.py layout convention).
    """

    def __init__(self, A, row_B, col_B, ndev, dtype):
        import scipy.sparse as sp

        A = sp.csr_matrix(A)
        n_rows, n_cols = A.shape
        self.n_rows, self.n_cols = n_rows, n_cols
        self.row_B, self.col_B = row_B, col_B

        wins = []
        ell_cols_l, ell_vals_l = [], []
        kmax = 1
        for d in range(ndev):
            r0, r1 = d * row_B, min((d + 1) * row_B, n_rows)
            sub = A[r0:r1]
            w = np.unique(sub.indices) if sub.nnz else np.array([0])
            wins.append(w)
            kmax = max(kmax, int(np.diff(sub.indptr).max()) if r1 > r0 else 1)
        self.wins = wins
        Wmax = max(len(w) for w in wins)
        self.Wmax = Wmax

        for d in range(ndev):
            r0, r1 = d * row_B, min((d + 1) * row_B, n_rows)
            sub = A[r0:r1].tocsr()
            cols = np.full((row_B, kmax), Wmax, np.int64)   # trash slot
            vals = np.zeros((row_B, kmax), dtype)
            if r1 > r0 and sub.nnz:
                counts = np.diff(sub.indptr)
                rr = np.repeat(np.arange(r1 - r0), counts)
                pos = np.arange(sub.nnz) - np.repeat(sub.indptr[:-1], counts)
                cols[rr, pos] = np.searchsorted(wins[d], sub.indices)
                vals[rr, pos] = sub.data
            ell_cols_l.append(cols)
            ell_vals_l.append(vals)
        self.cols = jnp.asarray(np.stack(ell_cols_l).reshape(-1, kmax),
                                jnp.int32)
        self.vals = jnp.asarray(np.stack(ell_vals_l).reshape(-1, kmax))

        # exchange plan for the COLUMN vector (partitioned in col_B blocks)
        own_pos_l, own_idx_l = [], []
        send = {}                        # delta -> {src: (send_rows, recv_pos)}
        for d in range(ndev):
            w = wins[d]
            wo = np.minimum(w // col_B, ndev - 1)
            mine = np.nonzero(wo == d)[0]
            own_pos_l.append(mine)
            own_idx_l.append(w[mine] - d * col_B)
            for o in np.unique(wo):
                o = int(o)
                if o == d:
                    continue
                pos = np.nonzero(wo == o)[0]
                send.setdefault(d - o, {})[o] = (w[pos] - o * col_B, pos)
        Omax = max(max(len(p) for p in own_pos_l), 1)
        own_pos = np.full((ndev, Omax), Wmax, np.int64)
        own_idx = np.zeros((ndev, Omax), np.int64)
        own_mask = np.zeros((ndev, Omax))
        for d in range(ndev):
            c = len(own_pos_l[d])
            own_pos[d, :c] = own_pos_l[d]
            own_idx[d, :c] = own_idx_l[d]
            own_mask[d, :c] = 1.0
        self.own = (jnp.asarray(own_pos.reshape(-1)),
                    jnp.asarray(own_idx.reshape(-1)),
                    jnp.asarray(own_mask.reshape(-1)))
        self.plan = []
        self.perms = []
        for delta in sorted(send.keys()):
            per_pair = send[delta]
            S = max(len(v[0]) for v in per_pair.values())
            send_idx = np.zeros((ndev, S), np.int64)
            send_mask = np.zeros((ndev, S))
            recv_pos = np.full((ndev, S), Wmax, np.int64)
            for o, (srows, rpos) in per_pair.items():
                c = len(srows)
                send_idx[o, :c] = srows
                send_mask[o, :c] = 1.0
                recv_pos[o + delta, :c] = rpos
            perm = [(o, o + delta) for o in range(ndev)
                    if 0 <= o + delta < ndev]
            self.perms.append(perm)
            self.plan.append({
                "send_idx": jnp.asarray(send_idx.reshape(-1)),
                "send_mask": jnp.asarray(send_mask.reshape(-1)),
                "recv_pos": jnp.asarray(recv_pos.reshape(-1)),
            })

    def operand(self):
        return {"cols": self.cols, "vals": self.vals, "own": self.own,
                "plan": self.plan}

    # ---- inside shard_map --------------------------------------------------
    def window(self, xloc, ops, axis_name):
        """Owned column block (col_B,) -> window values (Wmax + 1,)."""
        own_pos, own_idx, own_mask = ops["own"]
        w = jnp.zeros(self.Wmax + 1, xloc.dtype)
        w = w.at[own_pos].set(xloc[own_idx] * own_mask.astype(xloc.dtype))
        for pl, perm in zip(ops["plan"], self.perms):
            buf = xloc[pl["send_idx"]] * pl["send_mask"].astype(xloc.dtype)
            recv = lax.ppermute(buf, axis_name, perm)
            w = w.at[pl["recv_pos"]].set(recv)
        return w

    def apply(self, xloc, ops, axis_name):
        """Owned rows of (this matrix) @ x, from x's owned column block."""
        w = self.window(xloc, ops, axis_name)
        return (ops["vals"] * w[ops["cols"]]).sum(axis=1)


class ShardedAMG:
    """Distributed V-cycle over an AlgebraicMultigrid hierarchy.

    amg: a linalg.amg.AlgebraicMultigrid set up with keep_host=True
         (or pass a GridOperator via from_grid_operator).
    """

    def __init__(self, amg, devices=None, axis_name="shard"):
        if not hasattr(amg, "host_levels"):
            raise ValueError("ShardedAMG needs an AlgebraicMultigrid set up "
                             "with keep_host=True")
        devices = list(devices) if devices is not None else jax.devices()
        ndev = len(devices)
        self.ndev = ndev
        self.axis_name = axis_name
        self.device_mesh = Mesh(np.asarray(devices), (axis_name,))
        self.sharding = NamedSharding(self.device_mesh, P(axis_name))
        self.amg = amg

        host = amg.host_levels
        if not host:
            raise ValueError(
                "operator coarser than max_coarse: the sequential AMG is "
                "already a single dense solve; sharding it has no levels "
                "to distribute")
        dtype = host[0][0].dtype
        sizes = [h[0].shape[0] for h in host] + [amg.host_coarse.shape[0]]
        self.sizes = sizes
        self.Bs = [_pad_rows(n, ndev) for n in sizes]
        self.N = sizes[0]
        self.B = self.Bs[0]
        self.NP = ndev * self.B

        self._levels = []
        for l, (A, Pm, R, d, lmax) in enumerate(host):
            Bf, Bc = self.Bs[l], self.Bs[l + 1]
            Ash = _ShardedCSR(A, Bf, Bf, ndev, dtype)
            Rsh = _ShardedCSR(R, Bc, Bf, ndev, dtype)
            Psh = _ShardedCSR(Pm, Bf, Bc, ndev, dtype)
            dd_arr = np.ones(ndev * Bf, dtype)
            dd_arr[:sizes[l]] = d
            self._levels.append({
                "A": Ash, "R": Rsh, "P": Psh,
                "diag": jnp.asarray(dd_arr),
                "lmax": lmax,
            })
        nc = sizes[-1]
        import scipy.linalg as sla
        lu, piv = sla.lu_factor(np.asarray(amg.host_coarse))
        self._coarse = (jnp.asarray(lu), jnp.asarray(piv.astype(np.int32)))
        self._nc = nc
        self._build_apply()

    @classmethod
    def from_grid_operator(cls, go, x_lin=None, time=0.0, devices=None,
                           axis_name="shard", setup_parts=None, **amg_kw):
        """setup_parts: build the hierarchy with the DISTRIBUTED setup
        (decoupled per-partition aggregation + per-partition smoothed-P
        and RAP, linalg/amg.py setup_from_csr(parts=...)) — by default one
        partition per device, so the setup partitioning matches the cycle
        sharding. Pass setup_parts=1 to force the coupled serial setup.
        reference: parallelhelper.hh:273-440 (the ParallelIndexSet the
        reference's distributed AMG setup runs over)."""
        from dune_pdelab_tpu.linalg.amg import AlgebraicMultigrid
        if setup_parts is None:
            ndev = len(devices) if devices is not None else len(
                jax.devices())
            setup_parts = ndev if ndev > 1 else None
        amg = AlgebraicMultigrid(**amg_kw).setup_from_grid_operator(
            go, x_lin, time, keep_host=True,
            parts=setup_parts if setup_parts and setup_parts > 1 else None)
        return cls(amg, devices=devices, axis_name=axis_name)

    # ---- the jitted sharded V-cycle ----------------------------------------
    def _build_apply(self):
        ax = self.axis_name
        ndev = self.ndev
        levels = self._levels
        amg = self.amg
        wj = amg.jacobi_damping
        pre, post = amg.presmooth, amg.postsmooth
        coarse = self._coarse
        nc, Bc_last = self._nc, self.Bs[-1]

        def vcycle(l, r_loc, ops):
            if l == len(levels):
                # gather the (small) coarse residual, solve redundantly,
                # keep the owned slice — O(n_coarse) comm, once per cycle
                rg = lax.all_gather(r_loc, ax, tiled=True)[:nc]
                zg = jax.scipy.linalg.lu_solve(coarse, rg[:, None])[:, 0]
                zp = jnp.zeros(ndev * Bc_last, zg.dtype).at[:nc].set(zg)
                d = lax.axis_index(ax)
                return lax.dynamic_slice(zp, (d * Bc_last,), (Bc_last,))
            lvl = levels[l]
            op = ops[l]
            A, R, Pm = lvl["A"], lvl["R"], lvl["P"]
            diag = op["diag"]

            def smooth(x, steps):
                for _ in range(steps):
                    x = x + wj * (r_loc - A.apply(x, op["A"], ax)) / diag
                return x

            x = smooth(jnp.zeros_like(r_loc), pre)
            res = r_loc - A.apply(x, op["A"], ax)
            rc = R.apply(res, op["R"], ax)
            xc = vcycle(l + 1, rc, ops)
            x = x + Pm.apply(xc, op["P"], ax)
            return smooth(x, post)

        ops = [{"A": lvl["A"].operand(), "R": lvl["R"].operand(),
                "P": lvl["P"].operand(), "diag": lvl["diag"]}
               for lvl in levels]
        # per-level operands are sharded along their stacked leading axis;
        # device_put once so repeated applies don't re-lay-out
        ops = jax.tree.map(lambda a: jax.device_put(a, self.sharding), ops)
        in_specs = jax.tree.map(lambda _: P(ax), ops)
        sm = jax.shard_map(
            lambda r, o: vcycle(0, r, o),
            mesh=self.device_mesh,
            in_specs=(P(ax), in_specs),
            out_specs=P(ax),
        )
        self._ops = ops
        self._apply_padded = jax.jit(sm)

    # ---- public API ----------------------------------------------------------
    def apply_padded(self, rp):
        return self._apply_padded(rp, self._ops)

    def apply(self, r):
        rp = jnp.zeros(self.NP, r.dtype).at[:self.N].set(r)
        rp = jax.device_put(rp, self.sharding)
        return self.apply_padded(rp)[:self.N]

    def __call__(self, r):
        return self.apply(r)

    # ---- fully-sharded assembled solve ---------------------------------------
    # the ISTLBackend_NOVLP_CG_AMG_* analog: the level-0 matrix IS the
    # operator, so the whole preconditioned CG runs on padded-sharded
    # vectors — matrix, Krylov vectors, and V-cycle never leave the shards
    # (pad rows are zero rows with unit diagonal, so they stay exactly 0)
    def operator_padded(self, xp):
        """y = A x on padded-sharded vectors (level-0 matrix)."""
        if not hasattr(self, "_A0_jit"):
            ax = self.axis_name
            A0 = self._levels[0]["A"]
            ops0 = self._ops[0]["A"]
            sm = jax.shard_map(
                lambda x, o: A0.apply(x, o, ax),
                mesh=self.device_mesh,
                in_specs=(P(self.axis_name),
                          jax.tree.map(lambda _: P(self.axis_name), ops0)),
                out_specs=P(self.axis_name),
            )
            self._A0_jit = jax.jit(lambda x: sm(x, ops0))
        return self._A0_jit(xp)

    def solve_cg(self, b, tol=1e-10, maxiter=5000, x0=None):
        """Distributed AMG-preconditioned CG on the assembled operator.

        b: full (unpadded) RHS; returns (x, SolverStats) with x unpadded.
        Arithmetic matches the sequential assembled AMG-CG exactly (pads
        contribute 0 to every dot), so iteration counts are identical.
        """
        from dune_pdelab_tpu.linalg.krylov import cg as _cg

        bp = jnp.zeros(self.NP, b.dtype).at[:self.N].set(b)
        bp = jax.device_put(bp, self.sharding)
        x0p = None
        if x0 is not None:
            x0p = jax.device_put(
                jnp.zeros(self.NP, b.dtype).at[:self.N].set(x0),
                self.sharding)
        z, stats = _cg(self.operator_padded, bp, x0=x0p,
                       M=self.apply_padded, tol=tol, maxiter=maxiter)
        return z[:self.N], stats
