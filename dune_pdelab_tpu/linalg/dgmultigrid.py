"""Two-level DG multigrid: CG-subspace coarse correction + block smoothing.

TPU-native analog of the reference's AMG-for-DG backends (reference:
dune/pdelab/backend/istl/seq_amg_dg_backend.hh:146 — DG matrix + assembled
CG subspace prolongation + AMG on the CG space;
cg_to_dg_prolongation.hh:1-146). Here the coarse solve is the structured
GeometricMultigrid on the Q1 CG subspace (re-discretized per level — the
geometric replacement for AMG), the DG smoother is COLORED
symmetric block Gauss-Seidel (checkerboard element colors -> data-parallel
sweeps; plain block-Jacobi leaves smooth JUMP fields — low modes of the
penalty graph invisible to the conforming coarse space — nearly undamped,
measured rho ~ 0.98, whereas colored block-GS gives flat 6-7 CG
iterations across 8..64 meshes), and the CG->DG prolongation is the
static per-element nodal interpolation matrix W[j, c] = prod_d
(xi_j_d or 1 - xi_j_d) applied through the Q1 element corner map.

Usable directly as the `precond` callable of LinearSolverBackend.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from dune_pdelab_tpu.constraints.dirichlet import (
    constraints as make_constraints,
)
from dune_pdelab_tpu.fe.basis import QkFEM
from dune_pdelab_tpu.linalg.multigrid import GeometricMultigrid
from dune_pdelab_tpu.space.space import FunctionSpace


def _greedy_element_colors(mesh):
    """Color simplex elements so face-adjacent elements differ (the DG
    coupling graph: SIPG couples element blocks only through shared
    faces). Greedy over the face-adjacency graph; returns a list of
    int32 element-index arrays, one per color (same contract as
    preconditioners.checkerboard_colors)."""
    if_ = mesh.interior_faces()
    E = mesh.nelements
    nbrs = [[] for _ in range(E)]
    for a, b in zip(if_["inside"], if_["outside"]):
        nbrs[a].append(b)
        nbrs[b].append(a)
    color = np.full(E, -1, np.int64)
    for e in range(E):
        used = {color[n] for n in nbrs[e] if color[n] >= 0}
        c = 0
        while c in used:
            c += 1
        color[e] = c
    return [np.flatnonzero(color == c).astype(np.int32)
            for c in range(int(color.max()) + 1)]


class DGTwoLevel:
    """Two-level preconditioner for (linear, SPD-ish) DG operators.

    go_dg:   the DG GridOperator (single leaf: QkDG on a structured mesh
             or PkDG on a simplex mesh)
    cg_lop:  the CG discretization of the same PDE for the coarse space
             (e.g. ConvectionDiffusionFEM(problem))
    bctype:  Dirichlet bctype for the CG subspace (strong constraints)
    coarse:  'gmg' (structured lattices), 'amg' (any mesh — the literal
             seq_amg_dg_backend.hh composition: DG -> conforming subspace
             -> algebraic multigrid), or 'auto' (gmg on structured
             lattices, amg otherwise)
    """

    def __init__(self, go_dg, cg_lop, bctype=True, pre_smooth=1,
                 post_smooth=1, gmg_kwargs=None, coarse="auto",
                 amg_kwargs=None):
        from dune_pdelab_tpu.mesh.simplex import SimplexMesh
        from dune_pdelab_tpu.fe.basis import PkFEM
        from dune_pdelab_tpu.fe.quadrature import quadrature_rule
        from dune_pdelab_tpu.assembly.gridoperator import GridOperator

        space = go_dg.space
        assert space.is_leaf and space.fem.continuity == "DG"
        mesh = space.mesh
        self.go_dg = go_dg
        self.pre = pre_smooth
        self.post = post_smooth
        dim = mesh.dim
        self._is_simplex = isinstance(mesh, SimplexMesh)

        # conforming P1/Q1 subspace (cg_to_dg_prolongation.hh analog)
        cg_fem = PkFEM(1, dim) if self._is_simplex else QkFEM(1, dim)
        self.V_cg = FunctionSpace(mesh, cg_fem)
        self.cg_cg = make_constraints(bctype, self.V_cg)
        if coarse == "auto":
            coarse = "amg" if self._is_simplex else "gmg"
        self.coarse_kind = coarse
        self.gmg_lattice = None
        if coarse == "gmg":
            # stencil-resident lattice GMG for the CG coarse space when the
            # mesh/operator qualify: no fine-level index maps, every level
            # a compiled shift-MAC stencil — the general GeometricMultigrid
            # (gather/scatter transfers) dominated the V-cycle at 2M+ DOFs
            if not gmg_kwargs:   # explicit kwargs tune GeometricMultigrid
                try:
                    from dune_pdelab_tpu.linalg.gmg_lattice import LatticeGMG
                    from dune_pdelab_tpu.space.space import (
                        _leaf_boundary_dof_mask,
                    )
                    bmask = _leaf_boundary_dof_mask(self.V_cg)
                    if bool(np.all(
                            self.cg_cg.mask_np[np.nonzero(bmask)[0]])):
                        self.gmg_lattice = LatticeGMG(self.V_cg, cg_lop)
                except (ValueError, NotImplementedError, AssertionError):
                    self.gmg_lattice = None
            self.gmg = None if self.gmg_lattice is not None else \
                GeometricMultigrid(cg_lop, mesh, cg_fem,
                                   bctype=bctype, **(gmg_kwargs or {}))
            self._go_cg = None
        elif coarse == "amg":
            self.gmg = None
            self._amg_kwargs = amg_kwargs or {}
            self._go_cg = GridOperator(self.V_cg, cg_lop,
                                       constraints=self.cg_cg)
        else:
            raise ValueError(f"coarse={coarse!r}")

        # CG -> DG embedding weights W[j, c]: the element-local corner hat
        # function lambda_c expressed in the DG element basis via local L2
        # projection at quadrature points. P1/Q1 restricted to one element
        # lies IN the DG element space (k >= 1), so the projection is the
        # exact embedding — and unlike nodal interpolation it also serves
        # modal bases (Legendre/monomial/OPB).
        fem = space.fem
        nb = fem.nbasis
        qp, qw = quadrature_rule(fem.geometry, dim, 2 * fem.degree + 2)
        phi, _ = fem.tabulate(qp)                     # (nq, nb)
        lam, _ = cg_fem.tabulate(qp)                  # (nq, C)
        M = phi.T @ (qw[:, None] * phi)
        b = phi.T @ (qw[:, None] * lam)
        self._W = np.linalg.solve(M, b)               # (nb, C)
        self._corners = np.asarray(self.V_cg.element_dofs, np.int32)
        self.E = mesh.nelements
        self.nb = nb
        self._apply_jit = None
        self._setup_key = None
        self._bst_src = None

    def _prolong(self, xc):
        """CG vector -> DG vector (element-major DG layout)."""
        vals = xc[jnp.asarray(self._corners)]                 # (E, C)
        return jnp.einsum("jc,ec->ej",
                          jnp.asarray(self._W, xc.dtype), vals).reshape(-1)

    def _restrict(self, r_dg):
        """Transpose: DG residual -> CG residual (scatter-add corners)."""
        re = r_dg.reshape(self.E, self.nb)
        rc_e = jnp.einsum("jc,ej->ec", jnp.asarray(self._W, r_dg.dtype), re)
        rc = jnp.zeros(self.V_cg.ndofs, r_dg.dtype).at[
            jnp.asarray(self._corners)].add(rc_e)
        return jnp.where(self.cg_cg.mask, 0.0, rc)

    def setup(self, x_lin=None, time=0.0, operator=None):
        """operator: optional fast apply z -> A z at the linearization
        point (e.g. a compiled block stencil) used by the smoothers in
        place of the general jvp apply — the smoother dominates per-cycle
        cost, so this is the same speedup LinearSolverBackend gets from
        its stencil path. When None and the operator is linear, setup
        tries to compile one itself."""
        go = self.go_dg
        if x_lin is None:
            x_lin = jnp.zeros(go.space.ndofs)
        bst_src = operator if hasattr(operator, "W_taps") else None
        if operator is None and getattr(go.lop, "is_linear", False):
            try:
                from dune_pdelab_tpu.assembly.blockstencil import (
                    compile_block_stencil,
                )
                operator = compile_block_stencil(go, x_lin, time)
                bst_src = operator
                if operator is not None and jax.default_backend() != "cpu":
                    from dune_pdelab_tpu.assembly.blockstencil_mm import (
                        try_mm_block_stencil, MMBlockStencil,
                    )
                    mm = try_mm_block_stencil(operator, mode="mxu2")
                    if mm is not None:
                        operator = MMBlockStencil(mm)
            except Exception:
                operator = None
        if bst_src is None and getattr(operator, "apply_mm", None) is not None \
                and getattr(go.lop, "is_linear", False):
            # caller passed a lowered mm operator: recover the tap data
            # (proxy-probed for big meshes — cheap)
            try:
                from dune_pdelab_tpu.assembly.blockstencil import (
                    compile_block_stencil,
                )
                bst_src = compile_block_stencil(go, x_lin, time)
            except Exception:
                bst_src = None
        use_mm = (not self._is_simplex and self.gmg_lattice is not None
                  and getattr(operator, "apply_mm", None) is not None
                  and go.space.mesh.dim == 3)
        if bst_src is not None and not self._is_simplex:
            # block-diagonal inverses from the tap data alone: the element
            # diagonal block is W_taps[t0] + the dD_sides corrections of
            # whichever domain boundaries the element touches — 3^dim
            # distinct classes, inverted on the HOST. Probing would
            # materialize (E, nb, nb) on device, which the TPU tiling pads
            # 16x ((..., 8, 8) -> T(8,128)): 8 GB at 128^3, an OOM.
            self._bst_src = bst_src
            if use_mm:
                Dinv_host = None        # mm path builds Dmm on device
                Dinv = None             # from the 3^dim class table
            else:
                Dinv_host = self._class_block_inverses(bst_src)
                Dinv = jnp.asarray(Dinv_host)
        else:
            blocks = go.element_diagonal_blocks(x_lin, time)  # (E, nb, nb)
            # explicit block inverses: batched tiny TriangularSolves inside
            # the smoother loop are TPU-hostile (measured ~1.7 s/V-cycle at
            # 64^3); a one-time inverse turns each color step into a single
            # batched (nb,nb)@(nb,) matvec
            lu, piv = jax.scipy.linalg.lu_factor(blocks)
            eye = jnp.broadcast_to(
                jnp.eye(blocks.shape[-1], dtype=blocks.dtype), blocks.shape)
            Dinv = jax.scipy.linalg.lu_solve((lu, piv), eye)  # (E, nb, nb)
            Dinv_host = None
        if self.coarse_kind == "gmg":
            if self.gmg_lattice is not None:
                gl = self.gmg_lattice
                lmask = gl.stencils[0].mask

                def gmg_apply(rc):
                    # corrections vanish at (strongly) constrained CG dofs
                    return gl._vcycle(0, jnp.where(lmask, 0.0, rc))
            else:
                self.gmg.setup(None, 0.0)
                gmg_apply = self.gmg._apply_jit
        else:
            from dune_pdelab_tpu.linalg.amg import AlgebraicMultigrid
            self.amg = AlgebraicMultigrid(
                **self._amg_kwargs).setup_from_grid_operator(self._go_cg)
            gmg_apply = self.amg.apply
        A = (operator if operator is not None
             else (lambda z: go.jacobian_apply(x_lin, z, time)))
        nb, E = self.nb, self.E
        pre, post = self.pre, self.post
        prolong, restrict = self._prolong, self._restrict
        if self._is_simplex:
            colors = tuple(_greedy_element_colors(go.space.mesh))
        else:
            try:
                # DG blocks couple only through FACES (|mi_e - mi_f|_1 = 1),
                # so sum-parity gives a valid TWO-coloring — the 2^dim
                # DOF-closure checkerboard (checkerboard_colors, meant for
                # CG writes) costs 15 color steps per symmetric sweep in 3D
                # vs 3 here: a 5x cut in operator applies per V-cycle
                mi = go.space.mesh.element_multi_index()
                par = mi.sum(axis=1) % 2
                colors = tuple(
                    jnp.asarray(np.flatnonzero(par == c), jnp.int32)
                    for c in range(2))
            except Exception:
                colors = None   # fall back to block-Jacobi sweeps
        if colors is not None:
            # color steps as MASKED full-lattice updates instead of
            # gather/scatter on color index sets: the strided gathers
            # dominated the per-cycle cost on TPU, while a 0/1-mask
            # multiply is pure streaming. Solving ALL blocks each step
            # costs ~2x the lu_solve flops (tiny next to the operator
            # apply) and is mathematically identical.
            masks_np = np.zeros((len(colors), E), np.float64)
            for i, cidx in enumerate(colors):
                masks_np[i, cidx] = 1.0
            # palindromic schedule with consecutive repeats dropped: a
            # repeated color step after an exact block solve is a no-op
            # (same-color blocks are mutually decoupled in the DG face
            # graph), so [r,b,b,r] == [r,b,r] exactly — one fewer
            # operator apply per symmetric sweep.
            order = list(range(len(colors)))
            order += list(range(len(colors) - 2, -1, -1))
        else:
            masks_np, order = None, None

        def smooth(z, r, sweeps, z_is_zero=False):
            def solve_all(res):
                return jnp.einsum("ejk,ek->ej", Dinv.astype(res.dtype),
                                  res.reshape(E, nb), precision="highest")

            for s in range(sweeps):
                if colors is None:
                    fresh = z_is_zero and s == 0
                    res = r if fresh else r - A(z)
                    z = z + solve_all(res).reshape(-1)
                    continue
                for k, ci in enumerate(order):
                    fresh = z_is_zero and s == 0 and k == 0
                    res = r if fresh else r - A(z)
                    m = jnp.asarray(masks_np[ci], r.dtype)[:, None]
                    z = (z.reshape(E, nb) + m * solve_all(res)).reshape(-1)
            return z

        def apply(r):
            z = smooth(jnp.zeros_like(r), r, pre, z_is_zero=True)
            r2 = r - A(z)
            zc = gmg_apply(restrict(r2))
            z = z + prolong(zc)
            return smooth(z, r, post)

        # mm-resident V-cycle fast path: the (E, nb, nb) batched block
        # solves (16x tile padding: an OOM at 128^3) and per-step layout
        # transposes dominate the flat cycle on TPU; in the mode-major
        # layout every piece is plane-streaming (block solve = nb^2
        # per-plane FMAs, coarse transfer = 2^d strided slice adds)
        self._apply_host = None
        if use_mm and colors is not None:
            if Dinv_host is None and Dinv is not None:
                Dinv_host = np.asarray(Dinv)
            self._apply_jit, self._apply_host = self._build_mm_apply(
                (operator.apply_mm, operator.to_mm, operator.from_mm),
                Dinv_host, masks_np, order, gmg_apply)
        else:
            self._apply_jit = jax.jit(apply)

    def _class_inverse_table(self, bst):
        """Inverse diagonal blocks per BOUNDARY CLASS: the element block
        is W_taps[t0] + the dD_sides corrections of whichever domain
        boundaries the element touches — only 3^dim distinct blocks.
        Returns (3^dim, nb, nb) with class index
        sum_d cls_d * 3^d, cls_d in {0: lower bd, 1: interior, 2: upper}.
        Replaces per-element probing AND per-element storage: the full
        (E, nb, nb) array pads 16x under TPU tiling (OOM at 128^3) and
        costs a GB-scale relay upload."""
        cells = bst.cells
        dim = len(cells)
        nb = bst.nb
        t0 = int(np.nonzero(~np.any(bst.offsets, axis=1))[0][0])
        W0 = np.asarray(bst.W_taps[t0], np.float64)
        dD = np.asarray(bst.dD_sides, np.float64)      # (dim, 2, nb, nb)
        import itertools as _it
        table = np.empty((3 ** dim, nb, nb))
        for cls in _it.product(*[range(3)] * dim):
            D = W0.copy()
            for d in range(dim):
                if cls[d] == 0:
                    D = D + dD[d, 0]
                if cls[d] == 2:
                    D = D + dD[d, 1]
            idx = sum(c * 3 ** d for d, c in enumerate(cls))
            table[idx] = D
        return np.linalg.inv(table)

    def _class_block_inverses(self, bst):
        """Per-element inverse diagonal blocks via the class table (host
        numpy fancy-index — no per-element inversion)."""
        cells = bst.cells
        dim = len(cells)
        table = self._class_inverse_table(bst)
        idx = np.zeros(tuple(reversed(cells)), np.int64)
        for d in range(dim):
            ax = dim - 1 - d
            pos = np.zeros(cells[d], np.int64) + 1
            pos[0] = 0
            pos[-1] = 2
            shape = [1] * dim
            shape[ax] = cells[d]
            idx = idx + pos.reshape(shape) * (3 ** d)
        return table[idx.reshape(-1)]                  # (E, nb, nb)

    def _build_mm_apply(self, mm_parts, Dinv, masks_np, order, gmg_apply):
        """Mode-major two-level V-cycle on a 3D structured Q1-DG lattice:
        state lives as (nz, nb, ny, nx); the block-inverse application is
        an einsum over nb (nb^2 fused per-plane multiply-adds instead of
        2M tiny batched matvecs), the colored masks broadcast as element
        planes, and the DG<->CG transfer is W-weighted corner slice
        adds/gathers (the SlicedDofMap trick); flat layout only at
        entry/exit. reference cost-center analog:
        seq_amg_dg_backend.hh:146 (smoother choice dominates)."""
        import numpy as _np
        from dune_pdelab_tpu.fe.basis import _cached_fem

        apply_mm, to_mm, from_mm = mm_parts
        mesh = self.go_dg.space.mesh
        nxc, nyc, nzc = (int(c) for c in mesh.cells)
        nb = self.nb
        # Dmm is built ON DEVICE from the 3^dim class-inverse table +
        # iota position masks: uploading a materialized (nz,nb,nb,ny,nx)
        # array through the HTTP relay costs minutes (512 MB f32 at
        # 128^3) and stalled setup
        from jax import lax as _lax
        table = jnp.asarray(self._class_inverse_table(self._bst_src),
                            jnp.float32) if getattr(
            self, "_bst_src", None) is not None else None
        if table is not None:
            def _build_dmm(_token):
                xi = _lax.broadcasted_iota(jnp.int32, (nzc, nyc, nxc), 2)
                yi = _lax.broadcasted_iota(jnp.int32, (nzc, nyc, nxc), 1)
                zi = _lax.broadcasted_iota(jnp.int32, (nzc, nyc, nxc), 0)

                def cls(pos, n):
                    return jnp.where(pos == 0, 0,
                                     jnp.where(pos == n - 1, 2, 1))

                cidx = (cls(xi, nxc) + 3 * cls(yi, nyc)
                        + 9 * cls(zi, nzc))          # (nz, ny, nx)
                D = jnp.zeros((nzc, nb, nb, nyc, nxc), jnp.float32)
                for c in range(table.shape[0]):
                    m = (cidx == c).astype(jnp.float32)[:, None, None]
                    D = D + m * table[c][None, :, :, None, None]
                return D

            Dmm = jax.jit(_build_dmm)(0)
        else:
            Dmm = jnp.asarray(_np.transpose(
                _np.asarray(Dinv).reshape(nzc, nyc, nxc, nb, nb),
                (0, 3, 4, 1, 2)), jnp.float32)      # (nz, j, k, ny, nx)
        col_mm = jnp.asarray(
            masks_np.reshape(-1, nzc, nyc, nxc))[:, :, None]
        W = jnp.asarray(self._W)                    # (nb, C)
        mi = _np.asarray(_cached_fem("QkFEM", 1, 3)._mi)   # (C, 3) x,y,z
        pre, post = self.pre, self.post

        def solve_all(Dmm, res):
            return jnp.einsum("zjkyx,zkyx->zjyx", Dmm.astype(res.dtype),
                              res, precision="highest")

        def smooth(Dmm, col_mm, z, r, sweeps, z_is_zero=False):
            for s in range(sweeps):
                for k, ci in enumerate(order):
                    fresh = z_is_zero and s == 0 and k == 0
                    res = r if fresh else r - apply_mm(z)
                    z = z + col_mm[ci].astype(r.dtype) * solve_all(Dmm, res)
            return z

        def restrict_mm(r):
            rc = jnp.zeros((nzc + 1, nyc + 1, nxc + 1), r.dtype)
            for c in range(W.shape[1]):
                tmp = jnp.einsum("j,zjyx->zyx", W[:, c].astype(r.dtype), r)
                cx, cy, cz = (int(v) for v in mi[c])
                rc = rc.at[cz:cz + nzc, cy:cy + nyc, cx:cx + nxc].add(tmp)
            return rc

        def prolong_mm(zc):
            z = None
            for c in range(W.shape[1]):
                cx, cy, cz = (int(v) for v in mi[c])
                part = zc[cz:cz + nzc, cy:cy + nyc, cx:cx + nxc]
                t = (W[:, c].astype(zc.dtype)[None, :, None, None]
                     * part[:, None])
                z = t if z is None else z + t
            return z

        def apply_impl(r_flat, Dmm, col_mm):
            r = to_mm(r_flat)
            z = smooth(Dmm, col_mm, jnp.zeros_like(r), r, pre,
                       z_is_zero=True)
            r2 = r - apply_mm(z)
            rc = restrict_mm(r2)
            zc = gmg_apply(rc.reshape(-1)).reshape(rc.shape)
            z = z + prolong_mm(zc)
            z = smooth(Dmm, col_mm, z, r, post)
            return from_mm(z, r_flat.dtype)

        # Dmm (512 MB at 128^3) and the color planes enter as jit
        # ARGUMENTS: captured constants ship inside the remote-compile
        # request body (HTTP 413 at 16.8M DOFs)
        jitted = jax.jit(apply_impl)
        operands = (Dmm, col_mm)

        def apply(r_flat):
            return jitted(r_flat, *operands)

        # host-composed variant in THREE smaller jits: the single-program
        # V-cycle (6 Pallas applies + the whole lattice-GMG recursion +
        # transfers) exceeded what the remote TPU compiler finishes in
        # reasonable time at 16.8M DOFs (>55 min, never returned); three
        # moderate programs compile in minutes and cost 3 extra dispatches
        # (~8 ms) per preconditioner application
        def j1_impl(r_flat, Dmm, col_mm):
            r = to_mm(r_flat)
            z = smooth(Dmm, col_mm, jnp.zeros_like(r), r, pre,
                       z_is_zero=True)
            r2 = r - apply_mm(z)
            return z, restrict_mm(r2).reshape(-1)

        def j3_impl(z, zc_flat, r_flat, Dmm, col_mm):
            r = to_mm(r_flat)
            zc = zc_flat.reshape((self.go_dg.space.mesh.cells[2] + 1,
                                  self.go_dg.space.mesh.cells[1] + 1,
                                  self.go_dg.space.mesh.cells[0] + 1))
            z = z + prolong_mm(zc)
            z = smooth(Dmm, col_mm, z, r, post)
            return from_mm(z, r_flat.dtype)

        j1 = jax.jit(j1_impl)
        j2 = jax.jit(gmg_apply)
        j3 = jax.jit(j3_impl)

        def apply_host(r_flat):
            z, rc = j1(r_flat, *operands)
            zc = j2(rc)
            return j3(z, zc, r_flat, *operands)

        return apply, apply_host

    # -- LinearSolverBackend precond protocol -----------------------------
    def __call__(self, go, x_lin, time):
        key = (0 if getattr(self.go_dg.lop, "is_linear", False)
               else object())
        if self._apply_jit is None or self._setup_key != key:
            self.setup(x_lin, time)
            self._setup_key = key
        return self._apply_jit

    def apply(self, r):
        """Host-entry application: uses the split-jit composition when the
        mm path built one (the monolithic V-cycle program exceeds the
        remote compiler's practical budget at 10M+ DOFs); the traceable
        single-jit version remains available through __call__ for use
        inside outer jits."""
        if self._apply_jit is None:
            self.setup()
        if getattr(self, "_apply_host", None) is not None:
            return self._apply_host(r)
        return self._apply_jit(r)
