"""GridOperator: global residual / Jacobian assembly as batched kernels.

TPU-native analog of PDELab's grid operator layer (reference:
dune/pdelab/gridoperator/gridoperator.hh:35-240 facade;
gridoperator/default/assembler.hh:84-279 element sweep;
gridoperator/default/{residualengine,jacobianengine,jacobianapplyengine}.hh).

Design translation:
  * The sequential element loop + LFS bind/gather/scatter becomes ONE batched
    gather `x[element_dofs]`, ONE batched kernel call, ONE scatter-add — per
    integration domain (volume / boundary-face group / interior-face group).
  * The per-concern assembler engines collapse into a single traced residual;
    `jacobian_apply` is jax.jvp of it (replacing jacobianapplyengine.hh AND
    all NumericalJacobian mixins, reference: localoperator/
    numericaljacobian.hh:31); assembled Jacobians come from basis-vector jvp
    probing of the same kernels (replacing jacobianengine.hh).
  * The constrained scatter `etadd` (reference: gridoperator/common/
    assemblerutilities.hh:501-586, symmetric variant :466, trivial rows :666)
    becomes mask weighting of COO entries + unit diagonal on constrained rows.
  * Unique interior-face visits (`ids > idn`, assembler.hh:181) are the
    precomputed unique face list from the mesh.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from dune_pdelab_tpu.assembly.geometry import (
    VolumeGeometry, FaceGeometry, embed_face_points,
)
from dune_pdelab_tpu.fe.quadrature import quadrature_rule
from dune_pdelab_tpu.ops.base import (
    LeafTab, VolumeContext, FaceContext, SkeletonContext,
)
from dune_pdelab_tpu.utils.common import default_float


def _cat_leaf_dofs(maps):
    """Concatenate per-leaf (B, nloc_i) global-DOF maps -> (B, sum nloc_i)."""
    return np.concatenate([np.asarray(m, dtype=np.int64) for m in maps], axis=1)


def _affine_expand(cg, rows, cols, data):
    """Expand COO entries through hanging-node parent maps: P^T A P.

    rows/cols are static numpy; data is a traced jnp vector. Each entry
    (i, j, v) becomes {(p_r, p_c, w_r * w_c * v)} over the parents of i and
    j (identity for non-hanging DOFs).
    """
    indptr, pidx, pw = cg._parent_indptr, cg._parent_idx, cg._parent_w

    def expand(idx_static, other_static, src, mult):
        cnt = (indptr[idx_static + 1] - indptr[idx_static])
        rep = np.repeat(np.arange(len(idx_static)), cnt)
        # positions within each parent list
        pos = np.arange(len(rep)) - np.repeat(
            np.concatenate([[0], np.cumsum(cnt)[:-1]]), cnt)
        flat = indptr[idx_static][rep] + pos
        return (pidx[flat], other_static[rep], src[rep],
                mult[rep] * pw[flat])

    src = np.arange(len(rows))
    mult = np.ones(len(rows))
    new_rows, cols, src, mult = expand(rows, cols, src, mult)
    new_cols, new_rows, src, mult = expand(cols, new_rows, src, mult)
    data = data[jnp.asarray(src, jnp.int32)] * jnp.asarray(mult, data.dtype)
    return new_rows, new_cols, data


class _FaceGroupData:
    """Static per-group data for boundary or skeleton assembly."""
    __slots__ = ("axis", "side", "elements", "outside", "leaf_dofs_in",
                 "leaf_dofs_out", "tabs_in", "tabs_out", "factor", "normal",
                 "h_in", "h_out", "x", "weights", "tr_in", "tr_out", "sel_w")


class GridOperator:
    """Assembles residual / Jacobian of a LocalOperator over a function space.

    Galerkin only: trial space == test space (the overwhelmingly common case;
    PDELab's GFSU/GFSV split collapses).

    API parity with gridoperator.hh:168-205:
      residual(x)            -> r
      jacobian(x)            -> BCOO sparse matrix
      jacobian_apply(x, z)   -> J(x) z   (matrix-free)
      jacobian_diagonal(x)   -> diag(J)  (for Jacobi-type preconditioners)
      element_jacobians(x)   -> dense per-element blocks (block precondit.)
    """

    def __init__(self, space, lop, constraints=None, quad_order=None,
                 face_transfer: str = "auto", skip_boundary: bool = False,
                 volume_qp_loop: bool | None = None):
        self.space = space
        self.lop = lop
        self.cg = constraints
        self._face_transfer_mode = face_transfer  # 'auto' | 'index' (debug)
        self.leaves = space.leaves
        mesh = self.leaves[0].mesh
        for lf in self.leaves:
            if lf.mesh is not mesh:
                raise ValueError("all leaves must share one mesh")
        self.mesh = mesh
        self.nleaves = len(self.leaves)

        # local->global maps, one per leaf, plus the concatenated local
        # layout. Index ARRAYS are built lazily — the structured fast paths
        # (SlicedDofMap/ReshapeDofMap + compiled stencils) never touch
        # them, and at 100M+ DOFs they cost tens of GB (host + device).
        from dune_pdelab_tpu.assembly.dofmaps import make_leaf_dof_map
        self._leaf_maps_cache = None
        if space.is_leaf:
            # one leaf at offset 0: transfer strategy needs no index array
            self.dof_maps = [make_leaf_dof_map(space, None, offset=0)]
        else:
            leaf_maps = self._leaf_maps()
            self.dof_maps = []
            for lf, m in zip(self.leaves, leaf_maps):
                m64 = np.asarray(m, np.int64)
                off = int(m64.flat[0]) - int(
                    np.asarray(lf.element_dofs, np.int64).flat[0])
                contiguous = np.array_equal(
                    m64, off + np.asarray(lf.element_dofs, np.int64))
                self.dof_maps.append(
                    make_leaf_dof_map(lf, m64, offset=off if contiguous else None))
        self.local_sizes = tuple(lf.fem.nbasis for lf in self.leaves)
        self.nlocal = sum(self.local_sizes)
        self._leaf_dofs_cache = None
        self._gdofs_cat_cache = None

        degree = max(lf.fem.degree for lf in self.leaves)
        self.qorder = quad_order if quad_order is not None else lop.quad_order(degree)

        # --- volume precomputation ---------------------------------------
        qp, w = quadrature_rule(mesh.geometry_type, mesh.dim, self.qorder)
        self.vol_geo = VolumeGeometry(mesh, qp, w)
        self._vol_tabs = []
        for lf in self.leaves:
            self._vol_tabs.append(self._make_tab(lf, qp, self.vol_geo))
        self._vol_weights = w

        # qp-looped volume kernels (EXPERIMENTAL, opt-in): evaluate
        # alpha/lambda_volume once per quadrature point with (E, 1)-shaped
        # contexts instead of one (E, nqp)-batched call. Bit-identical for
        # qp-separable kernels (plain quadrature sums). The hypothesis was
        # that (E,)-sized intermediates fuse into fewer HBM streams than
        # the (E, nqp, ...) temporaries of the batched form — MEASURED
        # OTHERWISE on the v5e chip (Q1 3D varcoeff at 2M elements:
        # 38 M elem-res/s qp-looped vs 61.5 batched; XLA rematerializes
        # the coordinate/coefficient chain per qp instead of saving
        # traffic), so it stays off unless volume_qp_loop=True is passed.
        # Valid only for LOPs declaring `qp_separable` (kernels that
        # couple quadrature points, e.g. element-center evaluation via a
        # mean over qp, must keep the batched call).
        if volume_qp_loop:
            assert getattr(lop, "qp_separable", False), (
                "volume_qp_loop requires a qp_separable LocalOperator")
        self._qp_loop = bool(volume_qp_loop)

        # --- face precomputation -----------------------------------------
        self.has = {
            name: hasattr(lop, name)
            for name in ("alpha_volume", "lambda_volume", "alpha_boundary",
                         "lambda_boundary", "alpha_skeleton", "lambda_skeleton")
        }
        self.bnd_groups: list[_FaceGroupData] = []
        self.skel_groups: list[_FaceGroupData] = []
        if skip_boundary:
            # pure-Dirichlet shortcut: drop boundary kernels (the operator's
            # Neumann/outflow terms are known to vanish)
            self.has["alpha_boundary"] = False
            self.has["lambda_boundary"] = False
        needs_faces = (self.has["alpha_boundary"] or
                       self.has["lambda_boundary"] or
                       self.has["alpha_skeleton"])
        if needs_faces and not hasattr(mesh, "boundary_faces"):
            raise NotImplementedError(
                f"{type(mesh).__name__} provides no face lists; boundary/"
                "skeleton kernels need a structured or simplex mesh (for "
                "pure-Dirichlet problems pass skip_boundary=True)")
        if mesh.geometry_type == "simplex":
            if needs_faces:
                self._build_simplex_face_groups(self._leaf_maps())
        else:
            if self.has["alpha_boundary"] or self.has["lambda_boundary"]:
                self._build_boundary_groups(self._leaf_maps())
            if self.has["alpha_skeleton"]:
                self._build_skeleton_groups(self._leaf_maps())

        # --- selective assembly (skip_entity / skip_intersection) --------
        # reference: localoperator/interface.hh:121,137 skip_entity/
        # skip_intersection, dispatched by default/assembler.hh:123,161 —
        # realized TPU-natively as STATIC 0/1
        # element/face weights multiplied into local contributions before
        # scatter (constants fold at compile time; no data-dependent
        # control flow under jit). A skipped element drops its volume and
        # boundary kernels; a skeleton face is assembled only when BOTH
        # sides are active (clean subdomain semantics — the reference's
        # visit-order-dependent one-sided skip is not reproduced), further
        # masked by skip_intersection(face midpoints) when defined —
        # applied to BOTH skeleton and boundary faces, matching the
        # reference's skipIntersection check before classifyIntersection
        # (default/assembler.hh:161). The same masks are multiplied into
        # the jvp-probed jacobian blocks (_element_jacobians_impl,
        # _element_diagonal_blocks_impl, _all_jacobian_blocks), so
        # jacobian()/jacobian_diagonal() are exact derivatives of the
        # masked residual.
        # NOTE: a selective operator alone yields singular (zero) blocks
        # on fully-skipped elements — by design; selective operators are
        # meant to be summed with operators covering the complement
        # (CombinedOperator).
        self._sel_elem = None
        if hasattr(lop, "skip_entity") or hasattr(lop, "skip_intersection"):
            if not hasattr(mesh, "element_centers"):
                raise NotImplementedError(
                    "skip_entity/skip_intersection need element centers; "
                    f"{type(mesh).__name__} provides none")
            centers = np.asarray(mesh.element_centers(), np.float64)
            if hasattr(lop, "skip_entity"):
                skip_e = np.asarray(lop.skip_entity(jnp.asarray(centers)))
                act = (~skip_e.astype(bool)).astype(np.float64)
            else:
                act = np.ones(mesh.nelements, np.float64)
            if hasattr(lop, "skip_entity") and not np.all(act == 1.0):
                self._sel_elem = act
            for g in self.bnd_groups:
                w = act[np.asarray(g.elements)]
                if hasattr(lop, "skip_intersection"):
                    mid = self._boundary_face_midpoints(g, centers)
                    w = w * (~np.asarray(lop.skip_intersection(
                        jnp.asarray(mid))).astype(bool)).astype(np.float64)
                g.sel_w = None if np.all(w == 1.0) else w
            for g in self.skel_groups:
                ei, eo = np.asarray(g.elements), np.asarray(g.outside)
                w = act[ei] * act[eo]
                if hasattr(lop, "skip_intersection"):
                    mid = 0.5 * (centers[ei] + centers[eo])
                    w = w * (~np.asarray(lop.skip_intersection(
                        jnp.asarray(mid))).astype(bool)).astype(np.float64)
                g.sel_w = None if np.all(w == 1.0) else w

        # device-resident cache for large per-entity arrays (quadrature
        # positions, per-element geometry): without it every trace bakes
        # multi-100MB numpy constants into the jaxpr, which the XLA
        # constant-folder then chews on at compile time (minutes at 16M+
        # elements through the remote relay)
        self._dev_cache = {}

        # persistent jitted entry points (trace once per shape/dtype; the
        # FastDG lesson — gather/trace overhead dominates — applied to jit).
        # Assembly runs at FULL f32 matmul precision: TPU's default matmul
        # precision is bf16 operands, and bf16 noise in the quadrature
        # contractions is a silent accuracy killer (measured: an SIPG
        # solve whose RHS was assembled at default precision came out
        # 350x above the fp64 discretization floor; CPU f32 — true f32
        # matmuls — hits the floor). Correctness-first default; the hot
        # SpMV paths (compiled stencils / Pallas kernels) are exact f32
        # arithmetic and unaffected.
        def _precise(fn):
            def wrapped(*args):
                with jax.default_matmul_precision("highest"):
                    return fn(*args)
            return jax.jit(wrapped)

        self._residual_jit = _precise(self._residual_with_mask)
        self._japply_jit = _precise(self._japply_impl)
        self._ejac_jit = _precise(self._element_jacobians_impl)
        self._ediag_jit = _precise(self._element_diagonal_blocks_impl)
        self._jdiag_jit = _precise(self._jacobian_diagonal_impl)

    # ------------------------------------------------------------------
    # lazy index-array members
    # ------------------------------------------------------------------
    def _leaf_maps(self):
        """Per-leaf (E, nloc) global numpy DOF maps (built on first use)."""
        if self._leaf_maps_cache is None:
            if self.space.is_leaf:
                self._leaf_maps_cache = [self.space.element_dofs]
            else:
                self._leaf_maps_cache = self.space.leaf_element_dofs()
        return self._leaf_maps_cache

    @property
    def leaf_dofs(self):
        """Per-leaf int32 DOF maps (built on first use).

        Numpy, not jnp: first access may happen inside a jit trace, where
        creating device arrays would capture tracers in the cache.
        """
        if self._leaf_dofs_cache is None:
            self._leaf_dofs_cache = [np.asarray(m, np.int32)
                                     for m in self._leaf_maps()]
        return self._leaf_dofs_cache

    @property
    def elem_gdofs_cat(self):
        """(E, nlocal) concatenated numpy DOF map (built on first use)."""
        if self._gdofs_cat_cache is None:
            self._gdofs_cat_cache = _cat_leaf_dofs(self._leaf_maps())
        return self._gdofs_cat_cache

    # ------------------------------------------------------------------
    # setup of face groups
    # ------------------------------------------------------------------
    def _face_rule(self):
        return quadrature_rule("cube", self.mesh.dim - 1, self.qorder)

    def _face_transfers(self, leaf_dof_arrays, axis, lo, hi_off, roll=0):
        """Per-leaf face transfer strategies: slab slices for DG (reshape)
        leaves (assembly/dofmaps.py SlabFaceTransfer), index arrays else."""
        from dune_pdelab_tpu.assembly.dofmaps import (
            IndexFaceTransfer, ReshapeDofMap, SlabFaceTransfer,
        )
        out = []
        for dm, arr in zip(self.dof_maps, leaf_dof_arrays):
            if (isinstance(dm, ReshapeDofMap)
                    and self._face_transfer_mode == "auto"):
                out.append(SlabFaceTransfer(dm.offset, self.mesh.cells,
                                            dm.nb, axis, lo, hi_off, roll))
            else:
                out.append(IndexFaceTransfer(arr))
        return out

    def _make_tab(self, lf, pts_ref, geo=None):
        """Raw tab tuple for a leaf at reference points; handles scalar and
        H(div) (Piola-mapped) elements. Uniform-mesh geometry only for the
        fast paths; `geo` covers the general volume case for scalars."""
        fem = lf.fem
        if fem.continuity == "Hdiv":
            if not self.mesh.uniform:
                if self.mesh.geometry_type != "simplex":
                    vecs, divs = self._mapped_cube_piola(fem, pts_ref)
                    return (None, None, None, fem.degree, vecs, divs, None)
                vecs, divs = self._simplex_piola(lf, pts_ref)
                return (None, None, None, fem.degree, vecs, divs, None)
            h = self.mesh.h
            detJ = float(np.prod(h))
            vecs = fem.tabulate_vector(pts_ref) * (h / detJ)  # contravariant
            divs = fem.tabulate_div(pts_ref) / detJ
            return (None, None, None, fem.degree, vecs, divs, None)
        if fem.continuity == "Hcurl":
            if not self.mesh.uniform:
                if self.mesh.geometry_type != "simplex":
                    vecs, curls = self._mapped_cube_covariant(fem, pts_ref)
                    return (None, None, None, fem.degree, vecs, None, curls)
                vecs, curls = self._simplex_covariant(lf, pts_ref)
                return (None, None, None, fem.degree, vecs, None, curls)
            h = self.mesh.h
            detJ = float(np.prod(h))
            vecs = fem.tabulate_vector(pts_ref) / h           # covariant
            curls = fem.tabulate_curl(pts_ref)
            if curls.ndim == 2:                               # 2D scalar curl
                curls = curls / detJ
            else:                                             # 3D vector curl
                curls = curls * (h / detJ)
            return (None, None, None, fem.degree, vecs, None, curls)
        vals, grads = fem.tabulate(pts_ref)
        if geo is not None:
            gphys = geo.transform_grad(grads)
        else:
            gphys = (grads / self.mesh.h)[None]
        return (vals, gphys, grads, fem.degree, None, None, None)

    def _mapped_cube_geometry(self, pts_ref, elements=None):
        """Per-element Q1-map Jacobians at reference points on a mapped
        (multilinear) cube mesh: J (E, q, d, d), detJ (E, q)."""
        from dune_pdelab_tpu.fe.basis import _cached_fem
        corners = self.mesh.element_corner_coords()          # (E, C, d)
        if elements is not None:
            corners = corners[elements]
        geo = _cached_fem("QkFEM", 1, self.mesh.dim)
        _, dN = geo.tabulate(pts_ref)                        # (q, C, d)
        J = np.einsum("eci,qcj->eqij", corners, dN)          # (E, q, d, d)
        detJ = np.linalg.det(J)
        if np.any(detJ <= 0):
            raise ValueError("mapped cube mesh has non-positive Jacobians "
                             "(flipped/degenerate elements)")
        return J, detJ

    def _mapped_cube_piola(self, fem, pts_ref, elements=None):
        """Contravariant Piola on multilinear cube elements: the transform
        vec = J v_ref / det J, div = div_ref / det J holds EXACTLY for
        non-affine maps (standard Piola identity), so per-qp Jacobians are
        all that is needed. Orientation is the logical-lattice convention
        of the structured H(div) DOF map — consistent without per-face
        signs as in the uniform case, valid because the map is continuous
        and orientation-preserving (detJ > 0 checked).
        reference: the geometry-general Piola machinery of
        dune/pdelab/finiteelementmap/raviartthomasfem.hh +
        common/geometrywrapper.hh."""
        J, detJ = self._mapped_cube_geometry(pts_ref, elements)
        v_ref = fem.tabulate_vector(pts_ref)                 # (q, nb, d)
        d_ref = fem.tabulate_div(pts_ref)                    # (q, nb)
        vec = (np.einsum("eqij,qbj->eqbi", J, v_ref)
               / detJ[:, :, None, None])
        div = d_ref[None] / detJ[:, :, None]
        return vec, div

    def _mapped_cube_covariant(self, fem, pts_ref, elements=None):
        """Covariant Piola (H(curl)) on multilinear cube elements:
        vec = J^{-T} v_ref; curl = curl_ref / det J (2D scalar) or
        J curl_ref / det J (3D vector) — exact identities for general
        maps. reference: edges0.5fem.hh + geometry wrappers."""
        J, detJ = self._mapped_cube_geometry(pts_ref, elements)
        invT = np.linalg.inv(J).transpose(0, 1, 3, 2)        # (E, q, d, d)
        v_ref = fem.tabulate_vector(pts_ref)                 # (q, nb, d)
        c_ref = fem.tabulate_curl(pts_ref)
        vec = np.einsum("eqij,qbj->eqbi", invT, v_ref)
        if c_ref.ndim == 2:                                  # 2D scalar curl
            curl = c_ref[None] / detJ[:, :, None]
        else:                                                # 3D vector curl
            curl = (np.einsum("eqij,qbj->eqbi", J, c_ref)
                    / detJ[:, :, None, None])
        return vec, curl

    def _simplex_piola(self, lf, pts_ref, elements=None):
        """Per-element contravariant Piola tabulation on affine simplices:
        vec (E, nqp, nb, d) = sign * J v_ref / det J, div (E, nqp, nb) =
        sign * div_ref / det J. Signs are the space layer's global-normal
        orientation (space/space.py _build_hdiv_map_simplex)."""
        fem = lf.fem
        cc = self.mesh.element_corner_coords()
        if elements is not None:
            cc = cc[elements]
        # P1 node order: xi_i is moved by node (d1-1-i); J columns follow
        dim = self.mesh.dim
        J = np.stack([cc[:, dim - i] - cc[:, 0] for i in range(dim)],
                     axis=-1)
        detJ = np.linalg.det(J)
        signs = lf._hdiv_signs
        if elements is not None:
            signs = signs[elements]
        v_ref = fem.tabulate_vector(pts_ref)          # (q, nb, d)
        d_ref = fem.tabulate_div(pts_ref)             # (q, nb)
        vec = (np.einsum("eij,qbj->eqbi", J, v_ref)
               / detJ[:, None, None, None] * signs[:, None, :, None])
        div = d_ref[None] / detJ[:, None, None] * signs[:, None, :]
        return vec, div

    def _simplex_covariant(self, lf, pts_ref, elements=None):
        """Per-element covariant Piola tabulation on affine simplices
        (H(curl)): vec (E, nqp, nb, d) = sign * J^{-T} v_ref; curl is
        sign * curl_ref / det J (2D scalar) or sign * J curl_ref / det J
        (3D vector). Signs are the global edge directions
        (space/space.py _build_hcurl_map_simplex)."""
        fem = lf.fem
        cc = self.mesh.element_corner_coords()
        if elements is not None:
            cc = cc[elements]
        dim = self.mesh.dim
        J = np.stack([cc[:, dim - i] - cc[:, 0] for i in range(dim)],
                     axis=-1)
        detJ = np.linalg.det(J)
        invT = np.swapaxes(np.linalg.inv(J), -1, -2)      # J^{-T}
        signs = lf._hcurl_signs
        if elements is not None:
            signs = signs[elements]
        v_ref = fem.tabulate_vector(pts_ref)              # (q, nb, d)
        c_ref = fem.tabulate_curl(pts_ref)                # (q, nb)[, 3]
        vec = (np.einsum("eij,qbj->eqbi", invT, v_ref)
               * signs[:, None, :, None])
        if c_ref.ndim == 2:                               # 2D scalar curl
            curl = c_ref[None] / detJ[:, None, None] * signs[:, None, :]
        else:                                             # 3D vector curl
            curl = (np.einsum("eij,qbj->eqbi", J, c_ref)
                    / detJ[:, None, None, None]
                    * signs[:, None, :, None])
        return vec, curl

    def _tab_at(self, pts_ref, geo: FaceGeometry):
        """Per-leaf raw tabs at embedded face points (uniform geometry)."""
        return [self._make_tab(lf, pts_ref) for lf in self.leaves]

    def _build_boundary_groups(self, leaf_maps):
        mesh = self.mesh
        bf = mesh.boundary_faces()
        qpf, wf = self._face_rule()
        for a in range(mesh.dim):
            for s in (0, 1):
                sel = np.nonzero((bf["axis"] == a) & (bf["side"] == s))[0]
                if len(sel) == 0:
                    continue
                g = _FaceGroupData()
                g.axis, g.side = a, s
                g.elements = bf["element"][sel]
                g.outside = None
                g.leaf_dofs_in = [m[g.elements] for m in leaf_maps]
                g.leaf_dofs_out = None
                c_a = mesh.cells[a]
                g.tr_in = self._face_transfers(
                    g.leaf_dofs_in, a,
                    lo=(0 if s == 0 else c_a - 1),
                    hi_off=(1 - c_a if s == 0 else 0))
                g.tr_out = None
                pts = embed_face_points(qpf, a, s, mesh.dim)
                g.weights = wf
                if mesh.uniform:
                    fgeo = FaceGeometry(mesh, a, qpf, wf)
                    g.tabs_in = self._tab_at(pts, fgeo)
                    g.factor = fgeo.factor
                    n = np.zeros(mesh.dim)
                    n[a] = 2.0 * s - 1.0
                    g.normal = n
                    g.h_in = fgeo.h_normal
                    origins = (mesh.lower
                               + mesh.element_multi_index() * mesh.h)[
                                   g.elements]
                    g.x = origins[:, None, :] + (pts * mesh.h)[None]
                else:
                    self._mapped_boundary_geometry(g, pts, wf)
                g.tabs_out = None
                g.h_out = None
                self.bnd_groups.append(g)

    def _mapped_boundary_geometry(self, g, pts, wf):
        """Per-face geometry + tabs for a boundary group on a MAPPED
        (multilinear) cube mesh. Nanson's formula gives the outward normal
        and surface measure in one step: n dS = det J * J^{-T} N dS_ref
        with N = +-e_axis the reference outward normal — exact for
        non-affine Q1 maps. Gradients/Piola tabs are per-face per-qp.
        reference: IntersectionGeometry over general geometries
        (common/geometrywrapper.hh; default/assembler.hh face sweep)."""
        mesh = self.mesh
        dim = mesh.dim
        el = g.elements
        J, detJ = self._mapped_cube_geometry(pts, elements=el)  # (F,q,d,d)
        invT = np.linalg.inv(J).transpose(0, 1, 3, 2)
        Nref = np.zeros(dim)
        Nref[g.axis] = 2.0 * g.side - 1.0
        nvec = np.einsum("fqij,j->fqi", invT, Nref)
        scale = np.linalg.norm(nvec, axis=-1)                   # (F, q)
        g.normal = nvec / scale[..., None]                      # (F, q, d)
        g.factor = wf[None, :] * detJ * scale                   # (F, q)
        from dune_pdelab_tpu.fe.basis import _cached_fem
        geoQ1 = _cached_fem("QkFEM", 1, dim)
        N, _ = geoQ1.tabulate(pts)                              # (q, C)
        corners = mesh.element_corner_coords()[el]              # (F, C, d)
        g.x = np.einsum("qc,fcd->fqd", N, corners)              # (F, q, d)
        area = (wf[None, :] * detJ * scale).sum(axis=1)
        cellvol = np.asarray(self.vol_geo.cell_volume)[el]
        g.h_in = cellvol / np.maximum(area, 1e-300)             # (F,)
        g.tabs_in = self._mapped_face_tabs(pts, el, invT)

    def _mapped_face_tabs(self, pts, elements, invT):
        """Per-leaf per-face tabulations at embedded face points of a
        mapped cube mesh (gradients/Piola transformed by the adjacent
        element's Jacobians at those points)."""
        tabs = []
        for lf in self.leaves:
            fem = lf.fem
            if fem.continuity == "Hdiv":
                vec, dv = self._mapped_cube_piola(fem, pts,
                                                  elements=elements)
                tabs.append((None, None, None, fem.degree, vec, dv, None))
                continue
            if fem.continuity == "Hcurl":
                vec, cl = self._mapped_cube_covariant(fem, pts,
                                                      elements=elements)
                tabs.append((None, None, None, fem.degree, vec, None, cl))
                continue
            vals, gref = fem.tabulate(pts)
            gphys = np.einsum("fqij,qbj->fqbi", invT, gref)
            tabs.append((vals, gphys, gref, fem.degree, None, None, None))
        return tabs

    def _build_skeleton_groups(self, leaf_maps):
        mesh = self.mesh
        itf = mesh.interior_faces()
        qpf, wf = self._face_rule()
        for a in range(mesh.dim):
            sel = np.nonzero(itf["axis"] == a)[0]
            if len(sel) == 0:
                continue
            g = _FaceGroupData()
            g.axis, g.side = a, None
            g.elements = itf["inside"][sel]
            g.outside = itf["outside"][sel]
            g.leaf_dofs_in = [m[g.elements] for m in leaf_maps]
            g.leaf_dofs_out = [m[g.outside] for m in leaf_maps]
            if mesh.periodic[a]:
                g.tr_in = self._face_transfers(g.leaf_dofs_in, a, 0, 0)
                g.tr_out = self._face_transfers(g.leaf_dofs_out, a, 0, 0,
                                                roll=1)
            else:
                g.tr_in = self._face_transfers(g.leaf_dofs_in, a, 0, -1)
                g.tr_out = self._face_transfers(g.leaf_dofs_out, a, 1, 0)
            pts_in = embed_face_points(qpf, a, 1, mesh.dim)   # upper face of inside
            pts_out = embed_face_points(qpf, a, 0, mesh.dim)  # lower face of outside
            g.weights = wf
            if mesh.uniform:
                fgeo = FaceGeometry(mesh, a, qpf, wf)
                g.tabs_in = self._tab_at(pts_in, fgeo)
                g.tabs_out = self._tab_at(pts_out, fgeo)
                g.factor = fgeo.factor
                n = np.zeros(mesh.dim)
                n[a] = 1.0   # inside -> outside
                g.normal = n
                g.h_in = fgeo.h_normal
                g.h_out = fgeo.h_normal
                origins = (mesh.lower
                           + mesh.element_multi_index() * mesh.h)[g.elements]
                g.x = origins[:, None, :] + (pts_in * mesh.h)[None]
            else:
                self._mapped_skeleton_geometry(g, pts_in, pts_out, wf)
            self.skel_groups.append(g)

    def _mapped_skeleton_geometry(self, g, pts_in, pts_out, wf):
        """Two-sided face geometry on a MAPPED (multilinear) cube mesh —
        the round-4 boundary Nanson machinery generalized to skeleton
        faces (closes the geometry-wrappers partial of VERDICT r4 item 7).
        The shared face is parametrized by the INSIDE element's Q1 map
        restricted to its upper face (identical to the outside element's
        lower-face restriction: both interpolate the same four corner
        nodes, so normals/measures/x agree); gradients on each side are
        transformed by that side's own Jacobians at the same physical
        points. reference: IntersectionGeometry over general geometries
        (common/geometrywrapper.hh:119 ff, consumed by
        localoperator/convectiondiffusiondg.hh:271)."""
        mesh = self.mesh
        dim = mesh.dim
        ei, eo = g.elements, g.outside
        J_in, detJ_in = self._mapped_cube_geometry(pts_in, elements=ei)
        invT_in = np.linalg.inv(J_in).transpose(0, 1, 3, 2)
        Nref = np.zeros(dim)
        Nref[g.axis] = 1.0                          # inside -> outside
        nvec = np.einsum("fqij,j->fqi", invT_in, Nref)
        scale = np.linalg.norm(nvec, axis=-1)                   # (F, q)
        g.normal = nvec / scale[..., None]                      # (F, q, d)
        g.factor = wf[None, :] * detJ_in * scale                # (F, q)
        from dune_pdelab_tpu.fe.basis import _cached_fem
        geoQ1 = _cached_fem("QkFEM", 1, dim)
        N, _ = geoQ1.tabulate(pts_in)                           # (q, C)
        corners = mesh.element_corner_coords()[ei]              # (F, C, d)
        g.x = np.einsum("qc,fcd->fqd", N, corners)              # (F, q, d)
        area = g.factor.sum(axis=1)
        cellvol = np.asarray(self.vol_geo.cell_volume)
        g.h_in = cellvol[ei] / np.maximum(area, 1e-300)         # (F,)
        g.h_out = cellvol[eo] / np.maximum(area, 1e-300)
        g.tabs_in = self._mapped_face_tabs(pts_in, ei, invT_in)
        J_out, _ = self._mapped_cube_geometry(pts_out, elements=eo)
        invT_out = np.linalg.inv(J_out).transpose(0, 1, 3, 2)
        g.tabs_out = self._mapped_face_tabs(pts_out, eo, invT_out)

    def _boundary_face_midpoints(self, g, centers):
        """Physical midpoints of a boundary face group, for
        skip_intersection evaluation (reference: default/assembler.hh:161
        checks skipIntersection on every intersection, boundary included).
        Simplex groups carry physical quadrature points (exact mean);
        uniform structured groups shift the cell center by h/2 along the
        face axis; otherwise the cell center is used (within-h
        approximation, adequate for the subdomain-mask use case)."""
        els = np.asarray(g.elements)
        if getattr(g, "x", None) is not None:
            return np.asarray(g.x).mean(axis=1)
        mid = centers[els].copy()
        if getattr(g, "axis", None) is not None and getattr(
                self.mesh, "uniform", False):
            h = np.asarray(self.mesh.h, np.float64)
            mid[:, g.axis] += (2 * g.side - 1) * 0.5 * h[g.axis]
        return mid

    def _build_simplex_face_groups(self, leaf_maps):
        """Face groups on simplex meshes (reference: the intersection sweep
        of gridoperator/default/assembler.hh:156-252 generalized to any
        grid). Faces are grouped by their local-embedding configuration —
        the positions of the canonically (sorted-globally) ordered face
        vertices inside each adjacent cell — so basis tabulations are shared
        per group while normals, measures, and physical gradients vary per
        face (affine geometry)."""
        from dune_pdelab_tpu.assembly.dofmaps import IndexFaceTransfer

        mesh = self.mesh
        dim = mesh.dim
        for lf in self.leaves:
            if lf.fem.continuity == "Hcurl":
                raise NotImplementedError(
                    "simplex face integrals for H(curl) elements")
        qpf, wf = quadrature_rule("simplex", dim - 1, self.qorder)
        lam = np.concatenate(
            [1.0 - qpf.sum(axis=1, keepdims=True), qpf], axis=1)  # (nqp, d)
        # reference coords of local vertex v = the P1 geometry map's node v
        # (the same convention VolumeGeometry's corner map uses)
        from dune_pdelab_tpu.fe.basis import _cached_fem
        ref_corners = _cached_fem("PkFEM", 1, dim).nodes          # (d+1, dim)
        verts = mesh.vertices
        cells = mesh.cells
        jacT = np.asarray(self.vol_geo.jac_inv_T)[:, 0]           # (E, d, d)
        cellvol = np.asarray(self.vol_geo.cell_volume)
        d1 = dim + 1
        locs = np.array([[v for v in range(d1) if v != l] for l in range(d1)])
        ref_face_vol = float(wf.sum())

        def face_geometry(cellids, locfaces):
            gv_raw = cells[cellids[:, None], locs[locfaces]]      # (F, d)
            canon = np.sort(gv_raw, axis=1)
            pos = (cells[cellids][:, :, None]
                   == canon[:, None, :]).argmax(axis=1)           # (F, d)
            A = verts[canon]                                      # (F, d, dim)
            edges = A[:, 1:] - A[:, :1]                           # (F, d-1, dim)
            G = np.einsum("fid,fjd->fij", edges, edges)
            dens = np.sqrt(np.abs(np.linalg.det(G)))              # (F,)
            if dim == 2:
                t = edges[:, 0]
                n = np.stack([t[:, 1], -t[:, 0]], axis=1)
            else:
                n = np.cross(edges[:, 0], edges[:, 1])
            n = n / np.linalg.norm(n, axis=1, keepdims=True)
            opp = verts[cells[cellids, locfaces]]                 # (F, dim)
            flip = np.einsum("fd,fd->f", n, A[:, 0] - opp) < 0
            n[flip] *= -1.0
            x = np.einsum("qj,fjd->fqd", lam, A)
            return canon, pos, dens, n, x

        def tabs_for(pts_ref, cellids):
            out = []
            for lf in self.leaves:
                if lf.fem.continuity == "Hdiv":
                    vec, dv = self._simplex_piola(lf, pts_ref,
                                                  elements=cellids)
                    out.append((None, None, None, lf.fem.degree,
                                vec, dv, None))
                    continue
                vals, gref = lf.fem.tabulate(pts_ref)
                gphys = np.einsum("fij,qbj->fqbi", jacT[cellids], gref)
                out.append((vals, gphys, gref, lf.fem.degree,
                            None, None, None))
            return out

        if self.has["alpha_boundary"] or self.has["lambda_boundary"]:
            bf = mesh.boundary_faces()
            cellids, locfaces = bf["element"], bf["local_face"]
            _, pos, dens, n, x = face_geometry(cellids, locfaces)
            _, inv = np.unique(pos, axis=0, return_inverse=True)
            for ci in range(inv.max() + 1 if len(cellids) else 0):
                sel = np.nonzero(inv == ci)[0]
                e_sel = cellids[sel]
                pts = lam @ ref_corners[pos[sel[0]]]
                g = _FaceGroupData()
                g.axis, g.side = None, None
                g.elements = e_sel
                g.outside = None
                g.leaf_dofs_in = [m[e_sel] for m in leaf_maps]
                g.leaf_dofs_out = None
                g.tr_in = [IndexFaceTransfer(a) for a in g.leaf_dofs_in]
                g.tr_out = None
                g.tabs_in = tabs_for(pts, e_sel)
                g.tabs_out = None
                g.factor = wf[None, :] * dens[sel][:, None]
                g.normal = n[sel][:, None, :]                     # (F, 1, d)
                g.h_in = cellvol[e_sel] / (dens[sel] * ref_face_vol)
                g.h_out = None
                g.weights = wf
                g.x = x[sel]
                self.bnd_groups.append(g)

        if self.has["alpha_skeleton"]:
            itf = mesh.interior_faces()
            cin, fin = itf["inside"], itf["face_in"]
            cout, fout = itf["outside"], itf["face_out"]
            _, pos_i, dens, n, x = face_geometry(cin, fin)
            _, pos_o, _, _, _ = face_geometry(cout, fout)
            _, inv = np.unique(np.concatenate([pos_i, pos_o], axis=1),
                               axis=0, return_inverse=True)
            for ci in range(inv.max() + 1 if len(cin) else 0):
                sel = np.nonzero(inv == ci)[0]
                ei, eo = cin[sel], cout[sel]
                pts_in = lam @ ref_corners[pos_i[sel[0]]]
                pts_out = lam @ ref_corners[pos_o[sel[0]]]
                g = _FaceGroupData()
                g.axis, g.side = None, None
                g.elements = ei
                g.outside = eo
                g.leaf_dofs_in = [m[ei] for m in leaf_maps]
                g.leaf_dofs_out = [m[eo] for m in leaf_maps]
                g.tr_in = [IndexFaceTransfer(a) for a in g.leaf_dofs_in]
                g.tr_out = [IndexFaceTransfer(a) for a in g.leaf_dofs_out]
                g.tabs_in = tabs_for(pts_in, ei)
                g.tabs_out = tabs_for(pts_out, eo)
                g.factor = wf[None, :] * dens[sel][:, None]
                g.normal = n[sel][:, None, :]
                fmeas = dens[sel] * ref_face_vol
                g.h_in = cellvol[ei] / fmeas
                g.h_out = cellvol[eo] / fmeas
                g.weights = wf
                g.x = x[sel]
                self.skel_groups.append(g)

    # ------------------------------------------------------------------
    # in-trace context construction
    # ------------------------------------------------------------------
    def _dev(self, arr, dtype):
        """Memoized device copy of a (possibly large) numpy array. The
        jitted entry points close over these as device-resident constants
        instead of re-staging numpy data every trace. Inside a trace the
        conversion would produce a tracer — never cache those; the public
        wrappers call `warm_device_cache` eagerly first."""
        key = (id(arr), jnp.dtype(dtype).name)
        v = self._dev_cache.get(key)
        if v is None:
            v = jnp.asarray(arr, dtype)
            if isinstance(v, jax.Array) and not isinstance(
                    v, jax.core.Tracer):
                self._dev_cache[key] = v
        return v

    def warm_device_cache(self, dtype):
        """Eagerly build all context device arrays OUTSIDE any trace (so
        in-jit ctx construction only reads the memo)."""
        key = ("warm", jnp.dtype(dtype).name)
        if key in self._dev_cache:
            return
        self._dev_cache[key] = True
        self._volume_ctx(0.0, dtype)
        for g in self.bnd_groups:
            self._face_ctx(g, 0.0, dtype)
        for g in self.skel_groups:
            self._skel_ctx(g, 0.0, dtype)

    def _warm_for(self, x):
        if not isinstance(x, jax.core.Tracer):
            self.warm_device_cache(x.dtype)

    def _leaf_tabs(self, raw_tabs, dtype):
        out = []
        for t in raw_tabs:
            v, gphys, gref, deg = t[0], t[1], t[2], t[3]
            vec = t[4] if len(t) > 4 else None
            dv = t[5] if len(t) > 5 else None
            cl = t[6] if len(t) > 6 else None
            out.append(LeafTab(
                phi=None if v is None else self._dev(v, dtype),
                grad=None if gphys is None else self._dev(gphys, dtype),
                ref_grad=None if gref is None else self._dev(gref, dtype),
                degree=deg,
                vec_phi=None if vec is None else self._dev(vec, dtype),
                div=None if dv is None else self._dev(dv, dtype),
                curl=None if cl is None else self._dev(cl, dtype),
            ))
        return tuple(out)

    def _volume_ctx(self, time, dtype) -> VolumeContext:
        vg = self.vol_geo
        if self.mesh.uniform:
            x = (
                self._dev(vg.origins, dtype)[:, None, :]
                + jnp.asarray(vg.qp_phys_offset, dtype)[None]
            )
        else:
            x = self._dev(vg.qp_phys, dtype)
        return VolumeContext(
            weights=jnp.asarray(vg.weights, dtype),
            x=x,
            factor=self._dev(vg.factor, dtype),
            tabs=self._leaf_tabs(self._vol_tabs, dtype),
            jac_inv_T=self._dev(vg.jac_inv_T, dtype),
            cell_volume=self._dev(vg.cell_volume, dtype),
            time=time,
        )

    def _face_ctx(self, g: _FaceGroupData, time, dtype) -> FaceContext:
        return FaceContext(
            weights=jnp.asarray(g.weights, dtype),
            x=self._dev(g.x, dtype),
            factor=self._dev(g.factor, dtype),
            normal=self._dev(g.normal, dtype),
            tabs=self._leaf_tabs(g.tabs_in, dtype),
            h_inside=self._dev(g.h_in, dtype),
            time=time,
        )

    def _skel_ctx(self, g: _FaceGroupData, time, dtype) -> SkeletonContext:
        return SkeletonContext(
            weights=jnp.asarray(g.weights, dtype),
            x=self._dev(g.x, dtype),
            factor=self._dev(g.factor, dtype),
            normal=self._dev(g.normal, dtype),
            tabs_in=self._leaf_tabs(g.tabs_in, dtype),
            tabs_out=self._leaf_tabs(g.tabs_out, dtype),
            h_inside=self._dev(g.h_in, dtype),
            h_outside=self._dev(g.h_out, dtype),
            time=time,
        )

    # ------------------------------------------------------------------
    # residual
    # ------------------------------------------------------------------
    def _pack(self, r_loc):
        """Normalize kernel output to a per-leaf tuple."""
        if self.nleaves == 1:
            return (r_loc,) if not isinstance(r_loc, tuple) else r_loc
        return tuple(r_loc)

    def _uarg(self, u_leaf):
        return u_leaf[0] if self.nleaves == 1 else tuple(u_leaf)

    def _gather(self, x, dof_maps):
        return [x[jnp.asarray(m, jnp.int32)] if not isinstance(m, jnp.ndarray)
                else x[m] for m in dof_maps]

    def _scatter_add(self, r, dof_maps, r_loc):
        for m, rl in zip(dof_maps, self._pack(r_loc)):
            idx = m if isinstance(m, jnp.ndarray) else jnp.asarray(m, jnp.int32)
            r = r.at[idx].add(rl.astype(r.dtype))
        return r

    def _qp_sliced_ctx(self, vctx, q):
        """Single-quadrature-point view of a volume context (qp-loop)."""
        from dune_pdelab_tpu.ops.base import LeafTab, VolumeContext
        tabs = tuple(LeafTab(
            phi=None if t.phi is None else t.phi[q:q + 1],
            grad=None if t.grad is None else t.grad[:, q:q + 1],
            ref_grad=None if t.ref_grad is None else t.ref_grad[q:q + 1],
            degree=t.degree) for t in vctx.tabs)
        return VolumeContext(
            weights=vctx.weights[q:q + 1],
            x=vctx.x[:, q:q + 1],
            factor=vctx.factor[:, q:q + 1],
            tabs=tabs,
            jac_inv_T=vctx.jac_inv_T,
            cell_volume=vctx.cell_volume,
            time=vctx.time)

    def _vol_call(self, fn, vctx, *args):
        """Volume kernel dispatch: batched, or per-qp summed (qp-loop)."""
        if not self._qp_loop:
            return fn(vctx, *args)
        nqp = vctx.weights.shape[0]
        acc = None
        for q in range(nqp):
            out = fn(self._qp_sliced_ctx(vctx, q), *args)
            acc = out if acc is None else jax.tree_util.tree_map(
                lambda a, b: a + b, acc, out)
        return acc

    def _scatter_vol(self, r, r_loc):
        for dm, rl in zip(self.dof_maps, self._pack(r_loc)):
            if self._sel_elem is not None:     # selective assembly mask
                rl = rl * jnp.asarray(self._sel_elem, rl.dtype).reshape(
                    (-1,) + (1,) * (rl.ndim - 1))
            r = dm.scatter_add(r, rl)
        return r

    def residual_unconstrained(self, x, time=0.0):
        """Assembled residual WITHOUT the constrained-row zeroing."""
        dtype = x.dtype
        lop = self.lop.set_time(time)
        r = jnp.zeros_like(x)
        u_leaf = [dm.gather(x) for dm in self.dof_maps]
        vctx = self._volume_ctx(time, dtype)
        if self.has["alpha_volume"]:
            r = self._scatter_vol(r, self._vol_call(
                lop.alpha_volume, vctx, self._uarg(u_leaf)))
        if self.has["lambda_volume"]:
            r = self._scatter_vol(r, self._vol_call(lop.lambda_volume,
                                                    vctx))
        def face_scatter(r, transfers, r_loc, sel_w=None):
            for tr, rl in zip(transfers, self._pack(r_loc)):
                if sel_w is not None:          # selective assembly mask
                    rl = rl * jnp.asarray(sel_w, rl.dtype).reshape(
                        (-1,) + (1,) * (rl.ndim - 1))
                r = tr.scatter_add(r, rl)
            return r

        for g in self.bnd_groups:
            fctx = self._face_ctx(g, time, dtype)
            uf = [tr.gather(x) for tr in g.tr_in]
            sw = getattr(g, "sel_w", None)
            if self.has["alpha_boundary"]:
                r = face_scatter(r, g.tr_in,
                                 lop.alpha_boundary(fctx, self._uarg(uf)), sw)
            if self.has["lambda_boundary"]:
                r = face_scatter(r, g.tr_in, lop.lambda_boundary(fctx), sw)
        for g in self.skel_groups:
            sctx = self._skel_ctx(g, time, dtype)
            ui = [tr.gather(x) for tr in g.tr_in]
            uo = [tr.gather(x) for tr in g.tr_out]
            r_in, r_out = lop.alpha_skeleton(sctx, self._uarg(ui), self._uarg(uo))
            sw = getattr(g, "sel_w", None)
            r = face_scatter(r, g.tr_in, r_in, sw)
            r = face_scatter(r, g.tr_out, r_out, sw)
        return r

    def weighted_element_residuals(self, x, w, time=0.0):
        """Per-element signed weighted residuals eta_K = r_K(x) . w_K.

        The localization step of dual-weighted-residual (DWR) goal-oriented
        error estimation: each element's volume/boundary/skeleton kernel
        contribution is dotted with the weight w gathered on the same DOFs
        instead of being scattered into the global residual, so
        sum_K eta_K == w^T r(x) exactly. w is zeroed on constrained rows;
        hanging-node constraints prolong both arguments (reference
        adaptivity driver: dune/pdelab/adaptivity/adaptivity.hh, which has
        only energy-norm estimators — the goal-oriented form has no
        reference analog). Returns an (nelements,) array.
        """
        dtype = x.dtype
        if self.cg is not None:
            w = jnp.where(self.cg.mask, 0.0, w)
            if self.cg.has_affine:
                x = self.cg.prolong(x)
                w = self.cg.prolong(w)
        lop = self.lop.set_time(time)
        eta = jnp.zeros(self.mesh.nelements, dtype)

        def dots(r_loc, w_list):
            tot = None
            for rl, wl in zip(self._pack(r_loc), w_list):
                d = jnp.sum(rl.astype(dtype) * wl, axis=tuple(
                    range(1, rl.ndim)))
                tot = d if tot is None else tot + d
            return tot

        u_leaf = [dm.gather(x) for dm in self.dof_maps]
        w_leaf = [dm.gather(w) for dm in self.dof_maps]
        vctx = self._volume_ctx(time, dtype)

        def sel(d, sw):                       # selective assembly mask
            return d if sw is None else d * jnp.asarray(sw, d.dtype)

        if self.has["alpha_volume"]:
            eta = eta + sel(dots(lop.alpha_volume(vctx, self._uarg(u_leaf)),
                                 w_leaf), self._sel_elem)
        if self.has["lambda_volume"]:
            eta = eta + sel(dots(lop.lambda_volume(vctx), w_leaf),
                            self._sel_elem)
        for g in self.bnd_groups:
            fctx = self._face_ctx(g, time, dtype)
            uf = [tr.gather(x) for tr in g.tr_in]
            wf = [tr.gather(w) for tr in g.tr_in]
            el = jnp.asarray(np.asarray(g.elements), jnp.int32)
            sw = getattr(g, "sel_w", None)
            if self.has["alpha_boundary"]:
                eta = eta.at[el].add(sel(
                    dots(lop.alpha_boundary(fctx, self._uarg(uf)), wf), sw))
            if self.has["lambda_boundary"]:
                eta = eta.at[el].add(sel(dots(lop.lambda_boundary(fctx), wf),
                                         sw))
        for g in self.skel_groups:
            sctx = self._skel_ctx(g, time, dtype)
            ui = [tr.gather(x) for tr in g.tr_in]
            uo = [tr.gather(x) for tr in g.tr_out]
            wi = [tr.gather(w) for tr in g.tr_in]
            wo = [tr.gather(w) for tr in g.tr_out]
            r_in, r_out = lop.alpha_skeleton(sctx, self._uarg(ui),
                                             self._uarg(uo))
            sw = getattr(g, "sel_w", None)
            eta = eta.at[jnp.asarray(np.asarray(g.elements),
                                     jnp.int32)].add(sel(dots(r_in, wi), sw))
            eta = eta.at[jnp.asarray(np.asarray(g.outside),
                                     jnp.int32)].add(sel(dots(r_out, wo), sw))
        return eta

    def _residual_with_mask(self, x, time):
        # hanging nodes: r = P^T R(P x) (the etadd triple product as vector
        # ops, reference: gridoperator/common/assemblerutilities.hh:501-586)
        if self.cg is not None and self.cg.has_affine:
            x = self.cg.prolong(x)
        r = self.residual_unconstrained(x, time)
        if self.cg is not None:
            if self.cg.has_affine:
                r = self.cg.restrict_transpose(r)
            r = jnp.where(self.cg.mask, 0.0, r)
        return r

    def residual(self, x, time=0.0):
        """r(x) with constrained rows zeroed (so the correction problem
        J z = r has z = 0 on Dirichlet DOFs; reference convention:
        gridoperator residual + set_trivial_rows). Jitted and cached."""
        self._warm_for(x)
        return self._residual_jit(x, time)

    # ------------------------------------------------------------------
    # matrix-free Jacobian application (jacobianapplyengine analog)
    # ------------------------------------------------------------------
    def _japply_impl(self, x, z, time):
        if self.cg is not None:
            zf = jnp.where(self.cg.mask, 0.0, z)
            if self.cg.has_affine:
                x = self.cg.prolong(x)
                zf = self.cg.prolong(zf)
        else:
            zf = z
        _, jz = jax.jvp(lambda y: self.residual_unconstrained(y, time), (x,), (zf,))
        if self.cg is not None:
            if self.cg.has_affine:
                jz = self.cg.restrict_transpose(jz)
            jz = jnp.where(self.cg.mask, z, jz)
        return jz

    def jacobian_apply(self, x, z, time=0.0):
        """y = J(x) z with symmetric constraint handling:
        y = mask*z + P J P z, P = projection onto unconstrained DOFs.
        Jitted and cached; also safe to call inside an outer jit."""
        self._warm_for(x)
        return self._japply_jit(x, z, time)

    def linear_operator(self, time=0.0, dtype=None):
        """For linear LOPs: z -> J z closure (linearization point irrelevant)."""
        x0 = jnp.zeros(self.space.ndofs, dtype or default_float())
        return lambda z: self.jacobian_apply(x0, z, time)

    # ------------------------------------------------------------------
    # assembled Jacobian via jvp probing (jacobianengine analog)
    # ------------------------------------------------------------------
    def _probe(self, f, u_leaf, nloc_list, time):
        """Dense per-item Jacobian of a batched kernel via basis-vector jvp.

        f: per-leaf tuple -> per-leaf tuple residual. Returns
        (B, nlocal, nlocal) with the concatenated local ordering.
        """
        ntot = sum(nloc_list)
        offs = np.concatenate([[0], np.cumsum(nloc_list)])
        uarg = self._uarg(u_leaf)
        # one vmapped jvp over all ntot probe directions (a single traced
        # kernel instead of ntot unrolled jvps — round-1 compile-time
        # hotspot); tangents are (ntot, nloc_leaf) one-hot blocks broadcast
        # over the batch axis
        sels = []
        for li, nl in enumerate(nloc_list):
            s = np.zeros((ntot, nl))
            s[offs[li]:offs[li + 1]] = np.eye(nl)
            # tangent dtype must match the (possibly complex) primal
            sels.append(jnp.asarray(s, u_leaf[li].dtype))

        def one(sel_leaves):
            tangent = [jnp.broadcast_to(s[None, :], u.shape).astype(u.dtype)
                       for s, u in zip(sel_leaves, u_leaf)]
            _, col = jax.jvp(lambda u: self._pack(f(u)),
                             (uarg,), (self._uarg(tangent),))
            return jnp.concatenate(col, axis=1)        # (B, ntot)

        cols = jax.vmap(one)(tuple(sels))              # (ntot, B, ntot)
        return jnp.moveaxis(cols, 0, -1)               # (B, ntot, ntot)

    def _element_jacobians_impl(self, x, time):
        dtype = x.dtype
        lop = self.lop.set_time(time)
        u_leaf = [x[m] for m in self.leaf_dofs]
        vctx = self._volume_ctx(time, dtype)
        if not self.has["alpha_volume"]:
            E = self.mesh.nelements
            return jnp.zeros((E, self.nlocal, self.nlocal), dtype)
        J = self._probe(lambda u: lop.alpha_volume(vctx, u),
                        u_leaf, self.local_sizes, time)
        if self._sel_elem is not None:     # selective assembly mask
            J = J * jnp.asarray(self._sel_elem, dtype)[:, None, None]
        return J

    def element_jacobians(self, x, time=0.0):
        """Per-element dense volume Jacobian blocks (E, nlocal, nlocal).

        The blockdiagonal extraction analog (reference:
        localoperator/blockdiagonal.hh:190) used by block preconditioners.
        """
        return self._ejac_jit(x, time)

    def element_diagonal_blocks(self, x, time=0.0):
        """Per-element diagonal Jacobian blocks including boundary and
        skeleton self-coupling (E, nlocal, nlocal) — the full BlockDiagonal
        extraction (reference: localoperator/blockdiagonal.hh:190 wraps ALL
        alpha_* of the wrapped operator, not just alpha_volume). This is the
        right block for DG block-Jacobi preconditioning where penalty terms
        dominate the diagonal."""
        return self._ediag_jit(x, time)

    def _element_diagonal_blocks_impl(self, x, time):
        dtype = x.dtype
        lop = self.lop.set_time(time)
        E = self.mesh.nelements
        J = jnp.zeros((E, self.nlocal, self.nlocal), dtype)
        if self.has["alpha_volume"]:
            J = J + self._element_jacobians_impl(x, time)
        for g in self.bnd_groups:
            if not self.has["alpha_boundary"]:
                continue
            fctx = self._face_ctx(g, time, dtype)
            uf = [x[jnp.asarray(m, jnp.int32)] for m in g.leaf_dofs_in]
            Jb = self._probe(lambda u: lop.alpha_boundary(fctx, u),
                             uf, self.local_sizes, time)
            sw = getattr(g, "sel_w", None)
            if sw is not None:             # selective assembly mask
                Jb = Jb * jnp.asarray(sw, dtype)[:, None, None]
            J = J.at[jnp.asarray(g.elements, jnp.int32)].add(Jb)
        for g in self.skel_groups:
            sctx = self._skel_ctx(g, time, dtype)
            ui = [x[jnp.asarray(m, jnp.int32)] for m in g.leaf_dofs_in]
            uo = [x[jnp.asarray(m, jnp.int32)] for m in g.leaf_dofs_out]

            def r_in_of_uin(u):
                r_in, _ = lop.alpha_skeleton(sctx, u, self._uarg(uo))
                return r_in

            def r_out_of_uout(u):
                _, r_out = lop.alpha_skeleton(sctx, self._uarg(ui), u)
                return r_out

            Jii = self._probe(r_in_of_uin, ui, self.local_sizes, time)
            Joo = self._probe(r_out_of_uout, uo, self.local_sizes, time)
            sw = getattr(g, "sel_w", None)
            if sw is not None:             # selective assembly mask
                swj = jnp.asarray(sw, dtype)[:, None, None]
                Jii = Jii * swj
                Joo = Joo * swj
            J = J.at[jnp.asarray(g.elements, jnp.int32)].add(Jii)
            J = J.at[jnp.asarray(g.outside, jnp.int32)].add(Joo)
        return J

    def _all_jacobian_blocks(self, x, time):
        """Yield (rows (B,n), cols (B,n2), blocks (B,n,n2)) for every
        integration domain contributing to the Jacobian."""
        dtype = x.dtype
        lop = self.lop.set_time(time)
        out = []
        if self.has["alpha_volume"]:
            J = self.element_jacobians(x, time)
            out.append((self.elem_gdofs_cat, self.elem_gdofs_cat, J))
        for g in self.bnd_groups:
            if not self.has["alpha_boundary"]:
                continue
            fctx = self._face_ctx(g, time, dtype)
            uf = [x[jnp.asarray(m, jnp.int32)] for m in g.leaf_dofs_in]
            J = self._probe(lambda u: lop.alpha_boundary(fctx, u),
                            uf, self.local_sizes, time)
            sw = getattr(g, "sel_w", None)
            if sw is not None:             # selective assembly mask
                J = J * jnp.asarray(sw, dtype)[:, None, None]
            gd = _cat_leaf_dofs(g.leaf_dofs_in)
            out.append((gd, gd, J))
        for g in self.skel_groups:
            sctx = self._skel_ctx(g, time, dtype)
            ui = [x[jnp.asarray(m, jnp.int32)] for m in g.leaf_dofs_in]
            uo = [x[jnp.asarray(m, jnp.int32)] for m in g.leaf_dofs_out]
            nin = self.nlocal

            def two_sided(uu):
                # uu: concatenated per-leaf tuples: first leaves = inside,
                # second = outside
                u_in = uu[: self.nleaves]
                u_out = uu[self.nleaves:]
                r_in, r_out = lop.alpha_skeleton(
                    sctx,
                    u_in[0] if self.nleaves == 1 else tuple(u_in),
                    u_out[0] if self.nleaves == 1 else tuple(u_out),
                )
                return self._pack(r_in) + self._pack(r_out)

            both = ui + uo
            sizes = list(self.local_sizes) * 2
            offs = np.concatenate([[0], np.cumsum(sizes)])
            # single vmapped jvp over all 2n probe directions (see _probe)
            sels = []
            for li, nl in enumerate(sizes):
                s = np.zeros((2 * nin, nl))
                s[offs[li]:offs[li + 1]] = np.eye(nl)
                sels.append(jnp.asarray(s, both[li].dtype))

            def one(sel_leaves):
                tangent = [jnp.broadcast_to(s[None, :], u.shape).astype(u.dtype)
                           for s, u in zip(sel_leaves, both)]
                _, col = jax.jvp(lambda u: two_sided(tuple(u)),
                                 (tuple(both),), (tuple(tangent),))
                return jnp.concatenate(col, axis=1)         # (F, 2n)

            Jfull = jnp.moveaxis(jax.vmap(one)(tuple(sels)), 0, -1)
            sw = getattr(g, "sel_w", None)
            if sw is not None:             # selective assembly mask
                Jfull = Jfull * jnp.asarray(sw, dtype)[:, None, None]
            gin = _cat_leaf_dofs(g.leaf_dofs_in)
            gout = _cat_leaf_dofs(g.leaf_dofs_out)
            gboth = np.concatenate([gin, gout], axis=1)     # (F, 2n)
            out.append((gboth, gboth, Jfull))
        return out

    def jacobian(self, x, time=0.0):
        """Assembled sparse Jacobian as jax.experimental.sparse.BCOO with
        symmetric constraint elimination + unit rows on constrained DOFs."""
        from jax.experimental import sparse as jsparse

        n = self.space.ndofs
        datas, rows, cols = [], [], []
        if self.cg is not None and self.cg.has_affine:
            x = self.cg.prolong(x)
        for gr, gc, J in self._all_jacobian_blocks(x, time):
            B, ni, nj = J.shape
            r = np.broadcast_to(gr[:, :, None], (B, ni, nj)).reshape(-1)
            c = np.broadcast_to(gc[:, None, :], (B, ni, nj)).reshape(-1)
            rows.append(r)
            cols.append(c)
            datas.append(J.reshape(-1))
        rows = np.concatenate(rows)
        cols = np.concatenate(cols)
        data = jnp.concatenate(datas)
        if self.cg is not None and self.cg.has_affine:
            # fold the hanging-node triple product P^T J P: expand every
            # COO entry through the static per-dof parent CSR (etadd,
            # reference: assemblerutilities.hh:501-586). Static index work
            # in numpy; values stay traced.
            rows, cols, data = _affine_expand(self.cg, rows, cols, data)
        if self.cg is not None:
            free = ~self.cg.mask_np
            wgt = jnp.asarray(free[rows] & free[cols], data.dtype)
            data = data * wgt
            cidx = np.nonzero(self.cg.mask_np)[0]
            rows = np.concatenate([rows, cidx])
            cols = np.concatenate([cols, cidx])
            data = jnp.concatenate([data, jnp.ones(len(cidx), data.dtype)])
        idx = jnp.stack(
            [jnp.asarray(rows, jnp.int32), jnp.asarray(cols, jnp.int32)], axis=1
        )
        A = jsparse.BCOO((data, idx), shape=(n, n))
        return A.sum_duplicates(nse=None)

    def _jacobian_diagonal_impl(self, x, time):
        n = self.space.ndofs
        if self.cg is not None and self.cg.has_affine:
            x = self.cg.prolong(x)
        d = jnp.zeros(n, x.dtype)
        for gr, gc, J in self._all_jacobian_blocks(x, time):
            diag = jnp.diagonal(J, axis1=1, axis2=2)    # (B, n)
            d = d.at[jnp.asarray(gr, jnp.int32)].add(diag)
        if self.cg is not None:
            if self.cg.has_affine:
                # approximate P^T J P diagonal: fold hanging-row diagonals
                # into parents with w^2 (cross terms dropped — Jacobi
                # preconditioning quality only, not exactness)
                d = d.at[self.cg._acols].add(
                    (self.cg._aw.astype(d.dtype) ** 2) * d[self.cg._arows])
            d = jnp.where(self.cg.mask, 1.0, d)
        return d

    def jacobian_diagonal(self, x, time=0.0):
        """diag(J) including all integration domains; constrained rows -> 1."""
        self._warm_for(x)
        return self._jdiag_jit(x, time)
