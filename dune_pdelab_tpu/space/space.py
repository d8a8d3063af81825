"""Discrete function spaces: DOF maps as static index arrays.

TPU-native analog of PDELab's GridFunctionSpace + ordering layer (reference:
dune/pdelab/gridfunctionspace/gridfunctionspace.hh:179,
dune/pdelab/ordering/gridviewordering.hh:688-730). PDELab builds a
DOFIndex -> ContainerIndex map via per-geometry-type offset tables computed in
one grid pass; here the whole ordering phase is setup-time numpy producing a
single `element_dofs (E, nlocal) -> global index` gather/scatter map — the
analog of LFSIndexCache after bind (reference:
dune/pdelab/gridfunctionspace/lfsindexcache.hh:244).

Composite spaces (reference: powergridfunctionspace.hh /
compositegridfunctionspace.hh — TypeTree trees, e.g. Taylor-Hood =
Composite(Power<dim>(Q2), Q1)) are pytrees of leaf spaces with a blocking
strategy ('lexicographic' or 'interleaved', the analog of PDELab's ordering
tags, reference: dune/pdelab/ordering/lexicographicordering.hh:105,
interleavedordering.hh:28).

A DOF vector is one flat jnp array; composite spaces carry per-child index
transforms into it.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from dune_pdelab_tpu.fe.basis import FiniteElement
from dune_pdelab_tpu.mesh.structured import StructuredMesh
from dune_pdelab_tpu.utils.common import default_float


class FunctionSpace:
    """Leaf discrete space: mesh x finite element -> DOF map.

    Attributes:
      mesh, fem
      ndofs:         global number of DOFs
      element_dofs:  (E, nlocal) int32 numpy — local->global DOF map
    """

    is_leaf = True

    def __init__(self, mesh: StructuredMesh, fem: FiniteElement, name: str = ""):
        if fem.geometry != mesh.geometry_type:
            raise ValueError(f"{fem} does not fit mesh geometry {mesh.geometry_type}")
        self.mesh = mesh
        self.fem = fem
        self.name = name
        from dune_pdelab_tpu.mesh.adaptive import AdaptiveMesh
        self._element_dofs = None   # lazy for structured C0 (huge grids)
        if isinstance(mesh, AdaptiveMesh):
            if fem.continuity != "C0" or fem.degree != 1:
                raise NotImplementedError(
                    "adaptive meshes support Q1 spaces (the reference's "
                    "hanging-node constraint assemblers are likewise "
                    "Q1/P1-only, dune/pdelab/constraints/hangingnode.hh:24)")
            self._element_dofs = mesh.element_vertex_indices().astype(np.int32)
            self._dof_grid_dims = None
            self.ndofs = mesh.nvertices
        elif fem.continuity == "C0" and mesh.geometry_type == "simplex":
            self._element_dofs = self._build_simplex_c0_map().astype(np.int32)
            self._dof_grid_dims = None
            self.ndofs = int(self._element_dofs.max()) + 1
        elif fem.continuity == "C0":
            # the DOF map is pure lattice arithmetic; defer materializing
            # the (E, nloc) array — the structured fast paths (SlicedDofMap,
            # compiled stencils) never touch it, and at 100M+ DOFs it costs
            # tens of GB of host memory
            self._dof_grid_dims = self._c0_dims()
            self.ndofs = int(np.prod(self._dof_grid_dims))
        elif fem.continuity in ("Hdiv", "Mimetic"):
            # Mimetic face elements share the H(div) face-lattice numbering
            # (scalar face DOFs, no orientation signs on cubes)
            self._element_dofs = self._build_hdiv_map().astype(np.int32)
            self._dof_grid_dims = None
            self.ndofs = int(self._element_dofs.max()) + 1
        elif fem.continuity == "Hcurl":
            self._element_dofs = self._build_hcurl_map().astype(np.int32)
            self._dof_grid_dims = None
            self.ndofs = int(self._element_dofs.max()) + 1
        else:
            nb = fem.nbasis
            self._element_dofs = (
                np.arange(mesh.nelements, dtype=np.int64)[:, None] * nb
                + np.arange(nb, dtype=np.int64)[None, :]
            ).astype(np.int32)
            self._dof_grid_dims = None
            self.ndofs = mesh.nelements * nb

    @property
    def element_dofs(self) -> np.ndarray:
        """(E, nlocal) int32 local->global DOF map (built on first use)."""
        if self._element_dofs is None:
            self._element_dofs = self._build_c0_map()[0].astype(np.int32)
        return self._element_dofs

    def _c0_dims(self):
        """Per-axis DOF-grid sizes of the tensor C0 layout (periodic wrap)."""
        mesh, fem = self.mesh, self.fem
        if not hasattr(fem, "_mi"):
            raise NotImplementedError(
                f"C0 DOF layout requires a tensor nodal element, got {fem}")
        k = fem.degree
        return tuple(
            k * c if p else k * c + 1
            for c, p in zip(mesh.cells, mesh.periodic))

    # -- ordering construction (the GridViewOrdering::update analog) ---------
    def _build_c0_map(self):
        mesh, fem = self.mesh, self.fem
        k = fem.degree
        if not hasattr(fem, "_mi"):
            raise NotImplementedError(
                f"C0 DOF layout requires a tensor nodal element, got {fem}"
            )
        # per-axis DOF-grid sizes; periodic axes wrap
        dims = tuple(
            k * c if p else k * c + 1 for c, p in zip(mesh.cells, mesh.periodic)
        )
        strides = np.ones(mesh.dim, dtype=np.int64)
        for d in range(1, mesh.dim):
            strides[d] = strides[d - 1] * dims[d - 1]
        emi = mesh.element_multi_index()           # (E, dim)
        lmi = fem._mi                              # (nloc, dim) local node multi-index
        g = k * emi[:, None, :] + lmi[None, :, :]  # (E, nloc, dim)
        g = np.mod(g, np.array(dims))
        return g @ strides, dims

    def _build_simplex_c0_map(self):
        """Conforming Pk DOF map on simplex meshes, any k (reference:
        dune/pdelab/finiteelementmap/pkfem.hh serving arbitrary-order
        PkLocalFiniteElement).

        Each PkFEM lattice node is classified by its integer barycentric
        coordinates n_i = k*lambda_i (sum n_i = k):
          * one n_i = k          -> vertex DOF (mesh vertex id);
          * two nonzero          -> edge DOF; the k-1 interior nodes of each
            unique edge are ordered along the GLOBAL edge direction
            (ascending global vertex id), so both adjacent elements agree;
          * three nonzero in 3D  -> face DOF; interior face nodes are
            indexed by their barycentric weights w.r.t. the face's SORTED
            global vertex triple — an orientation-independent enumeration
            shared by the two adjacent tets;
          * all nonzero          -> cell-interior DOF (element-private).

        Global numbering: [vertices | edge interiors | face interiors (3D) |
        cell interiors]."""
        mesh, fem = self.mesh, self.fem
        k = fem.degree
        if k < 1:
            raise NotImplementedError(
                "conforming simplex spaces need k >= 1 (use continuity='DG' "
                "for P0)")
        dim = mesh.dim
        cells = mesh.cells
        E = mesh.nelements
        nv = mesh.nvertices
        # integer barycentrics of the Pk lattice nodes; geometry corner
        # convention (fe/basis.py PkFEM(1, dim).nodes): lambda_0 = 1 - sum x,
        # lambda_j = x[dim - j] for j = 1..dim
        bary = np.zeros((fem.nbasis, dim + 1))
        bary[:, 0] = 1.0 - fem.nodes.sum(axis=1)
        for j in range(1, dim + 1):
            bary[:, j] = fem.nodes[:, dim - j]
        n_int = np.rint(k * bary).astype(np.int64)        # (nb, dim+1)
        assert np.all(n_int.sum(axis=1) == k)

        uniq_edges, cell_edges = mesh.edges()
        pairs = mesh._edge_pairs
        ne_per = max(k - 1, 0)
        edge_base = nv
        face_base = edge_base + len(uniq_edges) * ne_per
        nfi = (k - 1) * (k - 2) // 2 if dim == 3 else 0
        if dim == 3 and nfi:
            uniq_faces, face_of, _ = mesh.faces()
            # face id of the face spanned by local vertices {a,b,c} = the
            # face OPPOSITE the remaining local vertex
            # rank table for interior-face enumeration by (m0, m1), the
            # barycentric weights w.r.t. the two smallest global vertex ids
            franks = np.full((k, k), -1, np.int64)
            c = 0
            for m0 in range(1, k):
                for m1 in range(1, k - m0):
                    franks[m0, m1] = c
                    c += 1
            cell_base = face_base + len(uniq_faces) * nfi
        else:
            cell_base = face_base
        n_cell = int(np.sum(np.all(n_int >= 1, axis=1)))  # interior per cell

        cols = []
        n_interior_seen = 0
        for b in range(fem.nbasis):
            n = n_int[b]
            nz = np.nonzero(n)[0]
            if len(nz) == 1:                              # vertex
                cols.append(cells[:, nz[0]])
            elif len(nz) == 2:                            # edge interior
                a, bb = int(nz[0]), int(nz[1])            # a < bb
                eloc = pairs.index((a, bb))
                j = int(n[bb])                            # param from a
                ga, gb = cells[:, a], cells[:, bb]
                jg = np.where(ga < gb, j - 1, k - 1 - j)
                cols.append(edge_base + cell_edges[:, eloc] * ne_per + jg)
            elif dim == 3 and len(nz) == 3:               # face interior
                opp = int(np.setdiff1d(np.arange(4), nz)[0])
                fid = face_of[:, opp]                     # (E,)
                gloc = cells[:, nz]                       # (E, 3) global ids
                order = np.argsort(gloc, axis=1)          # sorted positions
                w = n[nz][order]                          # (E, 3) weights in
                idx = franks[w[:, 0], w[:, 1]]            # sorted-global order
                cols.append(face_base + fid * nfi + idx)
            else:                                         # cell interior
                cols.append(cell_base
                            + np.arange(E, dtype=np.int64) * n_cell
                            + n_interior_seen)
                n_interior_seen += 1
        return np.stack(cols, axis=1)

    def boundary_dof_mask(self) -> np.ndarray:
        """(ndofs,) bool mask of DOFs on the domain boundary."""
        from dune_pdelab_tpu.mesh.adaptive import AdaptiveMesh
        if isinstance(self.mesh, AdaptiveMesh):
            return self.mesh.boundary_vertex_mask()
        if self.mesh.geometry_type == "simplex":
            mesh, k = self.mesh, self.fem.degree
            mask = np.zeros(self.ndofs, dtype=bool)
            nv = mesh.nvertices
            vmask = mesh.boundary_vertex_mask()
            mask[:nv] = vmask[:min(nv, self.ndofs)]
            base = nv
            if k >= 2 and self.ndofs > nv:
                em = mesh.boundary_edge_mask()
                mask[base:base + len(em) * (k - 1)] = np.repeat(em, k - 1)
                base += len(em) * (k - 1)
            if mesh.dim == 3 and k >= 3:
                nfi = (k - 1) * (k - 2) // 2
                fm = mesh.boundary_face_mask()
                mask[base:base + len(fm) * nfi] = np.repeat(fm, nfi)
            return mask
        if self.fem.continuity in ("Hdiv", "Mimetic"):
            # face-lattice DOFs: boundary = extreme index along the face axis
            mesh = self.mesh
            m = getattr(self.fem, "ndofs_per_face", 1)
            mask = np.zeros(self.ndofs, dtype=bool)
            off = 0
            for a in range(mesh.dim):
                fd = tuple(
                    (c if mesh.periodic[d] and d == a else
                     (c + 1 if d == a else c))
                    for d, c in enumerate(mesh.cells))
                n_a = int(np.prod(fd))
                if not mesh.periodic[a]:
                    fmi = np.stack(np.unravel_index(
                        np.arange(n_a), fd, order="F"), axis=1)
                    bnd = (fmi[:, a] == 0) | (fmi[:, a] == mesh.cells[a])
                    for k in range(m):
                        mask[off + np.nonzero(bnd)[0] * m + k] = True
                off += n_a * m
            return mask
        return _leaf_boundary_dof_mask(self)

    def _build_hdiv_map(self):
        """Face-based DOF map for H(div) elements:

        * cubes (RT/BDM): global faces per axis with lexicographic
          numbering; element local dofs ordered (axis, side[, moment]);
        * simplices (RT0/BDM1): dofs on the unique-face list of
          SimplexMesh.faces(); global orientation = the outward normal of
          each face's first-occurrence owner cell, encoded as per-element
          diagonal signs in self._hdiv_signs (sigma for even moments,
          sigma*tau for tangent-odd moments; sign(det J) folded in —
          the RT0Constraints orientation analog, reference:
          dune/pdelab/constraints/raviartthomas0.hh)."""
        mesh, fem = self.mesh, self.fem
        dim = mesh.dim
        if mesh.geometry_type == "simplex":
            return self._build_hdiv_map_simplex()
        m = getattr(fem, "ndofs_per_face", 1)
        emi = mesh.element_multi_index()                  # (E, dim)
        offsets = []
        off = 0
        face_dims = []
        for a in range(dim):
            fd = tuple(
                (c if mesh.periodic[d] and d == a else
                 (c + 1 if d == a else c))
                for d, c in enumerate(mesh.cells)
            )
            face_dims.append(fd)
            offsets.append(off)
            off += int(np.prod(fd)) * m
        cols = []
        for a in range(dim):
            fd = face_dims[a]
            strides = np.ones(dim, dtype=np.int64)
            for d in range(1, dim):
                strides[d] = strides[d - 1] * fd[d - 1]
            for s in (0, 1):
                g = emi.copy()
                g[:, a] += s
                g[:, a] %= fd[a]  # periodic wrap (fd[a]==cells[a] then)
                fidx = g @ strides
                for k in range(m):
                    cols.append(offsets[a] + fidx * m + k)
        # interior dofs (RT1+): element-local block after all face dofs
        ni = getattr(fem, "ndofs_interior", 0)
        if ni:
            eidx = np.arange(mesh.nelements, dtype=np.int64)
            for k in range(ni):
                cols.append(off + eidx * ni + k)
        return np.stack(cols, axis=1)

    def _build_hdiv_map_simplex(self):
        mesh, fem = self.mesh, self.fem
        m = getattr(fem, "ndofs_per_face", 1)
        uniq, face_of, counts = mesh.faces()
        E = mesh.nelements
        d1 = mesh.dim + 1
        # first-occurrence owner of each unique face (same rule as
        # SimplexMesh.interior_faces "inside")
        flat = face_of.ravel()
        order = np.argsort(flat, kind="stable")
        starts = np.searchsorted(flat[order], np.arange(len(uniq)))
        owner_cell = order[starts] // d1
        owner_loc = order[starts] % d1
        # signs: sigma = +1 iff (e, l) is the owner pair; tau from the
        # global ids of the edge endpoints (ascending-local-index order);
        # fold in sign(det J) of the affine map (Piola flux parity)
        locs = np.array([[v for v in range(d1) if v != l] for l in range(d1)])
        cc = mesh.element_corner_coords()
        # affine Jacobian columns in P1 node order (dim-th node moves xi_0)
        Jcols = [cc[:, d1 - 1 - i] - cc[:, 0] for i in range(mesh.dim)]
        J = np.stack(Jcols, axis=-1)
        sdet = np.sign(np.linalg.det(J))
        if m > 1 and mesh.dim != 2:
            raise NotImplementedError(
                "tangent-odd face moments (BDM) on simplices: 2D only")
        cols = []
        signs = []
        eidx = np.arange(E)
        for l in range(d1):
            fid = face_of[:, l]
            sigma = np.where((owner_cell[fid] == eidx)
                             & (owner_loc[fid] == l), 1.0, -1.0) * sdet
            if m > 1:
                la, lb = locs[l]
                tau = np.where(mesh.cells[:, la] < mesh.cells[:, lb],
                               1.0, -1.0)
            for k in range(m):
                cols.append(fid * m + k)
                signs.append(sigma if k % 2 == 0 else sigma * tau)
        # interior dofs (RT1+): element-private block after all face dofs,
        # no orientation sign (reference-moment definition per element)
        ni = getattr(fem, "ndofs_interior", 0)
        if ni:
            nfacedofs = len(uniq) * m
            for k in range(ni):
                cols.append(nfacedofs + eidx * ni + k)
                signs.append(np.ones(E))
        self._hdiv_signs = np.stack(signs, axis=1)   # (E, nbasis)
        return np.stack(cols, axis=1)

    def _build_hcurl_map_simplex(self):
        """Edge-based DOF map for Whitney elements on simplex meshes: the
        unique-edge list IS the dof set; per-element diagonal signs encode
        the global edge direction (ascending global vertex id — the EdgeS0.5
        orientation convention)."""
        mesh = self.mesh
        uniq, cell_edges = mesh.edges()
        pairs = mesh._edge_pairs
        signs = np.ones(cell_edges.shape)
        for l, (a, b) in enumerate(pairs):
            signs[:, l] = np.where(mesh.cells[:, a] < mesh.cells[:, b],
                                   1.0, -1.0)
        self._hcurl_signs = signs
        return np.asarray(cell_edges, np.int64)

    def _build_hcurl_map(self):
        """Edge-based DOF map for Nedelec elements: per edge direction a, a
        lexicographic edge lattice (cells[a] x (cells[d]+1 transverse));
        element-local ordering matches N0Cube.edges."""
        mesh, fem = self.mesh, self.fem
        if mesh.geometry_type == "simplex":
            return self._build_hcurl_map_simplex()
        dim = mesh.dim
        emi = mesh.element_multi_index()
        offsets, edge_dims = [], []
        off = 0
        for a in range(dim):
            ed = tuple(
                (c if d == a or mesh.periodic[d] else c + 1)
                for d, c in enumerate(mesh.cells)
            )
            edge_dims.append(ed)
            offsets.append(off)
            off += int(np.prod(ed))
        cols = []
        for (a, tdims, bits) in fem.edges:
            ed = edge_dims[a]
            strides = np.ones(dim, dtype=np.int64)
            for d in range(1, dim):
                strides[d] = strides[d - 1] * ed[d - 1]
            g = emi.copy()
            for td, bit in zip(tdims, bits):
                g[:, td] = (g[:, td] + bit) % ed[td]
            cols.append(offsets[a] + g @ strides)
        self._hcurl_edge_dims = edge_dims
        self._hcurl_offsets = offsets
        return np.stack(cols, axis=1)

    def boundary_edge_mask(self) -> np.ndarray:
        """(ndofs,) bool: edges lying in a non-periodic domain boundary face
        (for essential n x u = 0 constraints on H(curl) spaces)."""
        assert self.fem.continuity == "Hcurl"
        mesh = self.mesh
        if mesh.geometry_type == "simplex":
            # edge DOFs == unique edges; boundary = topological
            return mesh.boundary_edge_mask()
        dim = mesh.dim
        mask = np.zeros(self.ndofs, dtype=bool)
        for a in range(dim):
            ed = self._hcurl_edge_dims[a]
            n_a = int(np.prod(ed))
            g = np.arange(n_a, dtype=np.int64)
            mi = np.empty((n_a, dim), dtype=np.int64)
            for d in range(dim):
                mi[:, d] = g % ed[d]
                g = g // ed[d]
            onb = np.zeros(n_a, dtype=bool)
            for d in range(dim):
                if d == a or mesh.periodic[d]:
                    continue
                onb |= (mi[:, d] == 0) | (mi[:, d] == ed[d] - 1)
            mask[self._hcurl_offsets[a]:self._hcurl_offsets[a] + n_a] = onb
        return mask

    # -- pytree-ish protocol used by the assembler ---------------------------
    @property
    def leaves(self):
        return (self,)

    @property
    def leaf_offsets(self):
        return (0,)

    def local_sizes(self):
        return (self.fem.nbasis,)

    def global_element_dofs(self):
        """(E, nlocal) global DOF indices, offsets applied (leaf: identity)."""
        return self.element_dofs

    # -- node coordinates & interpolation ------------------------------------
    def dof_coords(self) -> np.ndarray:
        """(ndofs, dim) nodal coordinates (nodal elements only).

        Computed by scattering per-element node positions; conforming spaces
        agree on shared entities so last-write-wins is consistent.
        """
        nodes = self.fem.interpolation_points          # (ni, dim) == nodes
        if self.fem.nodes is None:
            raise NotImplementedError("modal basis has no nodal coordinates")
        coords = np.empty((self.ndofs, self.mesh.dim))
        pts = self._geometry_at(nodes)                 # (E, ni, dim)
        coords[self.element_dofs.reshape(-1)] = pts.reshape(-1, self.mesh.dim)
        return coords

    def dof_coords_at(self, idx: np.ndarray) -> np.ndarray:
        """(len(idx), dim) nodal coordinates of selected DOFs.

        Structured C0 spaces use pure lattice arithmetic (no per-element
        geometry sweep) — essential at 100M+ DOFs where materializing all
        element node positions costs tens of GB.
        """
        if (self._dof_grid_dims is not None and self.mesh.uniform
                and self.fem.continuity == "C0"):
            from dune_pdelab_tpu.fe.basis import lagrange_nodes_1d
            k = self.fem.degree
            nodes1d = lagrange_nodes_1d(
                k, getattr(self.fem, "variant", "equidistant"))
            dims = self._dof_grid_dims
            g = np.asarray(idx, dtype=np.int64)
            out = np.empty((len(g), self.mesh.dim))
            for d in range(self.mesh.dim):
                gd = g % dims[d]
                g = g // dims[d]
                out[:, d] = self.mesh.lower[d] + self.mesh.h[d] * (
                    gd // k + nodes1d[gd % k])
            return out
        return self.dof_coords()[np.asarray(idx)]

    def _geometry_at(self, ref_points: np.ndarray) -> np.ndarray:
        """Map reference points into every element: (E, npts, dim)."""
        corners = self.mesh.element_corner_coords()    # (E, C, dim)
        from dune_pdelab_tpu.fe.basis import _cached_fem
        geo = _cached_fem(
            "QkFEM" if self.mesh.geometry_type == "cube" else "PkFEM",
            1, self.mesh.dim)
        vals, _ = geo.tabulate(ref_points)             # (npts, C)
        return np.einsum("pc,ecd->epd", vals, corners)

    def interpolate(self, f, dtype=None):
        """Interpolate a callable f(x) -> scalar into a DOF vector.

        Analog of `Dune::PDELab::interpolate(f, gfs, x)` (reference:
        dune/pdelab/gridfunctionspace/interpolate.hh:177): per-element local
        interpolation (node evaluation, or discrete L2 projection for modal
        bases) scattered into the global vector.
        """
        dtype = dtype or default_float()
        pts = self._geometry_at(np.atleast_2d(self.fem.interpolation_points))
        fvals = _eval_pointwise(f, pts)                # (E, ni)
        coeffs = np.einsum("bi,ei->eb", self.fem.interpolation_matrix, fvals)
        if np.iscomplexobj(coeffs):                    # complex-valued f
            dtype = np.result_type(coeffs.dtype, dtype)
        x = np.zeros(self.ndofs, dtype=coeffs.dtype)
        x[self.element_dofs.reshape(-1)] = coeffs.reshape(-1)
        return jnp.asarray(x, dtype=dtype)

    def zero(self, dtype=None):
        return jnp.zeros(self.ndofs, dtype=dtype or default_float())

    def __repr__(self):
        return f"FunctionSpace({self.fem!r}, ndofs={self.ndofs}, name={self.name!r})"


def _eval_pointwise(f, pts: np.ndarray) -> np.ndarray:
    """Evaluate a scalar callable at (E, n, dim) points -> (E, n)."""
    flat = pts.reshape(-1, pts.shape[-1])
    try:
        v = np.asarray(f(flat))
        if v.shape != (flat.shape[0],):
            raise ValueError
    except Exception:
        v = np.array([float(f(p)) for p in flat])
    return v.reshape(pts.shape[:-1])


class CompositeSpace:
    """Heterogeneous product space (CompositeGridFunctionSpace analog).

    DOF vector = one flat array; children are mapped in by `ordering`:
      'lexicographic' — children stacked child-major (reference:
         dune/pdelab/ordering/lexicographicordering.hh:105)
      'interleaved'   — equal-size children interleaved per leaf DOF
         (reference: dune/pdelab/ordering/interleavedordering.hh:28; the
         entity-blocked layout for identical leaves)
    """

    is_leaf = False

    def __init__(self, *children, ordering: str = "lexicographic",
                 name: str = "", chunk: int | None = None):
        assert children
        self.children = tuple(children)
        self.ordering = ordering
        self.name = name
        sizes = [c.ndofs for c in self.children]
        self.ndofs = sum(sizes)
        if ordering == "lexicographic":
            offs = np.concatenate([[0], np.cumsum(sizes)[:-1]])
            self._child_offset = offs.astype(np.int64)
        elif ordering in ("interleaved", "entity_blocked"):
            # entity_blocked (reference: ordering/entityblockedlocalordering
            # .hh:33,155): per-entity blocks of the children's dofs. In the
            # flat-array layout with identical children this coincides with
            # per-dof interleaving — each lattice entity slot carries one dof
            # of every child contiguously.
            if len(set(sizes)) != 1:
                raise ValueError(f"{ordering} ordering needs equal-size "
                                 "children")
            if ordering == "entity_blocked":
                meshes = {id(lf.mesh) for c in self.children
                          for lf in c.leaves}
                if len(meshes) != 1:
                    raise ValueError("entity_blocked needs one shared mesh")
            self._child_offset = None
        else:
            raise ValueError(f"unknown ordering {ordering!r}")
        # chunked block descriptor (reference: ordering/chunkedblockordering
        # .hh:112): declares a uniform block size over the flat index space,
        # consumed by blocked backends (block views, blocked preconditioners)
        self.chunk = chunk
        if chunk is not None:
            if self.ndofs % chunk:
                raise ValueError(
                    f"chunk size {chunk} does not divide ndofs {self.ndofs}")
            self.nchunks = self.ndofs // chunk

    def block_view(self, x):
        """(nchunks, chunk) view of a flat vector (chunked descriptor)."""
        if self.chunk is None:
            raise ValueError("space has no chunked blocking descriptor")
        return x.reshape(self.nchunks, self.chunk)

    @property
    def nchildren(self):
        return len(self.children)

    def child_global(self, i: int, child_dofs: np.ndarray) -> np.ndarray:
        """Map child-i DOF indices to flat global indices."""
        if self.ordering == "lexicographic":
            base = self._child_offset[i]
            inner = self.children[i]
            return base + child_dofs
        # interleaved
        return child_dofs * self.nchildren + i

    # -- leaves with accumulated global index transforms ---------------------
    @property
    def leaves(self):
        out = []
        for c in self.children:
            out.extend(c.leaves)
        return tuple(out)

    def leaf_element_dofs(self):
        """List of (E, nlocal) global DOF maps, one per leaf, offsets applied."""
        out = []
        for i, c in enumerate(self.children):
            if c.is_leaf:
                out.append(self.child_global(i, c.element_dofs.astype(np.int64)))
            else:
                for m in c.leaf_element_dofs():
                    out.append(self.child_global(i, m))
        return out

    def local_sizes(self):
        out = []
        for c in self.children:
            out.extend(c.local_sizes())
        return tuple(out)

    def restrict(self, x, i: int):
        """Extract child i's DOF subvector from the flat vector."""
        if self.ordering == "lexicographic":
            o = int(self._child_offset[i])
            return x[o : o + self.children[i].ndofs]
        return x[i :: self.nchildren]

    def embed(self, x, i: int, xc):
        """Write child i's subvector into the flat vector (functional update)."""
        if self.ordering == "lexicographic":
            o = int(self._child_offset[i])
            return x.at[o : o + self.children[i].ndofs].set(xc)
        return x.at[i :: self.nchildren].set(xc)

    def interpolate(self, fs, dtype=None):
        """Interpolate a tuple of callables (one per child) into a flat vector."""
        dtype = dtype or default_float()
        x = jnp.zeros(self.ndofs, dtype=dtype)
        for i, (c, f) in enumerate(zip(self.children, fs)):
            x = self.embed(x, i, c.interpolate(f, dtype=dtype))
        return x

    def zero(self, dtype=None):
        return jnp.zeros(self.ndofs, dtype=dtype or default_float())

    def __repr__(self):
        return (f"CompositeSpace({', '.join(map(repr, self.children))}, "
                f"ordering={self.ordering!r})")


class PermutedSpace(CompositeSpace):
    """Permuted ordering wrapper (reference: dune/pdelab/ordering/
    permutedordering.hh): global index = perm[inner index] for any bijection
    perm on [0, ndofs). Composes with any inner space (leaf, composite,
    power); assembly, constraints, and solves all see the permuted layout —
    use for bandwidth-reducing or backend-specific DOF orders."""

    def __init__(self, child, perm, name: str = ""):
        super().__init__(child, ordering="lexicographic", name=name)
        perm = np.asarray(perm, dtype=np.int64)
        if perm.shape != (child.ndofs,):
            raise ValueError("perm must have one entry per dof")
        self.perm = perm
        inv = np.empty_like(perm)
        inv[perm] = np.arange(len(perm), dtype=np.int64)
        self.inv_perm = inv

    def child_global(self, i: int, child_dofs):
        return self.perm[np.asarray(child_dofs, dtype=np.int64)]

    def restrict(self, x, i: int = 0):
        """Inner-ordered view of the permuted flat vector."""
        return x[jnp.asarray(self.perm)]

    def embed(self, x, i: int, xc):
        return x.at[jnp.asarray(self.perm)].set(xc)

    def interpolate(self, f, dtype=None):
        xc = self.children[0].interpolate(f, dtype=dtype)
        return jnp.zeros(self.ndofs, xc.dtype).at[
            jnp.asarray(self.perm)].set(xc)

    def __repr__(self):
        return f"PermutedSpace({self.children[0]!r})"


class PowerSpace(CompositeSpace):
    """k identical copies of a child space (PowerGridFunctionSpace analog,
    reference: dune/pdelab/gridfunctionspace/powergridfunctionspace.hh)."""

    def __init__(self, child, k: int, ordering: str = "lexicographic", name: str = ""):
        super().__init__(*([child] * k), ordering=ordering, name=name)
        self.child = child
        self.k = k

    def interpolate(self, f, dtype=None):
        """f may be a single callable returning a length-k vector, or a tuple."""
        if callable(f):
            fs = [
                (lambda pts, i=i: np.asarray(f(pts))[..., i])
                for i in range(self.k)
            ]
            return super().interpolate(fs, dtype=dtype)
        return super().interpolate(f, dtype=dtype)


def VectorSpace(mesh, fem, ncomp=None, ordering="lexicographic", name=""):
    """Vector-valued space sugar (VectorGridFunctionSpace analog, reference:
    dune/pdelab/gridfunctionspace/vectorgridfunctionspace.hh:33)."""
    return PowerSpace(FunctionSpace(mesh, fem), ncomp or mesh.dim,
                      ordering=ordering, name=name)


def _leaf_boundary_dof_mask(space: FunctionSpace) -> np.ndarray:
    """(ndofs,) bool mask of DOFs on the non-periodic domain boundary.

    Face-slice writes on the nd view — O(surface) work, no O(N) index
    arithmetic (large-array numpy is slow on some hosts; 100M+ DOFs).
    """
    if space.fem.continuity != "C0":
        return np.zeros(space.ndofs, dtype=bool)
    dims = space._dof_grid_dims
    mesh = space.mesh
    mask = np.zeros(tuple(reversed(dims)), dtype=bool)  # C-order, dim0 last
    for d in range(mesh.dim):
        if mesh.periodic[d]:
            continue
        ax = mesh.dim - 1 - d
        sl = [slice(None)] * mesh.dim
        sl[ax] = 0
        mask[tuple(sl)] = True
        sl[ax] = dims[d] - 1
        mask[tuple(sl)] = True
    return mask.reshape(-1)


def entity_blocked(space: CompositeSpace, name: str = "") -> PermutedSpace:
    """Heterogeneous entity-blocked ordering (reference:
    dune/pdelab/ordering/entityblockedlocalordering.hh:33,155 — per-entity
    blocks of all children's DOFs, with VARIABLE block size across entities,
    e.g. Taylor-Hood: (vx, vy, p) blocks at vertices, (vx, vy) at Q2-only
    nodes).

    Works for any composite tree of nodal C0 leaves on one shared mesh: DOFs
    are grouped by nodal coordinate (= the geometric entity position),
    ordered entity-major with the tree's leaf order inside each block.
    Returns a PermutedSpace carrying `entity_block_sizes` (one entry per
    entity, in layout order) for blocked backends."""

    def _leaf_globals(s):
        if s.is_leaf:
            return [(np.arange(s.ndofs, dtype=np.int64), s)]
        out = []
        for i, c in enumerate(s.children):
            for idx, lf in _leaf_globals(c):
                out.append((s.child_global(i, idx), lf))
        return out

    pairs = _leaf_globals(space)
    meshes = {id(lf.mesh) for _, lf in pairs}
    if len(meshes) != 1:
        raise ValueError("entity_blocked needs one shared mesh")
    coords = np.empty((space.ndofs, pairs[0][1].mesh.dim))
    rank = np.empty(space.ndofs, dtype=np.int64)
    for r, (gidx, lf) in enumerate(pairs):
        if lf.fem.nodes is None or lf.fem.continuity not in ("C0",):
            raise NotImplementedError(
                "entity_blocked permutation needs nodal C0 leaves")
        coords[gidx] = lf.dof_coords()
        rank[gidx] = r
    # quantize coordinates so shared-entity nodes compare equal
    h_min = np.min([np.min(lf.mesh.h) if lf.mesh.uniform else 1.0
                    for _, lf in pairs])
    q = np.round(coords / (1e-6 * h_min)).astype(np.int64)
    # entity-major order (lexsort: last key is primary): entities sorted by
    # coordinate, leaf rank varying fastest inside each entity block
    order = np.lexsort((rank,) + tuple(q[:, d] for d in range(q.shape[1])))
    perm = np.empty(space.ndofs, dtype=np.int64)
    perm[order] = np.arange(space.ndofs)
    out = PermutedSpace(space, perm, name=name or space.name)
    qs = q[order]
    newblock = np.any(qs[1:] != qs[:-1], axis=1)
    starts = np.concatenate([[0], np.nonzero(newblock)[0] + 1,
                             [space.ndofs]])
    out.entity_block_sizes = np.diff(starts)
    return out
