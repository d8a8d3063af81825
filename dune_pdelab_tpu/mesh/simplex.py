"""Unstructured simplex meshes (triangles / tetrahedra).

TPU-native analog of the unstructured-grid usage in the reference tests
(reference: dune/pdelab/test/gridexamples.hh:26-273 — triangulated unit
squares/cubes via UGGrid/ALUGrid): a simplex mesh here is explicit numpy
connectivity (vertices + cells), most conveniently produced by
triangulating a structured mesh. Geometry is affine per element; entity
lists (edges, boundary classification) are computed once at setup for the
Pk DOF maps.

Volume assembly (alpha/lambda_volume), face integrals (skeleton/boundary
kernels via the assembler's embedding-configuration face groups), and local
adaptive refinement (newest-vertex bisection, `refine_bisection`) are all
supported.
"""
from __future__ import annotations

import numpy as np


class SimplexMesh:
    geometry_type = "simplex"
    uniform = False
    coords = None

    def __init__(self, vertices: np.ndarray, cells: np.ndarray,
                 boundary_vertices: np.ndarray | None = None,
                 lower=None, upper=None):
        self.vertices = np.asarray(vertices, np.float64)
        self.cells = np.asarray(cells, np.int64)
        self.dim = self.vertices.shape[1]
        assert self.cells.shape[1] == self.dim + 1
        self.nvertices = len(self.vertices)
        self.nelements = len(self.cells)
        self.ncorners = self.dim + 1
        self.periodic = (False,) * self.dim
        self.lower = (np.asarray(lower) if lower is not None
                      else self.vertices.min(axis=0))
        self.upper = (np.asarray(upper) if upper is not None
                      else self.vertices.max(axis=0))
        self._boundary_vertices = boundary_vertices
        self._edges = None

    # -- construction --------------------------------------------------------
    @classmethod
    def from_gmsh(cls, path):
        """Read a Gmsh MSH 2.x ASCII file (the mesh format of the reference
        test grids, reference: dune/pdelab/test/grids/*.msh read through
        dune-grid's GmshReader).

        Triangles (element type 2) make a 2D mesh, tetrahedra (type 4) a 3D
        mesh (tets win when both appear — the triangles are then boundary
        facets). Physical tags are kept: `cell_tags` (E,) per cell, and
        `facet_tags` maps a sorted boundary-facet vertex tuple to its
        physical id (for region-wise boundary conditions).

        Parsing runs through the native C++ reader (io/native/
        msh_reader.cc) when the toolchain is available — identical output
        arrays, ~order-of-magnitude faster on large meshes — and falls
        back to the pure-Python parser below otherwise."""
        parsed = None
        try:
            from dune_pdelab_tpu.io import msh_native
            if msh_native.available():
                parsed = msh_native.parse_msh(path)
        except Exception:
            parsed = None
        if parsed is None:
            parsed = cls._parse_msh_py(path)
        coords, tris, tritags, tets, tettags, lines2, linetags = parsed
        if len(tets):
            dim, cells, ctags = 3, np.asarray(tets), np.asarray(tettags)
            facets, ftags = np.asarray(tris), np.asarray(tritags)
        elif len(tris):
            dim, cells, ctags = 2, np.asarray(tris), np.asarray(tritags)
            facets, ftags = np.asarray(lines2), np.asarray(linetags)
        else:
            raise ValueError(f"no triangles or tetrahedra in {path}")
        verts = coords[:, :dim]
        m = cls(verts, cells)
        m._positively_oriented()
        uniq_f, _, counts = m.faces()
        vb = np.zeros(m.nvertices, dtype=bool)
        vb[uniq_f[counts == 1].ravel()] = True
        m._boundary_vertices = vb
        m.cell_tags = ctags
        m.facet_tags = {tuple(sorted(int(v) for v in fv)): int(t)
                        for fv, t in zip(facets, ftags)}
        return m

    @staticmethod
    def _parse_msh_py(path):
        """Pure-Python MSH 2.x parser (fallback; same output tuple as
        io/msh_native.parse_msh)."""
        with open(path) as f:
            lines = f.read().split("\n")
        i = 0

        def seek(section):
            nonlocal i
            while i < len(lines) and lines[i].strip() != section:
                i += 1
            if i == len(lines):
                raise ValueError(f"{section} not found in {path}")
            i += 1

        seek("$MeshFormat")
        ver = lines[i].split()[0]
        if not ver.startswith("2"):
            raise NotImplementedError(
                f"MSH format {ver}: only the 2.x ASCII format is supported "
                "(export from gmsh with -format msh22)")
        seek("$Nodes")
        nn = int(lines[i]); i += 1
        coords = np.empty((nn, 3))
        idmap = {}
        for r in range(nn):
            parts = lines[i + r].split()
            idmap[int(parts[0])] = r
            coords[r] = [float(parts[1]), float(parts[2]), float(parts[3])]
        i += nn
        seek("$Elements")
        ne = int(lines[i]); i += 1
        tris, tritags, tets, tettags, lines2, linetags = [], [], [], [], [], []
        for r in range(ne):
            parts = lines[i + r].split()
            etype = int(parts[1])
            ntags = int(parts[2])
            tag = int(parts[3]) if ntags > 0 else 0
            nodes = [idmap[int(p)] for p in parts[3 + ntags:]]
            if etype == 2:
                tris.append(nodes); tritags.append(tag)
            elif etype == 4:
                tets.append(nodes); tettags.append(tag)
            elif etype == 1:
                lines2.append(nodes); linetags.append(tag)
        return (coords,
                np.asarray(tris, np.int64).reshape(-1, 3),
                np.asarray(tritags, np.int64),
                np.asarray(tets, np.int64).reshape(-1, 4),
                np.asarray(tettags, np.int64),
                np.asarray(lines2, np.int64).reshape(-1, 2),
                np.asarray(linetags, np.int64))

    @classmethod
    def from_structured(cls, smesh):
        """Triangulate a structured quad (2D) or hex (3D) mesh."""
        verts = smesh.vertex_coords()
        ev = smesh.element_vertex_indices()      # corners in bit order
        if smesh.dim == 2:
            # quad corners (00, 10, 01, 11) -> two triangles
            t1 = ev[:, [0, 1, 3]]
            t2 = ev[:, [0, 3, 2]]
            cells = np.concatenate([t1, t2], axis=0)
        elif smesh.dim == 3:
            # six tetrahedra per hex (Kuhn triangulation along 0-7 diagonal)
            paths = [
                (0, 1, 3, 7), (0, 1, 5, 7), (0, 2, 3, 7),
                (0, 2, 6, 7), (0, 4, 5, 7), (0, 4, 6, 7),
            ]
            cells = np.concatenate([ev[:, list(p)] for p in paths], axis=0)
        else:
            raise NotImplementedError(smesh.dim)
        vb = np.zeros(len(verts), dtype=bool)
        for d in range(smesh.dim):
            if not smesh.periodic[d]:
                vb |= np.isclose(verts[:, d], smesh.lower[d])
                vb |= np.isclose(verts[:, d], smesh.upper[d])
        return cls(verts, cells, boundary_vertices=vb,
                   lower=smesh.lower, upper=smesh.upper)

    # -- entities ------------------------------------------------------------
    def element_corner_coords(self) -> np.ndarray:
        return self.vertices[self.cells]

    def element_vertex_indices(self) -> np.ndarray:
        """(E, dim+1) corner vertex ids (structured-mesh interface name)."""
        return self.cells

    def vertex_coords(self) -> np.ndarray:
        """(nvertices, dim) coordinates (structured-mesh interface name)."""
        return self.vertices

    def corner_offsets(self) -> np.ndarray:
        """Reference-simplex corner coordinates in local vertex order (the
        P1 geometry convention: v0 at origin, v_j = e_{dim-j})."""
        from dune_pdelab_tpu.fe.basis import PkFEM
        return PkFEM(1, self.dim).nodes

    def element_centers(self) -> np.ndarray:
        return self.element_corner_coords().mean(axis=1)

    def edges(self):
        """(unique_edges (NE, 2) sorted vertex pairs,
            cell_edges (E, nedges_per_cell) edge ids).
        Local edge l = pair (a, b) of local vertices in lexicographic order."""
        if self._edges is None:
            d = self.dim
            pairs = [(a, b) for a in range(d + 1) for b in range(a + 1, d + 1)]
            raw = np.stack([
                np.sort(self.cells[:, list(p)], axis=1) for p in pairs
            ], axis=1)                                     # (E, np, 2)
            flat = raw.reshape(-1, 2)
            uniq, inv = np.unique(flat, axis=0, return_inverse=True)
            self._edges = (uniq, inv.reshape(self.nelements, len(pairs)))
            self._edge_pairs = pairs
        return self._edges

    def faces(self):
        """Unique codim-1 faces.

        Returns (unique_faces (NF, dim) sorted global vertex tuples,
        face_of (E, dim+1) face id of local face l — the face OPPOSITE local
        vertex l — and counts (NF,) number of adjacent cells). The analog of
        the reference's intersection iteration setup (reference:
        dune/pdelab/gridoperator/common/assemblerutilities.hh intersection
        sweep; faces materialized once here instead of per-sweep)."""
        if getattr(self, "_faces", None) is None:
            d = self.dim
            locs = [[v for v in range(d + 1) if v != l] for l in range(d + 1)]
            raw = np.stack([self.cells[:, lv] for lv in locs], axis=1)
            key = np.sort(raw, axis=2)                 # (E, d+1, d)
            flat = key.reshape(-1, d)
            uniq, inv, counts = np.unique(
                flat, axis=0, return_inverse=True, return_counts=True)
            self._faces = (uniq, inv.reshape(self.nelements, d + 1), counts)
            self._face_locs = locs
        return self._faces

    def interior_faces(self):
        """dict of arrays: inside/outside cell ids and their local face ids
        for every interior (2-cell) face. inside = lower cell id."""
        uniq, face_of, counts = self.faces()
        d = self.dim
        nf = len(uniq)
        # (cell, local) pairs per face id
        order = np.argsort(face_of.ravel(), kind="stable")
        cells_flat = order // (d + 1)
        locs_flat = order % (d + 1)
        starts = np.searchsorted(face_of.ravel()[order], np.arange(nf))
        interior = np.nonzero(counts == 2)[0]
        a = starts[interior]
        return {
            "face": interior,
            "inside": cells_flat[a],
            "face_in": locs_flat[a],
            "outside": cells_flat[a + 1],
            "face_out": locs_flat[a + 1],
        }

    def boundary_faces(self):
        """dict of arrays: cell id + local face id of every boundary face."""
        uniq, face_of, counts = self.faces()
        d = self.dim
        nf = len(uniq)
        order = np.argsort(face_of.ravel(), kind="stable")
        starts = np.searchsorted(face_of.ravel()[order], np.arange(nf))
        boundary = np.nonzero(counts == 1)[0]
        a = starts[boundary]
        return {
            "face": boundary,
            "element": order[a] // (d + 1),
            "local_face": order[a] % (d + 1),
        }

    def boundary_vertex_mask(self) -> np.ndarray:
        if self._boundary_vertices is not None:
            return self._boundary_vertices
        # fallback: bounding-box predicate
        vb = np.zeros(self.nvertices, dtype=bool)
        for d in range(self.dim):
            vb |= np.isclose(self.vertices[:, d], self.lower[d])
            vb |= np.isclose(self.vertices[:, d], self.upper[d])
        return vb

    def boundary_edge_mask(self) -> np.ndarray:
        """Edges on the topological domain boundary: sub-edges of faces with
        a single adjacent cell (correct for any domain shape, incl.
        submesh-cut L-shapes)."""
        uniq, _ = self.edges()
        uniq_f, _, counts = self.faces()
        bf = uniq_f[counts == 1]                    # sorted vertex tuples
        if self.dim == 2:
            sub = bf
        else:
            sub = np.concatenate([bf[:, [0, 1]], bf[:, [0, 2]],
                                  bf[:, [1, 2]]], axis=0)
        key_e = uniq[:, 0] * np.int64(self.nvertices) + uniq[:, 1]
        key_b = sub[:, 0] * np.int64(self.nvertices) + sub[:, 1]
        return np.isin(key_e, key_b)

    def boundary_face_mask(self) -> np.ndarray:
        """(NF,) bool: codim-1 faces with a single adjacent cell."""
        _, _, counts = self.faces()
        return counts == 1

    def submesh(self, cell_mask):
        """Restrict to the selected cells, compacting vertices (used to cut
        non-box domains — e.g. L-shapes — out of a triangulated box).
        Boundary vertices are recomputed from face counts."""
        cell_mask = np.asarray(cell_mask)
        cells = self.cells[cell_mask]
        used = np.unique(cells.ravel())
        remap = np.full(self.nvertices, -1, dtype=np.int64)
        remap[used] = np.arange(len(used))
        m = SimplexMesh(self.vertices[used], remap[cells])
        uniq_f, _, counts = m.faces()
        vb = np.zeros(m.nvertices, dtype=bool)
        vb[uniq_f[counts == 1].ravel()] = True
        m._boundary_vertices = vb
        return m

    # -- local refinement: newest-vertex bisection ---------------------------
    def oriented_for_bisection(self):
        """Prepare the mesh for newest-vertex bisection. 2D: rotate each
        triangle so its LONGEST edge is opposite local vertex 0, keeping
        positive orientation. 3D: order each tetrahedron for Maubach's
        tagged bisection — refinement edge (the longest, ties broken by
        global vertex ids) at local positions (0, 3), the remaining two
        vertices id-sorted in between, type 0 — the classical longest-edge
        initialization that is consistent across shared edges (exact for
        Kuhn/`from_structured` meshes, where the cube diagonal is every
        tet's longest edge). Call once before the first
        `refine_bisection`."""
        if self.dim == 3:
            return self._oriented_for_bisection_3d()
        if self.dim != 2:
            raise NotImplementedError(
                "bisection refinement: dim 2 and 3 only")
        cc = self.element_corner_coords()                    # (E, 3, 2)
        # edge opposite vertex l has length |v_{l+1} - v_{l+2}|
        lens = np.stack([
            np.linalg.norm(cc[:, (l + 1) % 3] - cc[:, (l + 2) % 3], axis=1)
            for l in range(3)], axis=1)
        peak = np.argmax(lens, axis=1)                       # local v0 choice
        rot = (peak[:, None] + np.arange(3)[None, :]) % 3    # cyclic keeps det
        cells = np.take_along_axis(self.cells, rot, axis=1)
        m = SimplexMesh(self.vertices, cells,
                        boundary_vertices=self._boundary_vertices,
                        lower=self.lower, upper=self.upper)
        return m._positively_oriented()

    def _positively_oriented(self):
        """Swap local vertices 1<->2 where the assembler's affine map has
        negative determinant (preserves the refinement edge (v1, v2))."""
        cc = self.element_corner_coords()
        d1 = self.dim + 1
        J = np.stack([cc[:, d1 - 1 - i] - cc[:, 0] for i in range(self.dim)],
                     axis=-1)
        neg = np.linalg.det(J) < 0
        cells = self.cells.copy()
        cells[neg, 1], cells[neg, 2] = self.cells[neg, 2], self.cells[neg, 1]
        self.cells = cells
        return self

    def refine_bisection(self, marks):
        """Newest-vertex bisection of the marked triangles with conforming
        closure (reference counterpart: local `grid.adapt()` on simplicial
        UGGrid/ALUGrid driven by dune/pdelab/adaptivity/adaptivity.hh:632;
        bisection closure makes the result conforming, so no hanging-node
        constraints arise).

        Convention: the refinement edge of a cell is the edge opposite
        local vertex 0; children are stored newest-vertex-first, so the
        convention is self-maintaining across calls. Closure marks the
        refinement edge of any cell touching a split edge (fixpoint loop);
        per call a cell bisects at most twice (its children's refinement
        edges are original edges, grandchildren's are half-edges).

        Returns (new_mesh, transfer) with transfer = (n_old_vertices,
        midpoint_vertex_ids, edge_endpoint_ids (nmid, 2)) for nodal solution
        transfer (P1: value at midpoint = mean of endpoints).
        """
        if self.dim == 3:
            return self._refine_bisection_3d(marks)
        if self.dim != 2:
            raise NotImplementedError(
                "bisection refinement: dim 2 and 3 only")
        marks = np.asarray(marks)
        if marks.dtype == bool:
            marks = np.nonzero(marks)[0]
        uniq_e, cell_e = self.edges()
        pairs = self._edge_pairs                              # [(0,1),(0,2),(1,2)]
        ref_loc = pairs.index((1, 2))
        ref_eid = cell_e[:, ref_loc]
        split = np.zeros(len(uniq_e), dtype=bool)
        split[ref_eid[marks]] = True
        # closure fixpoint: any cell touching a split edge splits its
        # refinement edge
        while True:
            need = split[cell_e].any(axis=1) & ~split[ref_eid]
            if not need.any():
                break
            split[ref_eid[need]] = True
        split_ids = np.nonzero(split)[0]
        nv = self.nvertices
        mid_of = np.full(len(uniq_e), -1, dtype=np.int64)
        mid_of[split_ids] = nv + np.arange(len(split_ids))
        new_verts = np.concatenate([
            self.vertices,
            0.5 * (self.vertices[uniq_e[split_ids, 0]]
                   + self.vertices[uniq_e[split_ids, 1]])], axis=0)

        e01 = cell_e[:, pairs.index((0, 1))]
        e02 = cell_e[:, pairs.index((0, 2))]
        cells_out = []
        parents = []

        c = self.cells
        for e in range(self.nelements):
            v0, v1, v2 = c[e]

            def emit(tri):
                cells_out.append(tri)
                parents.append(e)

            if not split[ref_eid[e]]:
                emit((v0, v1, v2))
                continue
            m12 = mid_of[ref_eid[e]]
            # children: (m, v0, v1) and (m, v2, v0); their refinement edges
            # are the original edges (v0,v1) and (v2,v0)
            for (ma, a, b, eid) in (
                    (m12, v0, v1, e01[e]), (m12, v2, v0, e02[e])):
                if split[eid]:
                    mab = mid_of[eid]
                    emit((mab, ma, a))
                    emit((mab, b, ma))
                else:
                    emit((ma, a, b))
        cells_new = np.asarray(cells_out, dtype=np.int64)
        mesh = SimplexMesh(new_verts, cells_new,
                           lower=self.lower, upper=self.upper)
        mesh.parent_cells = np.asarray(parents, dtype=np.int64)
        mesh._positively_oriented()
        # boundary vertices from face counts (robust for non-box domains,
        # e.g. L-shapes)
        uniq_f, _, counts = mesh.faces()
        vb = np.zeros(len(new_verts), dtype=bool)
        vb[uniq_f[counts == 1].ravel()] = True
        mesh._boundary_vertices = vb
        transfer = (nv, mid_of[split_ids], uniq_e[split_ids])
        return mesh, transfer

    # -- 3D: Traxler typed bisection -----------------------------------------
    def _oriented_for_bisection_3d(self):
        cc = self.element_corner_coords()                    # (E, 4, 3)
        cells = np.asarray(self.cells)
        E = len(cells)
        # longest edge per tet, ties broken by (sorted global id pair)
        pairs = [(a, b) for a in range(4) for b in range(a + 1, 4)]
        lens = np.stack([np.linalg.norm(cc[:, a] - cc[:, b], axis=1)
                         for a, b in pairs], axis=1)
        gid = np.stack([np.sort(cells[:, [a, b]], axis=1)
                        for a, b in pairs], axis=1)          # (E, 6, 2)
        # argmax with deterministic tie-break: longest, then smallest ids
        key = (np.round(lens / lens.max() * 1e12).astype(np.int64),
               -gid[:, :, 0], -gid[:, :, 1])
        order = np.lexsort((key[2], key[1], key[0]), axis=1)
        best = order[:, -1]                                  # (E,)
        new_cells = np.empty_like(cells)
        verts = self.vertices
        for e in range(E):
            a, b = pairs[best[e]]
            v0, vd = cells[e, a], cells[e, b]
            # consistent diagonal direction across elements: v0 = the
            # coordinate-lexicographically smaller endpoint (all Kuhn-cube
            # diagonals then point the same way — the reflection
            # compatibility Maubach needs; id-based choices flip direction
            # between cubes and the similarity classes degenerate)
            if tuple(verts[vd]) < tuple(verts[v0]):
                v0, vd = vd, v0
            rest = [v for v in cells[e] if v != v0 and v != vd]
            # middle vertices in PATH order: by distance from v0 (the
            # canonical Kuhn ordering v1 = origin + e_i,
            # v2 = origin + e_i + e_j), coordinate-lex tie-break
            rest.sort(key=lambda v: (float(np.dot(verts[v] - verts[v0],
                                                  verts[v] - verts[v0])),
                                     tuple(verts[v])))
            new_cells[e] = (v0, rest[0], rest[1], vd)
        m = SimplexMesh(self.vertices, new_cells,
                        boundary_vertices=self._boundary_vertices,
                        lower=self.lower, upper=self.upper)
        # Traxler type tags: Kuhn-ordered tets start at type 0 — verified
        # empirically on the Kuhn box: uniform bisection then grows by
        # EXACTLY 2x per generation (zero closure cascade) with the shape
        # measure constant across 9 generations (finitely many similarity
        # classes); types 1/2 cascade and degenerate
        m.bisect_tag = np.zeros(E, np.int64)
        return m

    def _refine_bisection_3d(self, marks):
        """Traxler's tagged newest-vertex bisection for tetrahedra with
        conforming closure (Traxler 1997; Stevenson 2008 compatibility).
        Typed simplex (x0, x1, x2, x3)_t, t in {0, 1, 2}: refinement edge
        (x0, x3), midpoint z; children
            C1 = (x0, z, x1, x2)_{t+1 mod 3}
            C2 = (x3, z, x2, x1)_{t+1 mod 3}   for t == 0
            C2 = (x3, z, x1, x2)_{t+1 mod 3}   for t == 1, 2.
        Kuhn-ordered initial meshes at type 0 are reflection-compatible:
        uniform bisection grows by exactly 2x per generation (no closure
        cascade) with the shape measure constant across generations
        (finitely many similarity classes — validated empirically in
        tests/test_simplex_adapt3d.py). Closure: bisect any tet containing
        an already-split edge (by its OWN refinement edge), repeat to
        fixpoint — conforming, no hanging nodes. reference counterpart:
        `grid.adapt()` on simplicial grids driven by
        dune/pdelab/adaptivity/adaptivity.hh:632, which is
        dimension-generic over the grid manager.

        Transfer note: with multi-level closure a midpoint's edge
        endpoints may themselves be (earlier-created) midpoints; consumers
        must resolve values in creation order (adaptivity/local.py does).
        """
        d = 3
        marks = np.asarray(marks)
        if marks.dtype == bool:
            marks = np.nonzero(marks)[0]
        if not hasattr(self, "bisect_tag"):
            raise ValueError(
                "3D bisection needs Maubach tags: call "
                "oriented_for_bisection() on the initial mesh first")
        tags = np.asarray(self.bisect_tag)
        cells = [tuple(int(v) for v in c) for c in self.cells]
        ctags = [int(t) for t in tags]
        parents = list(range(self.nelements))
        nv = self.nvertices
        coords = [None]                       # lazy: old coords stay put
        mid = {}                              # (a<b) edge -> new vertex id
        mid_order = []                        # creation order (keys)
        new_coords = []

        def vcoord(i):
            return (self.vertices[i] if i < nv
                    else new_coords[i - nv])

        def midpoint(a, b):
            key = (a, b) if a < b else (b, a)
            z = mid.get(key)
            if z is None:
                z = nv + len(new_coords)
                mid[key] = z
                mid_order.append(key)
                new_coords.append(0.5 * (vcoord(key[0]) + vcoord(key[1])))
            return z

        def has_split_edge(c):
            for i in range(4):
                for j in range(i + 1, 4):
                    a, b = c[i], c[j]
                    if ((a, b) if a < b else (b, a)) in mid:
                        return True
            return False

        def bisect_one(c, t, par):
            z = midpoint(c[0], c[3])
            c1 = (c[0], z, c[1], c[2])
            c2 = ((c[3], z, c[2], c[1]) if t == 0
                  else (c[3], z, c[1], c[2]))
            nt = (t + 1) % d
            return (c1, nt, par), (c2, nt, par)

        work = set(int(e) for e in marks)
        for _pass in range(200):
            if work:
                nxt_cells, nxt_tags, nxt_par = [], [], []
                for i, (c, k, p) in enumerate(zip(cells, ctags, parents)):
                    if i in work:
                        (c1, k1, p1), (c2, k2, p2) = bisect_one(c, k, p)
                        nxt_cells += [c1, c2]
                        nxt_tags += [k1, k2]
                        nxt_par += [p1, p2]
                    else:
                        nxt_cells.append(c)
                        nxt_tags.append(k)
                        nxt_par.append(p)
                cells, ctags, parents = nxt_cells, nxt_tags, nxt_par
            # closure: any cell containing a split edge bisects next round
            work = {i for i, c in enumerate(cells) if has_split_edge(c)}
            if not work:
                break
        else:
            raise RuntimeError(
                "3D bisection closure did not terminate in 200 passes — "
                "initial mesh tags are incompatible; re-run "
                "oriented_for_bisection() on the coarse mesh or coarsen "
                "the marking")

        new_verts = np.concatenate(
            [self.vertices, np.asarray(new_coords).reshape(-1, 3)], axis=0)
        mesh = SimplexMesh(new_verts, np.asarray(cells, np.int64),
                           lower=self.lower, upper=self.upper)
        mesh.parent_cells = np.asarray(parents, np.int64)
        mesh.bisect_tag = np.asarray(ctags, np.int64)
        uniq_f, _, counts = mesh.faces()
        vb = np.zeros(len(new_verts), dtype=bool)
        vb[uniq_f[counts == 1].ravel()] = True
        mesh._boundary_vertices = vb
        mids = np.asarray([mid[k] for k in mid_order], np.int64)
        ends = np.asarray(mid_order, np.int64).reshape(-1, 2)
        return mesh, (nv, mids, ends)

    def __repr__(self):
        return (f"SimplexMesh(dim={self.dim}, nelements={self.nelements}, "
                f"nvertices={self.nvertices})")
