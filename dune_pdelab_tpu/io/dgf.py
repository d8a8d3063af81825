"""DGF (DUNE grid format) reader — the grid-input format of the reference
test fixtures (reference: dune/pdelab/test/grids/*.dgf, parsed there by
dune-grid's DGFParser).

Supported blocks (the subset the reference grids use):
  * ``Interval``: lower point / upper point / cells-per-axis — a structured
    mesh; followed by an (empty) ``Simplex`` block it is triangulated.
  * ``Vertex`` + ``Simplex``: an unstructured triangle/tet mesh (0-based
    vertex indices, the DGF default).
``%`` comment lines and ``#`` block terminators follow the format; block
names are case-insensitive. ``Boundarydomain`` ids are recorded as
``mesh.boundary_domain_default`` when present.
"""
from __future__ import annotations

import numpy as np


def read_dgf(path):
    """Parse a DGF file into a StructuredMesh or SimplexMesh."""
    from dune_pdelab_tpu.mesh.structured import StructuredMesh
    from dune_pdelab_tpu.mesh.simplex import SimplexMesh

    blocks: dict[str, list[list[str]]] = {}
    cur = None
    with open(path) as f:
        first = f.readline().strip()
        if not first.upper().startswith("DGF"):
            raise ValueError(f"{path} is not a DGF file")
        for line in f:
            s = line.split("%")[0].strip()
            if not s:
                continue
            if s == "#":
                cur = None
                continue
            token = s.split()[0].lower()
            if cur is None:
                blocks[token] = []
                cur = token
                rest = s.split()[1:]
                if rest:
                    blocks[cur].append(rest)
            else:
                blocks[cur].append(s.split())

    bdefault = None
    if "boundarydomain" in blocks:
        for row in blocks["boundarydomain"]:
            if row and row[0].lower() == "default":
                bdefault = int(row[1])

    if "interval" in blocks:
        rows = blocks["interval"]
        lower = [float(v) for v in rows[0]]
        upper = [float(v) for v in rows[1]]
        cells = [int(v) for v in rows[2]]
        mesh = StructuredMesh(lower, upper, tuple(cells))
        if "simplex" in blocks:
            mesh = SimplexMesh.from_structured(mesh)
        mesh.boundary_domain_default = bdefault
        return mesh

    if "vertex" in blocks and "simplex" in blocks:
        rows = blocks["vertex"]
        # optional "firstindex n" parameter line
        first_index = 0
        if rows and rows[0][0].lower() == "firstindex":
            first_index = int(rows[0][1])
            rows = rows[1:]
        verts = np.array([[float(v) for v in r] for r in rows])
        cells = np.array([[int(v) - first_index for v in r]
                          for r in blocks["simplex"]])
        mesh = SimplexMesh(verts, cells)
        mesh._positively_oriented()
        uniq_f, _, counts = mesh.faces()
        vb = np.zeros(mesh.nvertices, dtype=bool)
        vb[uniq_f[counts == 1].ravel()] = True
        mesh._boundary_vertices = vb
        mesh.boundary_domain_default = bdefault
        return mesh

    raise NotImplementedError(
        f"DGF blocks {sorted(blocks)} in {path}: need Interval or "
        "Vertex+Simplex")
