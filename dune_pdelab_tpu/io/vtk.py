"""VTK output: .vtu unstructured-grid files + .pvd time-series index.

TPU-native analog of PDELab's VTK integration (reference:
dune/pdelab/gridfunctionspace/vtk.hh:65-337 `addSolutionToVTKWriter` and the
VTKSequenceWriter usage in tests, e.g. dune/pdelab/test/testpoisson.cc:
264-266). Fields are discrete functions over a space: conforming (C0) fields
are written as point data evaluated at mesh vertices, DG fields as cell data
(element means). Output is XML .vtu with ascii payloads.
"""
from __future__ import annotations

import os

import numpy as np


_VTK_CELL = {2: 9, 3: 12}  # QUAD, HEXAHEDRON


def _vtk_corner_order(dim: int):
    """Map our bit-ordered corners to VTK node order."""
    if dim == 1:
        return [0, 1]
    if dim == 2:
        return [0, 1, 3, 2]
    return [0, 1, 3, 2, 4, 5, 7, 6]


def _vertex_values(space, x) -> np.ndarray:
    """Evaluate a C0/DG field at mesh vertices (E-local corner eval,
    last-write-wins scatter for conforming, mean for DG)."""
    mesh = space.mesh
    corners_ref = np.array(mesh.corner_offsets(), dtype=np.float64)
    vals, _ = space.fem.tabulate(corners_ref)              # (C, nb)
    u_loc = np.asarray(x)[np.asarray(space.element_dofs)]  # (E, nb)
    vvals = u_loc @ vals.T                                 # (E, C)
    ev = mesh.element_vertex_indices()
    out = np.zeros(mesh.nvertices)
    cnt = np.zeros(mesh.nvertices)
    np.add.at(out, ev.reshape(-1), vvals.reshape(-1))
    np.add.at(cnt, ev.reshape(-1), 1.0)
    return out / np.maximum(cnt, 1.0)


def _cell_means(space, x) -> np.ndarray:
    from dune_pdelab_tpu.space.functions import evaluate_at_quadrature
    import jax.numpy as jnp
    _, u, _, factor = evaluate_at_quadrature(space, x)
    vol = np.asarray(jnp.sum(factor * jnp.ones_like(u), axis=-1))
    return np.asarray(jnp.sum(factor * u, axis=-1)) / vol


class VTKWriter:
    """Collect fields over one mesh, write a .vtu file."""

    def __init__(self, mesh):
        self.mesh = mesh
        self.point_data: dict[str, np.ndarray] = {}
        self.cell_data: dict[str, np.ndarray] = {}

    def add_field(self, space, x, name: str, mode: str | None = None):
        """Add a scalar discrete function. mode: 'point' | 'cell' | None
        (auto: C0 -> point data, DG -> cell data)."""
        if space.mesh is not self.mesh:
            raise ValueError("field mesh differs from writer mesh")
        if mode is None:
            mode = "point" if space.fem.continuity == "C0" else "cell"
        if mode == "point":
            self.point_data[name] = _vertex_values(space, x)
        else:
            self.cell_data[name] = _cell_means(space, x)
        return self

    def add_vector_field(self, power_space, x, name: str):
        """Add a vector field from a PowerSpace subvector (flat layout)."""
        comps = []
        for c in range(power_space.nchildren):
            xc = power_space.restrict(x, c)
            comps.append(_vertex_values(power_space.children[c], xc))
        arr = np.stack(comps, axis=-1)
        if arr.shape[-1] == 2:  # VTK wants 3 components
            arr = np.concatenate([arr, np.zeros_like(arr[:, :1])], axis=-1)
        self.point_data[name] = arr
        return self

    def write(self, path: str, binary: bool | None = None) -> str:
        """Write the .vtu file; `binary=None` auto-selects the native binary
        writer (io/vtk_binary.py, C++ appended-raw payloads) when available,
        falling back to ascii XML."""
        mesh = self.mesh
        if not path.endswith(".vtu"):
            path = path + ".vtu"
        pts = mesh.vertex_coords()
        if mesh.dim < 3:
            pts = np.concatenate(
                [pts, np.zeros((len(pts), 3 - mesh.dim))], axis=1)
        conn = mesh.element_vertex_indices()[:, _vtk_corner_order(mesh.dim)]
        use_binary = (binary is True
                      or (binary is None and mesh.nvertices > 65536))
        if use_binary:
            try:
                from dune_pdelab_tpu.io import vtk_binary
                if vtk_binary.available():
                    return vtk_binary.write_vtu_binary(
                        path, pts, conn, _VTK_CELL.get(mesh.dim, 3),
                        self.point_data, self.cell_data)
            except Exception:
                if binary is True:
                    raise
        ncorn = conn.shape[1]
        offsets = np.arange(1, mesh.nelements + 1) * ncorn
        types = np.full(mesh.nelements, _VTK_CELL.get(mesh.dim, 3))

        def arr_to_txt(a, fmt="%.10g"):
            return "\n".join(" ".join(fmt % v for v in np.atleast_1d(row))
                             for row in a)

        def data_arrays(data: dict):
            out = []
            for name, a in data.items():
                ncomp = a.shape[1] if a.ndim > 1 else 1
                out.append(
                    f'<DataArray type="Float64" Name="{name}" '
                    f'NumberOfComponents="{ncomp}" format="ascii">\n'
                    + arr_to_txt(a) + "\n</DataArray>"
                )
            return "\n".join(out)

        xml = f"""<?xml version="1.0"?>
<VTKFile type="UnstructuredGrid" version="0.1" byte_order="LittleEndian">
<UnstructuredGrid>
<Piece NumberOfPoints="{mesh.nvertices}" NumberOfCells="{mesh.nelements}">
<PointData>
{data_arrays(self.point_data)}
</PointData>
<CellData>
{data_arrays(self.cell_data)}
</CellData>
<Points>
<DataArray type="Float64" NumberOfComponents="3" format="ascii">
{arr_to_txt(pts)}
</DataArray>
</Points>
<Cells>
<DataArray type="Int64" Name="connectivity" format="ascii">
{arr_to_txt(conn, "%d")}
</DataArray>
<DataArray type="Int64" Name="offsets" format="ascii">
{arr_to_txt(offsets, "%d")}
</DataArray>
<DataArray type="UInt8" Name="types" format="ascii">
{arr_to_txt(types, "%d")}
</DataArray>
</Cells>
</Piece>
</UnstructuredGrid>
</VTKFile>
"""
        with open(path, "w") as f:
            f.write(xml)
        return path


class VTKSequenceWriter:
    """Time-series writer producing numbered .vtu files + a .pvd index
    (VTKSequenceWriter analog)."""

    def __init__(self, basename: str):
        self.basename = basename
        self.entries: list[tuple[float, str]] = []

    def write(self, mesh, time: float, fields) -> str:
        """fields: list of (space, x, name) or a prepared VTKWriter."""
        if isinstance(fields, VTKWriter):
            w = fields
        else:
            w = VTKWriter(mesh)
            for space, x, name in fields:
                w.add_field(space, x, name)
        fname = f"{self.basename}-{len(self.entries):05d}.vtu"
        w.write(fname)
        self.entries.append((time, os.path.basename(fname)))
        self._write_pvd()
        return fname

    def _write_pvd(self):
        lines = [
            '<?xml version="1.0"?>',
            '<VTKFile type="Collection" version="0.1">',
            "<Collection>",
        ]
        for t, f in self.entries:
            lines.append(f'<DataSet timestep="{t}" part="0" file="{f}"/>')
        lines += ["</Collection>", "</VTKFile>"]
        with open(self.basename + ".pvd", "w") as f:
            f.write("\n".join(lines))
