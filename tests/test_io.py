"""VTK output tests (vtk.hh / addSolutionToVTKWriter analog)."""
import os
import xml.etree.ElementTree as ET

import numpy as np

from dune_pdelab_tpu import StructuredMesh, FunctionSpace, QkFEM
from dune_pdelab_tpu.fe import QkDGFEM
from dune_pdelab_tpu.io import VTKWriter, VTKSequenceWriter


def test_vtu_roundtrip(tmp_path):
    mesh = StructuredMesh([0, 0], [1, 1], (3, 2))
    V = FunctionSpace(mesh, QkFEM(1, 2))
    x = V.interpolate(lambda p: p[:, 0] + 2 * p[:, 1])
    path = VTKWriter(mesh).add_field(V, x, "u").write(str(tmp_path / "out"))
    tree = ET.parse(path)
    pieces = tree.findall(".//Piece")
    assert pieces and pieces[0].get("NumberOfCells") == "6"
    da = tree.find(".//PointData/DataArray")
    vals = np.fromstring(da.text.replace("\n", " "), sep=" ")
    coords = mesh.vertex_coords()
    assert np.allclose(vals, coords[:, 0] + 2 * coords[:, 1], atol=1e-12)


def test_vtu_dg_cell_data(tmp_path):
    mesh = StructuredMesh([0, 0], [1, 1], (2, 2))
    V = FunctionSpace(mesh, QkDGFEM(1, 2))
    x = V.interpolate(lambda p: np.ones(len(p)))
    path = VTKWriter(mesh).add_field(V, x, "rho").write(str(tmp_path / "dg"))
    tree = ET.parse(path)
    da = tree.find(".//CellData/DataArray")
    vals = np.fromstring(da.text.replace("\n", " "), sep=" ")
    assert np.allclose(vals, 1.0, atol=1e-12)


def test_vtu_3d_and_sequence(tmp_path):
    mesh = StructuredMesh([0, 0, 0], [1, 1, 1], (2, 2, 2))
    V = FunctionSpace(mesh, QkFEM(1, 3))
    seq = VTKSequenceWriter(str(tmp_path / "series"))
    for step, t in enumerate((0.0, 0.5)):
        x = V.interpolate(lambda p: t + p[:, 2])
        seq.write(mesh, t, [(V, x, "u")])
    assert os.path.exists(str(tmp_path / "series.pvd"))
    assert os.path.exists(str(tmp_path / "series-00001.vtu"))
    pvd = ET.parse(str(tmp_path / "series.pvd"))
    assert len(pvd.findall(".//DataSet")) == 2


def test_binary_vtu_writer(tmp_path):
    """Native (C++) binary writer roundtrip: parse the appended payload and
    compare with the field values."""
    import struct
    from dune_pdelab_tpu.io import vtk_binary
    if not vtk_binary.available():
        import pytest
        pytest.skip("no native toolchain")
    mesh = StructuredMesh([0, 0], [1, 1], (3, 2))
    V = FunctionSpace(mesh, QkFEM(1, 2))
    x = V.interpolate(lambda p: p[:, 0] + 2 * p[:, 1])
    w = VTKWriter(mesh).add_field(V, x, "u")
    path = w.write(str(tmp_path / "bin"), binary=True)
    raw = open(path, "rb").read()
    # appended data starts after the first underscore following AppendedData
    marker = raw.index(b'encoding="raw"')
    start = raw.index(b"_", marker) + 1
    nbytes = struct.unpack("<Q", raw[start:start + 8])[0]
    vals = np.frombuffer(raw[start + 8:start + 8 + nbytes], dtype=np.float64)
    coords = mesh.vertex_coords()
    assert np.allclose(vals, coords[:, 0] + 2 * coords[:, 1])
    # header cross-check: ascii variant agrees
    path2 = w.write(str(tmp_path / "ascii"), binary=False)
    import xml.etree.ElementTree as ET
    da = ET.parse(path2).find(".//PointData/DataArray")
    vals2 = np.fromstring(da.text.replace("\n", " "), sep=" ")
    assert np.allclose(vals, vals2)


def test_binary_vtu_speed_smoke(tmp_path):
    """Binary path handles a ~1M-point field quickly (native IO check)."""
    from dune_pdelab_tpu.io import vtk_binary
    if not vtk_binary.available():
        import pytest
        pytest.skip("no native toolchain")
    import time
    mesh = StructuredMesh([0, 0], [1, 1], (1023, 1023))
    V = FunctionSpace(mesh, QkFEM(1, 2))
    x = V.interpolate(lambda p: p[:, 0])
    t0 = time.perf_counter()
    VTKWriter(mesh).add_field(V, x, "u").write(str(tmp_path / "big"),
                                               binary=True)
    dt = time.perf_counter() - t0
    assert dt < 10.0, dt
    assert os.path.getsize(str(tmp_path / "big.vtu")) > 8 * 1024**2


def test_pvtu_parallel_pieces(tmp_path):
    """ParallelVTKWriter: per-shard .vtu pieces + .pvtu master referencing
    them; piece cell counts sum to the mesh total; point data restricted
    consistently (vtk.hh:65-400 parallel path analog)."""
    from dune_pdelab_tpu.io import ParallelVTKWriter

    mesh = StructuredMesh([0, 0], [1, 1], (4, 4))
    V = FunctionSpace(mesh, QkFEM(1, 2))
    x = V.interpolate(lambda p: p[:, 0] + 2 * p[:, 1])
    owner = np.repeat(np.arange(4), 4)          # 4 shards of 4 elements
    w = ParallelVTKWriter(mesh, owner).add_field(V, x, "u")
    path = w.write(str(tmp_path / "par"))
    assert path.endswith(".pvtu")
    tree = ET.parse(path)
    pieces = tree.findall(".//Piece")
    assert len(pieces) == 4
    total = 0
    for pc in pieces:
        sub = ET.parse(os.path.join(os.path.dirname(path),
                                    pc.get("Source")))
        el = sub.find(".//Piece")
        total += int(el.get("NumberOfCells"))
        da = sub.find(".//PointData/DataArray")
        assert da.get("Name") == "u"
    assert total == mesh.nelements
    decl = tree.find(".//PPointData/PDataArray")
    assert decl.get("Name") == "u"


def test_vtu_simplex_mesh(tmp_path):
    """Simplex meshes write TRIANGLE/TETRA cells."""
    from dune_pdelab_tpu.mesh.simplex import SimplexMesh
    from dune_pdelab_tpu.fe import PkFEM

    sm = SimplexMesh.from_structured(StructuredMesh([0, 0], [1, 1], (2, 2)))
    V = FunctionSpace(sm, PkFEM(1, 2))
    x = V.interpolate(lambda p: p[:, 0] - p[:, 1])
    path = VTKWriter(sm).add_field(V, x, "u").write(
        str(tmp_path / "tri"), binary=False)
    tree = ET.parse(path)
    types = tree.find(".//Cells/DataArray[@Name='types']").text.split()
    assert set(types) == {"5"}                   # VTK_TRIANGLE
    assert tree.find(".//Piece").get("NumberOfCells") == str(sm.nelements)
