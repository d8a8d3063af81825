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
