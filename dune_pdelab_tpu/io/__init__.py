from dune_pdelab_tpu.io.vtk import (
    VTKWriter, VTKSequenceWriter, ParallelVTKWriter,
)
from dune_pdelab_tpu.io.dgf import read_dgf
