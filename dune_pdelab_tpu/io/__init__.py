from dune_pdelab_tpu.io.vtk import VTKWriter, VTKSequenceWriter
