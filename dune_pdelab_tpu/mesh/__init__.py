from dune_pdelab_tpu.mesh.structured import StructuredMesh
from dune_pdelab_tpu.mesh.simplex import SimplexMesh
