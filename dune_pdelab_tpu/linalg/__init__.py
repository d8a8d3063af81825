from dune_pdelab_tpu.linalg.krylov import (
    cg, bicgstab, minres, restarted_gmres, richardson_loop, SolverStats, SOLVERS,
)
from dune_pdelab_tpu.linalg import preconditioners
from dune_pdelab_tpu.linalg.multigrid import GeometricMultigrid, build_prolongation
from dune_pdelab_tpu.linalg.geneo import (
    GenEOPreconditioner, GenEOLatticePreconditioner, geneo_preconditioner_for,
)
from dune_pdelab_tpu.linalg.dgmultigrid import DGTwoLevel
from dune_pdelab_tpu.linalg.amg import AlgebraicMultigrid
from dune_pdelab_tpu.linalg.eigen import lobpcg, EigenResult
