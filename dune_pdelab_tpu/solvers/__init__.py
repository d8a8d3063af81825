from dune_pdelab_tpu.solvers.linear import (
    LinearSolverBackend, SEQ_CG_Jacobi, SEQ_CG_BlockJacobi, SEQ_BCGS_Jacobi,
    SEQ_GMRES_Jacobi, MatrixFree_CG_Richardson,
    SEQ_CG_ILU0, SEQ_BCGS_ILU0, SEQ_CG_ILUn, SEQ_BCGS_ILUn,
    SEQ_CG_SSOR, SEQ_BCGS_SSOR, SEQ_CG_AMG, SEQ_BCGS_AMG,
)
from dune_pdelab_tpu.solvers.stationary import (
    StationaryLinearProblemSolver, StationaryResult,
)
from dune_pdelab_tpu.solvers.newton import NewtonMethod, NewtonResult, NewtonError
from dune_pdelab_tpu.solvers.utilities import (
    SolverStatistics, GridOperatorPreconditioner, check_lop_interface,
    dense_jacobian,
)
from dune_pdelab_tpu.solvers.direct import (
    DirectSolverBackend, SparseLU, SEQ_SuperLU, SEQ_UMFPack,
)
from dune_pdelab_tpu.solvers.differentiable import (
    parametric_residual, implicit_solve, opaque_forward,
    differentiable_stationary_solve,
)
