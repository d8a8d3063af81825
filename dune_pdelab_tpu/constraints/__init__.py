from dune_pdelab_tpu.constraints.dirichlet import (
    DirichletConstraints, constraints, no_constraints, interpolate_dirichlet,
    set_constrained_dofs, set_nonconstrained_dofs,
    copy_constrained_dofs, copy_nonconstrained_dofs,
)
