"""dune_pdelab_tpu — a TPU-native PDE discretization framework.

A from-scratch JAX / XLA / Pallas re-design of the capabilities of DUNE PDELab
(reference: dune-mirrors/dune-pdelab): finite-element function spaces over grids,
local operators describing PDE weak forms, a generic batched assembler,
linear / nonlinear solvers, and Runge-Kutta time integrators — built for TPU:

* setup ("ordering" / DOF-map construction) is trace-time numpy producing static
  int32 gather/scatter maps (reference: dune/pdelab/ordering/gridviewordering.hh),
* the element loop becomes one batched kernel over all elements at once
  (reference: dune/pdelab/gridoperator/default/assembler.hh element sweep),
* MPI data handles become pre-computed halo index maps + collectives under
  jax.shard_map (reference: dune/pdelab/gridfunctionspace/genericdatahandle.hh),
* ISTL Krylov solvers become jitted lax.while_loop solvers
  (reference: dune-istl via dune/pdelab/backend/istl/seqistlsolverbackend.hh).

Layer map (mirrors SURVEY.md section 1):
  L0 utils/      clocks, logging, config          (dune/pdelab/common)
  L0 mesh/       structured grids, entity sets     (dune-grid YaspGrid)
  L0 fe/         bases + quadrature                (dune-localfunctions, dune-geometry)
  L2 space/      function spaces + DOF orderings   (dune/pdelab/gridfunctionspace, ordering)
  L3 constraints/ Dirichlet / hanging nodes        (dune/pdelab/constraints)
  L4 ops/        local operators (PDE kernels)     (dune/pdelab/localoperator)
  L5 assembly/   grid operator, batched assembler  (dune/pdelab/gridoperator)
  L6 linalg/     Krylov + preconditioners          (dune/pdelab/backend/istl)
  L7 solvers/    Newton, stationary drivers        (dune/pdelab/solver, stationary)
  L7 instationary/ one-step methods, RK tableaux   (dune/pdelab/instationary)
  dist parallel/ device-mesh domain decomposition  (PDELab MPI backends)
  io/            VTK output, ini configs           (dune/pdelab/gridfunctionspace/vtk.hh)
  models/        ready-made problem drivers        (dune/pdelab/boilerplate)
"""

__version__ = "0.1.0"

from dune_pdelab_tpu.mesh import StructuredMesh
from dune_pdelab_tpu.fe import (
    QkFEM, PkFEM, P0FEM, QkDGFEM, gauss_legendre, quadrature_rule,
)
from dune_pdelab_tpu.space import FunctionSpace, CompositeSpace, PowerSpace, PermutedSpace, entity_blocked
from dune_pdelab_tpu.constraints import (
    DirichletConstraints, constraints, interpolate_dirichlet,
    set_constrained_dofs, set_nonconstrained_dofs, copy_constrained_dofs,
)
from dune_pdelab_tpu.assembly import GridOperator
from dune_pdelab_tpu.solvers import (
    StationaryLinearProblemSolver, NewtonMethod,
)
