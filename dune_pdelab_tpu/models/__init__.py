from dune_pdelab_tpu.models.boilerplate import (
    StructuredGrid, CGSpace, DGSpace, P0Space, GalerkinGlobalAssembler,
    solve_stationary, linear_solver_from_config,
)
from dune_pdelab_tpu.models.configs import (
    config1_poisson_2d_mf, config2_poisson_3d_gmg, config3_convdiff_sipg,
    config4_heat_theta_newton, config5_stokes_taylor_hood, ALL_CONFIGS,
)
