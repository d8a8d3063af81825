from dune_pdelab_tpu.ops.base import (
    LocalOperator, VolumeContext, FaceContext, SkeletonContext, LeafTab,
    CombinedOperator, ScaledOperator,
)
from dune_pdelab_tpu.ops.convectiondiffusion import (
    BCType, ConvectionDiffusionProblem, ConvectionDiffusionFEM, apply_tensor,
)
from dune_pdelab_tpu.ops.l2 import L2, L2VolumeFunctional
from dune_pdelab_tpu.ops.convectiondiffusiondg import ConvectionDiffusionDG, DGMethod
from dune_pdelab_tpu.ops.stokes import (
    NavierStokesParameters, TaylorHoodNavierStokes, NavierStokesMass,
    StokesBC,
)
from dune_pdelab_tpu.ops.elasticity import (
    LinearElasticity, LinearElasticityParameters,
)
from dune_pdelab_tpu.ops.acoustics import LinearAcousticsDG
from dune_pdelab_tpu.ops.maxwell import MaxwellDG
from dune_pdelab_tpu.ops.ccfv import ConvectionDiffusionCCFV
from dune_pdelab_tpu.ops.diffusionmixed import DiffusionMixed
from dune_pdelab_tpu.ops.electrodynamic import CurlCurl, CurlCurlParameters
from dune_pdelab_tpu.ops.twophase import (
    TwoPhaseParameters, TwoPhaseCCFV, TwoPhaseStorage,
    BrooksCoreyParameters, VanGenuchtenParameters, TwoPhaseVelocity,
)
from dune_pdelab_tpu.ops.dgnavierstokes import DGNavierStokes
from dune_pdelab_tpu.ops.darcy import (
    DarcyVelocityFromHeadFEM, DarcyVelocityFromHeadCCFV,
    darcy_velocity_at_quadrature, permeability_field,
    diagonal_permeability_field,
)
from dune_pdelab_tpu.ops.nonlinearconvectiondiffusion import (
    NonlinearConvectionDiffusionProblem, NonlinearConvectionDiffusionFEM,
)
