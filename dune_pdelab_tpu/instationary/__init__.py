from dune_pdelab_tpu.instationary.tableaux import (
    TimeSteppingScheme, one_step_theta, implicit_euler, explicit_euler,
    crank_nicolson, heun, shu3, rk4, alexander2, alexander3,
    fractional_step_theta, SCHEMES,
)
from dune_pdelab_tpu.instationary.onestep import (
    OneStepGridOperator, OneStepMethod, ExplicitOneStepMethod, StageContext,
    TimeControllerInterface, CFLTimeController,
)
from dune_pdelab_tpu.instationary.differentiable import (
    differentiable_theta_rollout,
)
