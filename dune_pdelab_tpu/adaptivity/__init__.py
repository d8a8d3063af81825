from dune_pdelab_tpu.adaptivity.adaptivity import (
    residual_estimator_convectiondiffusion, error_fraction, element_fraction,
    mark_elements, adapt_uniform,
)
from dune_pdelab_tpu.adaptivity.dgindicator import (
    dg_jump_indicator, MinmodSlopeLimiter,
)
from dune_pdelab_tpu.adaptivity.dwr import dwr_indicators, space_transfer
