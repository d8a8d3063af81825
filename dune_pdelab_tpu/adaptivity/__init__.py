from dune_pdelab_tpu.adaptivity.adaptivity import (
    residual_estimator_convectiondiffusion, error_fraction, element_fraction,
    mark_elements, adapt_uniform,
)
