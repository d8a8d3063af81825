from dune_pdelab_tpu.space.space import (
    FunctionSpace, CompositeSpace, PowerSpace, VectorSpace, PermutedSpace,
    entity_blocked,
)
