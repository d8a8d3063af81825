from dune_pdelab_tpu.utils.common import (
    default_float, cdiv, round_up, Timer, TimingReport,
)
from dune_pdelab_tpu.utils.config import ParameterTree
from dune_pdelab_tpu.utils.checkpoint import (
    save_checkpoint, load_checkpoint, CheckpointManager,
)
from dune_pdelab_tpu.utils.logging import Logger
