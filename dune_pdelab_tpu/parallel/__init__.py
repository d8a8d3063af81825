from dune_pdelab_tpu.parallel.sharded import (
    ShardedGridOperator, ShardedContextMixin,
)
from dune_pdelab_tpu.parallel.windowed import (
    WindowShardedGridOperator, block_partition,
)
from dune_pdelab_tpu.parallel.partition import pad_partition
from dune_pdelab_tpu.parallel.dofsharded import DofShardedStencil, sharded_cg_solve
from dune_pdelab_tpu.parallel.novlp import NonoverlappingShardedGridOperator
from dune_pdelab_tpu.parallel.gmg import ShardedGeometricMultigrid
from dune_pdelab_tpu.parallel.shardedamg import ShardedAMG
from dune_pdelab_tpu.parallel.comm import allreduce, exchange_planes, masked_dot
from dune_pdelab_tpu.parallel.loadbalance import (
    partition_weighted, imbalance, rebalance, redistribute,
)
