"""RETIRED (round 4): slab-halo nonoverlapping operator -> windowed.

The original module shipped a block-DOF-sharded operator with slab halo
exchange, restricted to uniform meshes with halo <= block (it raised on
anything else). The window-sharded operator (parallel/windowed.py) is
strictly more general — any mesh/space (simplex, adaptive with hanging
nodes, composite), 2D/3D device meshes, O(halo) grouped ppermutes — and
matches it feature-for-feature on the cases novlp could run, so the slab
implementation was deleted (same retirement pattern as parallel/sharded.py
in round 3: one distributed operator, one comm story).

`NonoverlappingShardedGridOperator` remains as a compatibility name; it IS
the windowed operator. reference analog: the nonoverlapping backends
(dune/pdelab/backend/istl/novlpistlsolverbackend.hh:330-1128) whose
owner-computes + border-exchange semantics the windowed operator
implements via ownership-by-renumbering windows.
"""
from dune_pdelab_tpu.parallel.windowed import WindowShardedGridOperator


class NonoverlappingShardedGridOperator(WindowShardedGridOperator):
    """Compatibility alias: the windowed operator under the novlp name."""

    def __init__(self, go, devices=None, axis_name="blk", **kw):
        super().__init__(go, devices=devices, axis_name=axis_name, **kw)
