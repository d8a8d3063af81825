"""Collective / neighborwise communication helpers.

TPU-native analog of the reference's two communication channels (SURVEY.md
section 2.9): dune-grid neighborwise `communicate(DataHandle, ...)` with
Add/Copy/Min/Max policies (reference: dune/pdelab/gridfunctionspace/
genericdatahandle.hh:646-790) and `gridView().comm().sum/min/max`
collectives. Here:

  * collectives are `lax.psum/pmin/pmax` over named mesh axes (usable
    inside shard_map'ed kernels),
  * neighborwise exchange is plane `ppermute` along a 1D slab axis with the
    reduction policy applied at the receiver,
  * owner-masked global dots (the disjointDot analog, reference:
    dune/pdelab/backend/istl/parallelhelper.hh:179) for overlapping layouts.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def allreduce(value, axis_name, op: str = "sum"):
    """comm().sum/min/max analog inside shard_map."""
    if op == "sum":
        return lax.psum(value, axis_name)
    if op == "min":
        return lax.pmin(value, axis_name)
    if op == "max":
        return lax.pmax(value, axis_name)
    raise ValueError(op)


def exchange_planes(local, axis_name, n_devices, policy: str = "copy"):
    """Neighborwise halo exchange along a 1D slab decomposition.

    local: (nloc, ...) slab; returns (recv_prev, recv_next) — the neighbor
    boundary planes (zeros at chain ends). With policy 'add' the caller
    accumulates them into its border planes (AddDataHandle analog); 'copy'
    just delivers them (CopyDataHandle); 'min'/'max' combine with the own
    border plane.
    """
    fwd = [(i, i + 1) for i in range(n_devices - 1)]
    bwd = [(i + 1, i) for i in range(n_devices - 1)]
    recv_prev = lax.ppermute(local[-1:], axis_name, fwd)
    recv_next = lax.ppermute(local[:1], axis_name, bwd)
    if policy in ("copy", "add"):
        return recv_prev, recv_next
    if policy == "min":
        return (jnp.minimum(recv_prev, local[:1]),
                jnp.minimum(recv_next, local[-1:]))
    if policy == "max":
        return (jnp.maximum(recv_prev, local[:1]),
                jnp.maximum(recv_next, local[-1:]))
    raise ValueError(policy)


def masked_dot(a, b, owner_mask, axis_name=None):
    """Owner-unique dot product for overlapping decompositions: each DOF is
    counted by exactly one shard (disjointDot + allreduce analog)."""
    local = jnp.vdot(jnp.where(owner_mask, a, 0.0), b)
    if axis_name is not None:
        local = lax.psum(local, axis_name)
    return local
