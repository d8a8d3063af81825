"""Variable-order (p-adaptive) DG spaces via modal truncation constraints.

TPU-native analog of the reference's variable-order FiniteElementMaps
(reference: dune/pdelab/finiteelementmap/variableqkdgfem.hh,
variablemonomfem.hh, variableopbfem.hh — per-element basis size chosen at
run time). Per-element ragged basis sizes are hostile to XLA's static
shapes, so the design here inverts the trade: every element carries the
FULL degree-kmax MODAL (Legendre / OPB) basis — one uniform batched
assembly, maximal MXU utilization — and p-adaptivity is a CONSTRAINT: on
an element of order k < kmax, all modes outside the order-k truncation are
constrained to zero. Because the modal bases are hierarchical
(span{modes with max index <= k} == the Qk space; total degree <= k == Pk),
the constrained space is EXACTLY the variable-order DG space; the masked
rows behave like Dirichlet rows everywhere in the framework (residual
zeroing, identity Jacobian rows, solver invariance).

Cost note: low-order elements pay kmax-order assembly flops. On TPU the
uniform batch usually wins over degree-grouped ragged sweeps until the
order spread is large; the flops are in exchange for zero shape
polymorphism and a single compiled executable across any degree layout
(re-tracing-free p-adaptation: changing `degrees` only changes a mask).
"""
from __future__ import annotations

import numpy as np

from dune_pdelab_tpu.constraints.dirichlet import DirichletConstraints


def variable_order_mask(space, degrees, truncation: str = "tensor"):
    """(ndofs,) bool mask of INACTIVE modes for per-element orders.

    space: leaf DG FunctionSpace over a modal hierarchical basis
    (LegendreDGFEM, OPBFEM, MonomialDGFEM). degrees: (E,) ints <= fem
    degree. truncation: 'tensor' keeps modes with max multi-index <= k
    (Qk subspace), 'total' keeps total degree <= k (Pk subspace).
    """
    fem = space.fem
    if getattr(fem, "nodes", 0) is not None:
        raise ValueError("variable order needs a modal (hierarchical) basis "
                         "— LegendreDGFEM / OPBFEM / MonomialDGFEM")
    degrees = np.asarray(degrees, dtype=np.int64)
    E = space.mesh.nelements
    if degrees.shape != (E,):
        raise ValueError(f"degrees must be ({E},)")
    mi = getattr(fem, "_mi", None)
    if mi is None:
        mi = fem._exps
    mi = np.asarray(mi)                                          # (nb, dims)
    if truncation == "tensor":
        mode_order = mi.max(axis=1)
    elif truncation == "total":
        mode_order = mi.sum(axis=1)
    else:
        raise ValueError(truncation)
    inactive = mode_order[None, :] > degrees[:, None]            # (E, nb)
    mask = np.zeros(space.ndofs, dtype=bool)
    mask[space.element_dofs[inactive]] = True
    return mask


def p_adaptive_constraints(space, degrees, bc_constraints=None,
                           truncation: str = "tensor"):
    """DirichletConstraints fixing truncated modes to zero, optionally
    merged with existing boundary constraints (union of masks)."""
    mask = variable_order_mask(space, degrees, truncation)
    if bc_constraints is not None:
        if bc_constraints.has_affine:
            raise NotImplementedError("p-adaptive + hanging nodes")
        mask = mask | bc_constraints.mask_np
    return DirichletConstraints(mask)
