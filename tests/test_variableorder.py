"""Variable-order (p-adaptive) DG via modal truncation constraints
(reference: dune/pdelab/finiteelementmap/variableqkdgfem.hh family).
Oracles: uniform-truncation == plain lower-order space; mixed orders give
exactly-zero high modes on low-order elements and an error between the two
uniform-order errors."""
import numpy as np
import jax.numpy as jnp
import pytest

from dune_pdelab_tpu import StructuredMesh, FunctionSpace, GridOperator
from dune_pdelab_tpu.constraints.variableorder import (
    p_adaptive_constraints, variable_order_mask,
)
from dune_pdelab_tpu.fe import LegendreDGFEM, QkDGFEM
from dune_pdelab_tpu.ops import ConvectionDiffusionProblem
from dune_pdelab_tpu.ops.convectiondiffusiondg import (
    ConvectionDiffusionDG, DGMethod,
)
from dune_pdelab_tpu.solvers import (
    SEQ_BCGS_Jacobi, StationaryLinearProblemSolver,
)
from dune_pdelab_tpu.space.functions import l2_difference


class SinCos(ConvectionDiffusionProblem):
    def exact(self, p):
        return np.sin(np.pi * p[:, 0]) * np.cos(2 * np.pi * p[:, 1]) + p[:, 0]

    def f(self, x):
        return 5 * np.pi**2 * jnp.sin(np.pi * x[..., 0]) * jnp.cos(
            2 * np.pi * x[..., 1])

    def g(self, x):
        return jnp.sin(np.pi * x[..., 0]) * jnp.cos(2 * np.pi * x[..., 1]) \
            + x[..., 0]


def _solve(V, p, cg_=None, penalty=2.0, quad_order=None):
    go = GridOperator(V, ConvectionDiffusionDG(p, method=DGMethod.SIPG,
                                               penalty=penalty),
                      constraints=cg_, quad_order=quad_order)
    slp = StationaryLinearProblemSolver(
        go, SEQ_BCGS_Jacobi(maxiter=40000), reduction=1e-11, verbose=0)
    x = slp.apply(V.zero())
    assert slp.result.converged
    return x


@pytest.mark.fast
def test_mask_shape_and_rejects_nodal():
    mesh = StructuredMesh([0, 0], [1, 1], (4, 4))
    V = FunctionSpace(mesh, LegendreDGFEM(2, 2))
    deg = np.full(mesh.nelements, 1)
    mask = variable_order_mask(V, deg)
    # order-1 truncation of a 3x3 tensor basis keeps 4 of 9 modes
    assert mask.sum() == mesh.nelements * 5
    Vn = FunctionSpace(mesh, QkDGFEM(2, 2))
    with pytest.raises(ValueError):
        variable_order_mask(Vn, deg)


def test_uniform_truncation_matches_lower_order_space():
    """degrees == 1 everywhere in a kmax=2 space: same Galerkin solution as
    the plain order-1 Legendre space."""
    p = SinCos()
    mesh = StructuredMesh([0, 0], [1, 1], (12, 12))
    # identical bilinear forms on the shared trial space: match the penalty
    # gamma = penalty*k(k+d-1)*delta/h (2*3 for kmax=2 vs 1*2 for k=1) and
    # the quadrature order
    V2 = FunctionSpace(mesh, LegendreDGFEM(2, 2))
    cg_ = p_adaptive_constraints(V2, np.full(mesh.nelements, 1))
    x_trunc = _solve(V2, p, cg_, penalty=2.0, quad_order=8)

    V1 = FunctionSpace(mesh, LegendreDGFEM(1, 2))
    x1 = _solve(V1, p, penalty=6.0, quad_order=8)
    # identical Galerkin systems -> identical coefficients on shared modes
    mi = V2.fem._mi
    keep = np.nonzero(mi.max(axis=1) <= 1)[0]
    xt = np.asarray(x_trunc)
    xl = np.asarray(x1)
    d = max(np.abs(xt[V2.element_dofs[e][keep]]
                   - xl[V1.element_dofs[e]]).max()
            for e in range(mesh.nelements))
    assert d < 1e-7, d


def test_mixed_orders():
    """k=2 on the left half, k=1 on the right: high modes exactly zero on
    low-order elements; error sits between the uniform-order errors."""
    p = SinCos()
    mesh = StructuredMesh([0, 0], [1, 1], (12, 12))
    V = FunctionSpace(mesh, LegendreDGFEM(2, 2))
    centers = mesh.element_centers()
    deg = np.where(centers[:, 0] < 0.5, 2, 1)
    cg_ = p_adaptive_constraints(V, deg)
    x = _solve(V, p, cg_)
    # truncated modes are exactly zero
    mask = variable_order_mask(V, deg)
    assert float(jnp.max(jnp.abs(jnp.asarray(x)[np.nonzero(mask)[0]]))) == 0.0
    err = float(l2_difference(V, x, p.exact))
    err2 = float(l2_difference(
        V, _solve(V, p), p.exact))                       # uniform k=2
    V1 = FunctionSpace(mesh, LegendreDGFEM(1, 2))
    err1 = float(l2_difference(V1, _solve(V1, p), p.exact))
    assert err2 < err < err1, (err2, err, err1)


@pytest.mark.fast
def test_variable_order_opb_and_monomial():
    """variable_order_mask works on the OPB and monomial hierarchical bases
    too (variableopbfem.hh / variablemonomfem.hh analogs): total-degree
    truncation to k=1 keeps exactly the P1 modes."""
    from dune_pdelab_tpu.fe import OPBFEM, MonomialDGFEM

    mesh = StructuredMesh([0, 0], [1, 1], (4, 4))
    for FEM in (OPBFEM, MonomialDGFEM):
        V = FunctionSpace(mesh, FEM(2, 2))
        degrees = np.full(mesh.nelements, 1)
        mask = variable_order_mask(V, degrees, truncation="total")
        nb = V.fem.nbasis
        kept = nb - int(mask.reshape(mesh.nelements, nb)[0].sum())
        assert kept == 3, (FEM.__name__, kept)   # P1: {1, x, y}
