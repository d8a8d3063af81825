"""Two-phase CCFV tests (twophaseccfv.hh analog): implicit displacement
scenario with Newton, saturation bounds, monotone front."""
import numpy as np
import jax.numpy as jnp
import pytest

from dune_pdelab_tpu import StructuredMesh, FunctionSpace, GridOperator
from dune_pdelab_tpu.fe import P0FEM
from dune_pdelab_tpu.space.space import PowerSpace
from dune_pdelab_tpu.ops.twophase import (
    TwoPhaseParameters, TwoPhaseCCFV, TwoPhaseStorage,
)
from dune_pdelab_tpu.instationary import OneStepMethod, implicit_euler
from dune_pdelab_tpu.solvers import SEQ_BCGS_Jacobi


class Displacement(TwoPhaseParameters):
    """Wetting phase floods in from x=0; outflow at x=1."""

    def is_dirichlet(self, x):
        return (x[..., 0] < 1e-9) | (x[..., 0] > 1 - 1e-9)

    def g_l(self, x):
        return jnp.where(x[..., 0] < 0.5, 2.0, 0.0)

    def g_g(self, x):
        # inlet: pc ~ -0.5 -> S_l ~ sigmoid(4) ~ 0.98; outlet: pc ~ 1.5 ->
        # S_l ~ sigmoid(-4) ~ 0.02
        return jnp.where(x[..., 0] < 0.5, 2.0 - 0.5, 0.0 + 1.5)


def test_twophase_displacement():
    prm = Displacement(phi=0.2, K=1.0, mu_l=1.0, mu_g=0.2, pc_scale=1.0)
    mesh = StructuredMesh([0, 0], [1, 0.25], (24, 2))
    P0 = FunctionSpace(mesh, P0FEM(2))
    W = PowerSpace(P0, 2)   # (p_l, p_g)
    go0 = GridOperator(W, TwoPhaseCCFV(prm))
    go1 = GridOperator(W, TwoPhaseStorage(prm))
    osm = OneStepMethod(implicit_euler(), go0, go1, SEQ_BCGS_Jacobi(),
                        pdesolver="newton", reduction=1e-7,
                        max_iterations=40, min_linear_reduction=1e-4)
    # initial: gas-filled (S_l = 0 -> pc = pc_scale)
    E = mesh.nelements
    x = jnp.concatenate([jnp.zeros(E), jnp.full(E, 1.5)])  # pc=1.5: S~0.02
    t, dt = 0.0, 2e-3
    for _ in range(8):
        x = osm.apply(t, dt, x)
        t += dt
    pl = np.asarray(W.restrict(x, 0))
    pg = np.asarray(W.restrict(x, 1))
    s_l = 1.0 / (1.0 + np.exp(-4.0 * (0.5 - (pg - pl))))
    assert np.all(s_l >= -1e-8) and np.all(s_l <= 1 + 1e-8)
    centers = mesh.element_centers()
    row = np.isclose(centers[:, 1], centers[0, 1])
    xs = centers[row][:, 0]
    order = np.argsort(xs)
    s_row = s_l[row][order]
    # wetting front: higher saturation at the inlet than at the outlet
    assert s_row[0] > 0.5, s_row
    assert s_row[0] > s_row[-1] + 0.2, s_row
    # monotone-ish front (allow small numerical wiggle)
    assert np.all(np.diff(s_row) < 0.05), s_row


def test_twophase_storage_mass():
    """Storage term equals phi*rho*S*V per cell."""
    prm = TwoPhaseParameters(phi=0.25, pc_scale=2.0)
    mesh = StructuredMesh([0, 0], [1, 1], (4, 4))
    P0 = FunctionSpace(mesh, P0FEM(2))
    W = PowerSpace(P0, 2)
    go1 = GridOperator(W, TwoPhaseStorage(prm))
    E = mesh.nelements
    # pc = pc_scale/2 = 1 -> S_l = sigmoid(0) = 0.5
    x = jnp.concatenate([jnp.zeros(E), jnp.ones(E)])
    m = np.asarray(go1.residual_unconstrained(x))
    vol = 1.0 / 16
    assert np.allclose(m[:E], 0.25 * 1.0 * 0.5 * vol, atol=1e-12)
    assert np.allclose(m[E:], 0.25 * 1.0 * 0.5 * vol, atol=1e-12)
