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


def test_twophase_wells_discrete_mass_balance():
    """Per-phase wells (q_l/q_g, reference: twophaseccfv.hh:219-230
    protocol, :293-295 source accumulation): on a closed (no-flow) domain
    with a liquid injector in one corner and a gas producer in the other,
    the implicit scheme's summed residual equations force
    d(total phase storage) = dt * integral(q_phase) EXACTLY (fluxes
    telescope) — a discrete mass-balance oracle for the well terms."""
    Q = 0.05
    n = 8
    hx = 1.0 / n

    class Wells(TwoPhaseParameters):
        def is_dirichlet(self, x):
            return jnp.zeros(x.shape[:-1], bool)     # closed domain

        def q_l(self, x):                            # injector at (0, 0)
            return jnp.where((x[..., 0] < hx) & (x[..., 1] < hx), Q, 0.0)

        def q_g(self, x):                            # producer at (1, 1)
            return jnp.where((x[..., 0] > 1 - hx) & (x[..., 1] > 1 - hx),
                             -Q, 0.0)

    prm = Wells(phi=0.2, pc_scale=2.0)
    mesh = StructuredMesh([0, 0], [1, 1], (n, n))
    P0 = FunctionSpace(mesh, P0FEM(2))
    W = PowerSpace(P0, 2)
    go0 = GridOperator(W, TwoPhaseCCFV(prm))
    go1 = GridOperator(W, TwoPhaseStorage(prm))
    osm = OneStepMethod(implicit_euler(), go0, go1, SEQ_BCGS_Jacobi(),
                        pdesolver="newton", reduction=1e-10,
                        max_iterations=40, min_linear_reduction=1e-5)
    E = mesh.nelements
    vol = hx * hx
    x = jnp.concatenate([jnp.zeros(E), jnp.ones(E)])   # pc=1 -> S_l=0.5
    t, dt = 0.0, 0.01

    def masses(xv):
        m = np.asarray(go1.residual_unconstrained(xv))
        return float(m[:E].sum()), float(m[E:].sum())

    ml0, mg0 = masses(x)
    for step in range(3):
        x = osm.apply(t, dt, x)
        t += dt
        ml, mg = masses(x)
        assert ml - ml0 == pytest.approx((step + 1) * dt * Q * vol,
                                         rel=1e-6), (step, ml - ml0)
        assert mg - mg0 == pytest.approx(-(step + 1) * dt * Q * vol,
                                         rel=1e-6), (step, mg - mg0)


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


def test_twophase_gravity_hydrostatic():
    """With gravity on, uniform saturation, and hydrostatic phase pressures
    p_alpha(y) = g_top - rho_alpha g (y - 1), every phase flux potential
    drop vanishes -> the spatial residual is zero (gravity equilibrium).
    This pins the sign/scale of the rho g . (c_o - c_i) head (reference:
    twophaseccfv.hh gravity terms)."""
    g = 9.81
    prm = TwoPhaseParameters(phi=0.2, K=1.0, mu_l=1.0, mu_g=0.5,
                             rho_l=2.0, rho_g=1.0, pc_scale=1.0,
                             gravity=(0.0, -g))
    mesh = StructuredMesh([0, 0], [1, 1], (6, 6))
    P0 = FunctionSpace(mesh, P0FEM(2))
    W = PowerSpace(P0, 2)
    go0 = GridOperator(W, TwoPhaseCCFV(prm))
    c = mesh.element_centers()
    # EACH phase hydrostatic with its own density (the equilibrium state:
    # every phase potential drop vanishes; pc and saturation vary with
    # height, which is exactly the capillary-gravity equilibrium)
    pl = 3.0 + prm.rho_l * g * (1.0 - c[:, 1])
    pg = 3.5 + prm.rho_g * g * (1.0 - c[:, 1])
    x = jnp.concatenate([jnp.asarray(pl), jnp.asarray(pg)])
    r = np.asarray(go0.residual_unconstrained(x))
    assert np.abs(r).max() < 1e-10, np.abs(r).max()
    # breaking hydrostatic balance must produce a nonzero residual
    x2 = jnp.concatenate([jnp.asarray(pl * 0 + 3.0), jnp.asarray(pg)])
    assert np.abs(np.asarray(go0.residual_unconstrained(x2))).max() > 1e-3


def test_twophase_heterogeneous_k_harmonic():
    """Per-cell permeability field: single-phase steady flow through a
    two-layer medium. The effective TPFA transmissibility uses the
    harmonic interface average, so the flux through the layered column
    matches the series-resistance value."""
    K1, K2 = 1.0, 0.2

    class Layered(TwoPhaseParameters):
        def is_dirichlet(self, x):
            return (x[..., 0] < 1e-9) | (x[..., 0] > 1 - 1e-9)

        def g_l(self, x):
            return jnp.where(x[..., 0] < 0.5, 1.0, 0.0)

        def g_g(self, x):
            # keep pc (and hence saturation/mobility) uniform
            return self.g_l(x) + 0.5

    prm = Layered(phi=0.2, mu_l=1.0, mu_g=1.0, pc_scale=1.0,
                  K=lambda x: jnp.where(x[..., 0] < 0.5, K1, K2))
    n = 8
    mesh = StructuredMesh([0, 0], [1, 1.0 / n], (n, 1))
    P0 = FunctionSpace(mesh, P0FEM(2))
    W = PowerSpace(P0, 2)
    go0 = GridOperator(W, TwoPhaseCCFV(prm))
    from dune_pdelab_tpu.solvers import NewtonMethod
    from dune_pdelab_tpu.solvers import SEQ_BCGS_Jacobi
    E = mesh.nelements
    x0 = jnp.concatenate([jnp.full(E, 0.5), jnp.full(E, 1.0)])
    nt = NewtonMethod(go0, SEQ_BCGS_Jacobi(), reduction=1e-12,
                      verbose=0)
    x = nt.apply(x0)
    # steady single-pressure-like profile: piecewise-linear with slope
    # ratio K2:K1 between the layers; check the inlet-cell flux matches
    # the series-harmonic effective permeability
    pl = np.asarray(W.restrict(x, 0))
    c = mesh.element_centers()
    order = np.argsort(c[:, 0])
    p_sorted = pl[order]
    dp1 = p_sorted[1] - p_sorted[0]          # slope in layer 1
    dp2 = p_sorted[-1] - p_sorted[-2]        # slope in layer 2
    assert abs(K1 * dp1 - K2 * dp2) < 1e-8 * abs(K1 * dp1), (dp1, dp2)


def test_twophase_brooks_corey_displacement():
    """Brooks-Corey closure set drives the same displacement scenario:
    saturation stays in [s_lr, 1-s_gr], front is monotone (the reference's
    Buckley-Leverett-type exercise with the standard closure)."""
    from dune_pdelab_tpu.ops.twophase import BrooksCoreyParameters

    class BCDisp(BrooksCoreyParameters):
        def is_dirichlet(self, x):
            return (x[..., 0] < 1e-9) | (x[..., 0] > 1 - 1e-9)

        def g_l(self, x):
            return jnp.where(x[..., 0] < 0.5, 2.0, 0.0)

        def g_g(self, x):
            # inlet pc just above entry pressure (wet); outlet pc large (dry)
            return self.g_l(x) + jnp.where(x[..., 0] < 0.5, 1.05, 3.0)

    prm = BCDisp(pe=1.0, lam=2.0, s_lr=0.05, s_gr=0.05,
                 phi=0.2, K=1.0, mu_l=1.0, mu_g=0.2)
    mesh = StructuredMesh([0, 0], [1, 0.25], (24, 2))
    P0 = FunctionSpace(mesh, P0FEM(2))
    W = PowerSpace(P0, 2)
    go0 = GridOperator(W, TwoPhaseCCFV(prm))
    go1 = GridOperator(W, TwoPhaseStorage(prm))
    osm = OneStepMethod(implicit_euler(), go0, go1, SEQ_BCGS_Jacobi(),
                        pdesolver="newton", reduction=1e-7,
                        max_iterations=40, min_linear_reduction=1e-4)
    E = mesh.nelements
    x = jnp.concatenate([jnp.zeros(E), jnp.full(E, 3.0)])   # dry start
    t, dt = 0.0, 2e-3
    for _ in range(6):
        x = osm.apply(t, dt, x)
        t += dt
    pl = np.asarray(W.restrict(x, 0))
    pg = np.asarray(W.restrict(x, 1))
    s_l = np.asarray(prm.s_l(jnp.asarray(pg - pl)))
    assert np.all(s_l >= prm.s_lr - 1e-8)
    assert np.all(s_l <= 1 - prm.s_gr + 1e-8)
    centers = mesh.element_centers()
    row = np.isclose(centers[:, 1], centers[0, 1])
    xs = centers[row][:, 0]
    order = np.argsort(xs)
    s_row = s_l[row][order]
    assert s_row[0] > s_row[-1] + 0.1, s_row
