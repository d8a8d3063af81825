"""Two-phase CCFV tests (twophaseccfv.hh analog): implicit displacement
with Newton + failed-step dt control, discrete mass balance for wells and
Neumann boundary fluxes, gravity equilibrium, harmonic interface
permeability, compressible phases, phase-velocity reconstruction, and the
scale_l/scale_g equation scalings.

Scheme note: the kernel follows the reference exactly (upwind the
saturation by the sign of the phase potential gradient, THEN harmonic-
average lambda*K across the face; Dirichlet boundary mobility from the
inside cell — twophaseccfv.hh:300-470). The upwind switch makes the
residual only C^0, so sharp-front displacement runs use
OneStepMethod.solve's failed-step dt-halving (implicitonestep.hh:210
analog) rather than bare apply()."""
import numpy as np
import jax.numpy as jnp
import pytest

from dune_pdelab_tpu import StructuredMesh, FunctionSpace, GridOperator
from dune_pdelab_tpu.fe import P0FEM
from dune_pdelab_tpu.space.space import PowerSpace
from dune_pdelab_tpu.ops.twophase import (
    TwoPhaseParameters, TwoPhaseCCFV, TwoPhaseStorage,
    BrooksCoreyParameters, TwoPhaseVelocity,
)
from dune_pdelab_tpu.instationary import OneStepMethod, implicit_euler
from dune_pdelab_tpu.solvers import SEQ_BCGS_Jacobi


def _phase_split(W, mesh, x):
    pl = np.asarray(W.restrict(x, 0))
    pg = np.asarray(W.restrict(x, 1))
    centers = mesh.element_centers()
    row = np.isclose(centers[:, 1], centers[0, 1])
    order = np.argsort(centers[row][:, 0])
    return pl, pg, row, order


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
    # initial: uniform pc = 0.5 -> S_l = 0.5 (the inside-mobility boundary
    # scheme needs finite kr at the inlet cell, twophaseccfv.hh:446-470)
    E = mesh.nelements
    x = jnp.concatenate([jnp.zeros(E), jnp.full(E, 0.5)])
    t, x = osm.solve(0.0, 1e-3, 0.012, x, max_step_retries=4)
    assert t == pytest.approx(0.012)
    pl, pg, row, order = _phase_split(W, mesh, x)
    s_l = 1.0 / (1.0 + np.exp(-4.0 * (0.5 - (pg - pl))))
    assert np.all(s_l >= -1e-8) and np.all(s_l <= 1 + 1e-8)
    s_row = s_l[row][order]
    # wetting front: wet at the inlet, drained at the outlet, monotone
    assert s_row[0] > 0.9, s_row
    assert s_row[-1] < 0.2, s_row
    assert np.all(np.diff(s_row) < 1e-6), s_row


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


def test_twophase_neumann_flux_mass_balance():
    """Per-phase Neumann boundary fluxes j_l/j_g (reference:
    twophaseccfv.hh:474-503 lambda_boundary, bc codes :196-231): liquid
    pumped in on the left face, gas extracted on the right face; the
    summed phase equations force d(storage) = -t * sum(j * |face|)
    exactly (interior fluxes telescope; identity is dt-independent so it
    survives failed-step dt halving)."""
    J = 0.03
    n = 8

    class Neu(TwoPhaseParameters):
        def j_l(self, x):       # inward (negative = influx) on the left
            return jnp.where(x[..., 0] < 1e-9, -J, 0.0)

        def j_g(self, x):       # outward gas flux on the right
            return jnp.where(x[..., 0] > 1 - 1e-9, J, 0.0)

    prm = Neu(phi=0.2, pc_scale=2.0)
    mesh = StructuredMesh([0, 0], [1, 1], (n, n))
    P0 = FunctionSpace(mesh, P0FEM(2))
    W = PowerSpace(P0, 2)
    go0 = GridOperator(W, TwoPhaseCCFV(prm))
    go1 = GridOperator(W, TwoPhaseStorage(prm))
    osm = OneStepMethod(implicit_euler(), go0, go1, SEQ_BCGS_Jacobi(),
                        pdesolver="newton", reduction=1e-10,
                        max_iterations=40, min_linear_reduction=1e-5)
    E = mesh.nelements
    x = jnp.concatenate([jnp.zeros(E), jnp.ones(E)])

    def masses(xv):
        m = np.asarray(go1.residual_unconstrained(xv))
        return float(m[:E].sum()), float(m[E:].sum())

    ml0, mg0 = masses(x)
    tend = 0.03
    t, x = osm.solve(0.0, 0.01, tend, x, max_step_retries=6)
    assert t == pytest.approx(tend)
    ml, mg = masses(x)
    assert ml - ml0 == pytest.approx(tend * J, rel=1e-6)
    assert mg - mg0 == pytest.approx(-tend * J, rel=1e-6)


def test_twophase_storage_mass():
    """Storage term equals phi*rho*S*V per cell (nu = rho default)."""
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
    This pins the sign/scale of the rho_avg g.n head (reference:
    twophaseccfv.hh:349,376 w terms)."""
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
    harmonic interface average (of lambda*K, reference twophaseccfv.hh
    havg :367), so the flux through the layered column matches the
    series-resistance value."""
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


def test_twophase_compressible_steady_mass_flux():
    """Pressure-dependent liquid density rho_l(p) = 1 + c p (reference
    protocol twophaseccfv.hh:161-173; nu = rho mass-conservative form):
    steady 1D column flow must have CONSTANT phase mass flux across every
    face — verified through TwoPhaseVelocity (V_l analog,
    twophaseccfv.hh:607), whose face velocities reproduce the solver's
    TPFA fluxes; discrete divergence vanishes on the source-free column."""
    from dune_pdelab_tpu.solvers import NewtonMethod
    c = 0.3

    class Comp(TwoPhaseParameters):
        def is_dirichlet(self, x):
            return (x[..., 0] < 1e-9) | (x[..., 0] > 1 - 1e-9)

        def density_l(self, x, p_l):
            return 1.0 + c * p_l

        def g_l(self, x):
            return jnp.where(x[..., 0] < 0.5, 1.0, 0.0)

        def g_g(self, x):
            return self.g_l(x) + 0.5

    prm = Comp(phi=0.2, mu_l=1.0, mu_g=1.0, pc_scale=1.0)
    n = 8
    mesh = StructuredMesh([0, 0], [1, 1.0 / n], (n, 1))
    P0 = FunctionSpace(mesh, P0FEM(2))
    W = PowerSpace(P0, 2)
    go = GridOperator(W, TwoPhaseCCFV(prm))
    E = mesh.nelements
    cx = jnp.asarray(mesh.element_centers()[:, 0])
    pl0 = 1.0 - cx          # ramp initial guess matching the Dirichlet drop
    x0 = jnp.concatenate([pl0, pl0 + 0.5])
    nt = NewtonMethod(go, SEQ_BCGS_Jacobi(), reduction=1e-10, verbose=0,
                      line_search_accept_best=True)
    x = nt.apply(x0)
    for phase in ("liquid", "gas"):
        v = TwoPhaseVelocity(mesh, prm, W, x, phase=phase)
        Vx = v.face_normal_velocities()[0].reshape(-1)
        assert Vx.std() < 1e-6 * abs(Vx.mean()), (phase, Vx)
        assert np.abs(v.cell_divergence()).max() < 1e-6, phase
    # the liquid mass flux must exceed the incompressible-density value
    # (rho > 1 everywhere along the column raises the mass flux)
    vl = TwoPhaseVelocity(mesh, prm, W, x, phase="liquid")
    assert vl.face_normal_velocities()[0].reshape(-1).mean() > 0


def test_twophase_scale_factors():
    """scale_l/scale_g equation scalings (reference twophaseccfv.hh:274
    constructor) multiply the residual rows of their phase linearly, in
    both the flux and the storage operator."""
    prm = TwoPhaseParameters(phi=0.2, pc_scale=1.0)
    n = 4
    mesh = StructuredMesh([0, 0], [1, 1], (n, n))
    P0 = FunctionSpace(mesh, P0FEM(2))
    W = PowerSpace(P0, 2)
    E = mesh.nelements
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0.5, 0.2, 2 * E))
    r1 = np.asarray(GridOperator(W, TwoPhaseCCFV(prm))
                    .residual_unconstrained(x))
    rs = np.asarray(GridOperator(W, TwoPhaseCCFV(prm, scale_l=2.0,
                                                 scale_g=3.0))
                    .residual_unconstrained(x))
    assert np.allclose(rs[:E], 2.0 * r1[:E], rtol=1e-12)
    assert np.allclose(rs[E:], 3.0 * r1[E:], rtol=1e-12)
    m1 = np.asarray(GridOperator(W, TwoPhaseStorage(prm))
                    .residual_unconstrained(x))
    ms = np.asarray(GridOperator(W, TwoPhaseStorage(prm, scale_l=2.0,
                                                    scale_g=3.0))
                    .residual_unconstrained(x))
    assert np.allclose(ms[:E], 2.0 * m1[:E], rtol=1e-12)
    assert np.allclose(ms[E:], 3.0 * m1[E:], rtol=1e-12)


def test_twophase_brooks_corey_displacement():
    """Brooks-Corey closure set drives the same displacement scenario:
    saturation stays in [s_lr, 1-s_gr], wet front at the inlet, drained
    outlet (the reference's Buckley-Leverett-type exercise with the
    standard closure)."""
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
    # moderately wet start: pc = 1.2 -> S_e = (1.2)^-2 = 0.69
    x = jnp.concatenate([jnp.zeros(E), jnp.full(E, 1.2)])
    t, x = osm.solve(0.0, 1e-3, 0.008, x, max_step_retries=6)
    assert t == pytest.approx(0.008)
    pl, pg, row, order = _phase_split(W, mesh, x)
    s_l = np.asarray(prm.s_l(jnp.asarray(pg - pl)))
    assert np.all(s_l >= prm.s_lr - 1e-8)
    assert np.all(s_l <= 1 - prm.s_gr + 1e-8)
    s_row = s_l[row][order]
    assert s_row[0] > 0.75, s_row       # wet inlet
    assert s_row[-1] < 0.5, s_row       # draining outlet
