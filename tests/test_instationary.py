"""Time integration tests (testinstationary / testheat-instationary analogs,
reference: dune/pdelab/test/testinstationary.cc): heat equation with exact
separable solution, temporal convergence orders, explicit RK mass solves,
tableau consistency checks."""
import numpy as np
import jax.numpy as jnp
import pytest

from dune_pdelab_tpu import (
    StructuredMesh, FunctionSpace, QkFEM, GridOperator, constraints,
)
from dune_pdelab_tpu.fe import QkDGFEM
from dune_pdelab_tpu.ops import (
    ConvectionDiffusionProblem, ConvectionDiffusionFEM, L2,
)
from dune_pdelab_tpu.ops.convectiondiffusiondg import ConvectionDiffusionDG
from dune_pdelab_tpu.instationary import (
    OneStepMethod, ExplicitOneStepMethod, SCHEMES,
    implicit_euler, crank_nicolson, alexander2, alexander3, heun, shu3, rk4,
    explicit_euler, fractional_step_theta, one_step_theta,
)
from dune_pdelab_tpu.solvers import SEQ_CG_Jacobi
from dune_pdelab_tpu.space.functions import l2_difference


LAM = 2 * np.pi**2


class HeatProblem(ConvectionDiffusionProblem):
    """du/dt - Laplace(u) = f, u = exp(-t) sin(pi x) sin(pi y),
    f = (LAM - 1) u; homogeneous Dirichlet."""

    def u_exact(self, t):
        return lambda p: np.exp(-t) * np.sin(np.pi * p[:, 0]) * np.sin(
            np.pi * p[:, 1])

    def f(self, x):
        t = self.time
        return (LAM - 1.0) * jnp.exp(-t) * jnp.sin(np.pi * x[..., 0]) * \
            jnp.sin(np.pi * x[..., 1])


def _tableau_consistency(scheme):
    """Row sums of `a` must vanish (consistency: constants are preserved)."""
    assert np.allclose(scheme.a.sum(axis=1), 0.0, atol=1e-12), scheme.name


@pytest.mark.parametrize("name", list(SCHEMES))
def test_tableau_consistency(name):
    _tableau_consistency(SCHEMES[name]())


@pytest.mark.parametrize("name", list(SCHEMES))
def test_tableau_scalar_ode_order(name):
    """Integrate y' = -y (m(y)=y, alpha(y)=y) exactly per the stage
    equations and check the scheme's claimed order against exp(-1)."""
    scheme = SCHEMES[name]()
    errs = []
    for nsteps in (20, 40):
        dt = 1.0 / nsteps
        y = 1.0
        for _ in range(nsteps):
            stage = [y]
            for r in range(1, scheme.stages + 1):
                const = sum(scheme.a[r - 1, i] * stage[i]
                            + dt * scheme.b[r - 1, i] * stage[i]
                            for i in range(r))
                # a_rr y_r + dt b_rr y_r + const = 0
                coeff = scheme.a[r - 1, r] + dt * scheme.b[r - 1, r]
                stage.append(-const / coeff)
            y = stage[-1]
        errs.append(abs(y - np.exp(-1.0)))
    order = np.log2(errs[0] / errs[1])
    assert order > scheme.order - 0.35, (scheme.name, errs, order)


def _heat_setup(n=12, k=1):
    mesh = StructuredMesh([0, 0], [1, 1], (n, n))
    V = FunctionSpace(mesh, QkFEM(k, 2))
    p = HeatProblem()
    cg_ = constraints(p.dirichlet_bctype(), V)
    go0 = GridOperator(V, ConvectionDiffusionFEM(p), constraints=cg_)
    go1 = GridOperator(V, L2(), constraints=cg_)
    return V, p, go0, go1


def test_heat_implicit_euler():
    V, p, go0, go1 = _heat_setup()
    osm = OneStepMethod(implicit_euler(), go0, go1, SEQ_CG_Jacobi(),
                        pdesolver="linear", reduction=1e-12)
    x = V.interpolate(p.u_exact(0.0))
    t, x = osm.solve(0.0, 0.05, 0.5, x)
    err = float(l2_difference(V, x, p.u_exact(0.5)))
    assert err < 0.02, err


@pytest.mark.parametrize("scheme_fn,order,steps", [
    # A-stable (not L-stable) schemes need dt past the stiff transient
    (crank_nicolson, 2, (16, 32)), (fractional_step_theta, 2, (16, 32)),
    (alexander2, 2, (4, 8)), (alexander3, 3, (8, 16)),
])
def test_heat_temporal_order(scheme_fn, order, steps):
    """Temporal order isolated from the spatial error: compare against a
    fine-dt reference of the SAME semidiscrete system, DOF-wise."""
    V, p, go0, go1 = _heat_setup(n=6, k=2)
    x0 = V.interpolate(p.u_exact(0.0))
    osm_ref = OneStepMethod(alexander3(), go0, go1, SEQ_CG_Jacobi(),
                            pdesolver="linear", reduction=1e-13)
    _, xref = osm_ref.solve(0.0, 0.5 / 128, 0.5, x0)
    errs = []
    for nsteps in steps:
        osm = OneStepMethod(scheme_fn(), go0, go1, SEQ_CG_Jacobi(),
                            pdesolver="linear", reduction=1e-13)
        _, x = osm.solve(0.0, 0.5 / nsteps, 0.5, x0)
        errs.append(float(jnp.linalg.norm(x - xref)))
    measured = np.log2(errs[0] / errs[1])
    assert measured > order - 0.5, (errs, measured)


def test_heat_newton_pdesolver():
    """Newton as stage solver on the (linear) heat problem: 1 iteration."""
    V, p, go0, go1 = _heat_setup(n=8)
    osm = OneStepMethod(implicit_euler(), go0, go1, SEQ_CG_Jacobi(),
                        pdesolver="newton", reduction=1e-9)
    x = V.interpolate(p.u_exact(0.0))
    x = osm.apply(0.0, 0.05, x)
    assert osm.pdesolver.result.converged


def test_explicit_heat_dg():
    """Explicit RK heat on a DG space (exact block mass inverse)."""
    mesh = StructuredMesh([0, 0], [1, 1], (8, 8))
    V = FunctionSpace(mesh, QkDGFEM(1, 2))
    p = HeatProblem()
    go0 = GridOperator(V, ConvectionDiffusionDG(p))
    go1 = GridOperator(V, L2())
    osm = ExplicitOneStepMethod(heun(), go0, go1)
    x = V.interpolate(p.u_exact(0.0))
    dt = 2e-4  # under the SIPG diffusion CFL (~2/lambda_max, lambda ~ 1e4)
    t, x = osm.solve(0.0, dt, 0.02, x)
    err = float(l2_difference(V, x, p.u_exact(0.02)))
    assert err < 0.02, err


def test_explicit_rejects_implicit_scheme():
    V, p, go0, go1 = _heat_setup(n=4)
    with pytest.raises(ValueError):
        ExplicitOneStepMethod(implicit_euler(), go0, go1)


@pytest.mark.fast
def test_onestep_time_dependent_dirichlet():
    """BC-reinterpolating OneStepMethod variant (reference:
    implicitonestep.hh:291): time-dependent Dirichlet data is
    re-interpolated each stage. Manufactured u = e^{-t}(1 + x): harmonic in
    space, so f = du/dt = -u; the boundary values decay in time."""
    from dune_pdelab_tpu import (
        StructuredMesh, FunctionSpace, QkFEM, GridOperator, constraints,
    )
    from dune_pdelab_tpu.instationary import OneStepMethod, crank_nicolson
    from dune_pdelab_tpu.ops import (
        ConvectionDiffusionProblem, ConvectionDiffusionFEM,
    )
    from dune_pdelab_tpu.ops.l2 import L2
    from dune_pdelab_tpu.solvers import SEQ_CG_Jacobi
    from dune_pdelab_tpu.space.functions import l2_difference

    class P(ConvectionDiffusionProblem):
        time = 0.0

        def f(self, x):
            return -jnp.exp(-self.time) * (1.0 + x[..., 0])

        def with_time(self, t):
            import copy
            p = copy.copy(self)
            p.time = t
            return p

    mesh = StructuredMesh([0, 0], [1, 1], (12, 12))
    V = FunctionSpace(mesh, QkFEM(1, 2))
    cgm = constraints(True, V)
    go_s = GridOperator(V, ConvectionDiffusionFEM(P()), constraints=cgm)
    go_t = GridOperator(V, L2(), constraints=cgm)

    def bvals(t):
        return V.interpolate(
            lambda p: np.exp(-t) * (1.0 + np.atleast_2d(p)[:, 0]))

    def run(boundary_values):
        osm = OneStepMethod(crank_nicolson(), go_s, go_t, SEQ_CG_Jacobi(),
                            pdesolver="linear", reduction=1e-12,
                            boundary_values=boundary_values)
        x = bvals(0.0)
        t, dt, T = 0.0, 0.025, 0.5
        while t < T - 1e-12:
            x = osm.apply(t, dt, x)
            t += dt
        return float(l2_difference(
            V, x, lambda p: np.exp(-t) * (1.0 + p[:, 0])))

    err_moving = run(bvals)
    err_frozen = run(None)        # BC stuck at t=0 values
    assert err_moving < 1e-4, err_moving
    assert err_frozen > 20 * err_moving, (err_frozen, err_moving)


def test_explicit_mass_inverse_accuracy_high_order():
    """ADVICE r3 (low): the explicit path applies an EXPLICIT block mass
    inverse (one batched matvec) instead of lu_solve. Guard its accuracy
    on stiffer mass blocks: degree-3 DG on a stretched mesh — the block
    inverse applied to M x must reproduce x to near machine precision."""
    import numpy as np
    import jax.numpy as jnp
    mesh = StructuredMesh([0, 0], [1, 0.01], (6, 6))   # 100:1 stretched
    V = FunctionSpace(mesh, QkDGFEM(3, 2))
    go1 = GridOperator(V, L2())
    x0 = jnp.zeros(V.ndofs)
    blocks = go1.element_diagonal_blocks(x0)           # (E, nb, nb)
    import jax
    lu, piv = jax.scipy.linalg.lu_factor(blocks)
    eye = jnp.broadcast_to(jnp.eye(blocks.shape[-1]), blocks.shape)
    Minv = jax.scipy.linalg.lu_solve((lu, piv), eye)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(blocks.shape[:2]))
    mx = jnp.einsum("ejk,ek->ej", blocks, x)
    x_rec = jnp.einsum("ejk,ek->ej", Minv, mx)
    rel = float(jnp.max(jnp.abs(x_rec - x)) / jnp.max(jnp.abs(x)))
    assert rel < 1e-9, rel

    # end-to-end: explicit Heun heat at degree 2 still meets the heat
    # solution within discretization error
    V2 = FunctionSpace(StructuredMesh([0, 0], [1, 1], (8, 8)), QkDGFEM(2, 2))
    p = HeatProblem()
    go0 = GridOperator(V2, ConvectionDiffusionDG(p))
    osm = ExplicitOneStepMethod(heun(), go0, GridOperator(V2, L2()))
    x = V2.interpolate(p.u_exact(0.0))
    t, x = osm.solve(0.0, 5e-5, 5e-3, x)
    err = float(l2_difference(V2, x, p.u_exact(t)))
    assert err < 5e-3, err
