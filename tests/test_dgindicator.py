"""DG jump indicator + slope limiter tests (errorindicatordg.hh and the
explicit-method Limiter hook analogs)."""
import numpy as np
import jax.numpy as jnp
import pytest

from dune_pdelab_tpu import StructuredMesh, FunctionSpace, GridOperator
from dune_pdelab_tpu.fe import QkDGFEM
from dune_pdelab_tpu.ops import ConvectionDiffusionProblem
from dune_pdelab_tpu.ops.convectiondiffusiondg import ConvectionDiffusionDG
from dune_pdelab_tpu.ops.l2 import L2
from dune_pdelab_tpu.adaptivity import dg_jump_indicator, MinmodSlopeLimiter
from dune_pdelab_tpu.instationary import ExplicitOneStepMethod, heun


def test_jump_indicator_detects_discontinuity():
    mesh = StructuredMesh([0, 0], [1, 1], (8, 8))
    V = FunctionSpace(mesh, QkDGFEM(1, 2))
    go = GridOperator(V, ConvectionDiffusionDG(ConvectionDiffusionProblem()))
    # element-wise constant field: 1 left of x=0.5, 0 right -> jump ONLY
    # at the x=0.5 interface (nodal interpolation would be continuous)
    centers = mesh.element_centers()
    u = np.repeat((centers[:, 0] < 0.5).astype(float)[:, None], 4, axis=1)
    x = jnp.asarray(u.reshape(-1))
    eta2 = np.asarray(dg_jump_indicator(go, x))
    adj = np.abs(centers[:, 0] - 0.5) < 0.07   # elements touching x=0.5
    assert eta2[adj].min() > 100 * max(eta2[~adj].max(), 1e-30)


def test_limiter_preserves_linears_and_clips_overshoot():
    mesh = StructuredMesh([0, 0], [1, 1], (8, 8))
    V = FunctionSpace(mesh, QkDGFEM(1, 2))
    lim = MinmodSlopeLimiter(V)
    # globally linear field: slopes agree with neighbor differences -> kept
    xlin = V.interpolate(lambda p: 0.3 * p[:, 0] - 0.1 * p[:, 1])
    xl = lim(xlin)
    # interior elements unchanged (boundary one-sided flattening allowed)
    assert float(jnp.max(jnp.abs(xl - xlin))) < 0.3 / 8 + 1e-12
    # steep in-cell slope next to flat neighbors -> flattened to the mean
    u = np.zeros((mesh.nelements, 4))
    u[27] = [-1.0, 1.0, -1.0, 1.0]   # pure x-slope, neighbors flat zero
    xs = jnp.asarray(u.reshape(-1))
    xs_l = np.asarray(lim(xs)).reshape(-1, 4)
    assert np.allclose(xs_l[27], 0.0, atol=1e-12)


def test_limited_advection_monotone():
    """Square-wave advection (periodic): limited solution stays in [0,1],
    unlimited overshoots."""
    class Adv(ConvectionDiffusionProblem):
        def A(self, x):
            return 0.0

        def b(self, x):
            return jnp.broadcast_to(jnp.array([1.0, 0.0]), x.shape)

    n = 32
    mesh = StructuredMesh([0, 0], [1, 1], (n, n), periodic=(True, True))
    V = FunctionSpace(mesh, QkDGFEM(1, 2))
    go0 = GridOperator(V, ConvectionDiffusionDG(Adv()))
    go1 = GridOperator(V, L2())
    x0 = V.interpolate(lambda p: ((p[:, 0] > 0.25) & (p[:, 0] < 0.5))
                       .astype(float))
    dt = 0.2 / n
    T = 0.25
    osm_free = ExplicitOneStepMethod(heun(), go0, go1)
    _, x_free = osm_free.solve(0.0, dt, T, x0)
    osm_lim = ExplicitOneStepMethod(heun(), go0, go1,
                                    limiter=MinmodSlopeLimiter(V))
    _, x_lim = osm_lim.solve(0.0, dt, T, x0)
    assert float(jnp.min(x_lim)) > -1e-8
    assert float(jnp.max(x_lim)) < 1.0 + 1e-8
    # the square wave actually moved (mass transported, profile advected)
    assert float(jnp.max(x_lim)) > 0.5
    overshoot = max(-float(jnp.min(x_free)), float(jnp.max(x_free)) - 1.0)
    assert overshoot > 1e-3   # unlimited Q1 DG overshoots at the jumps
