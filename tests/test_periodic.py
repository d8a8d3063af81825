"""End-to-end solves on periodic meshes (reference:
dune/pdelab/test/testpoisson-periodic-{2d,3d}.cc and
testheat-instationary-periodic.cc)."""
import numpy as np
import jax.numpy as jnp
import pytest

from dune_pdelab_tpu import (
    StructuredMesh, FunctionSpace, QkFEM, GridOperator, constraints,
    StationaryLinearProblemSolver,
)
from dune_pdelab_tpu.instationary import OneStepMethod, crank_nicolson
from dune_pdelab_tpu.ops import (
    ConvectionDiffusionProblem, ConvectionDiffusionFEM,
)
from dune_pdelab_tpu.ops.l2 import L2
from dune_pdelab_tpu.solvers import SEQ_CG_Jacobi
from dune_pdelab_tpu.space.functions import l2_difference

pytestmark = pytest.mark.fast


class PeriodicPoisson(ConvectionDiffusionProblem):
    """u = sin(2 pi x) sin(pi y): periodic in x, Dirichlet-0 at y=0,1."""

    def exact(self, p):
        return np.sin(2 * np.pi * p[:, 0]) * np.sin(np.pi * p[:, 1])

    def f(self, x):
        return 5 * np.pi**2 * jnp.sin(2 * jnp.pi * x[..., 0]) * jnp.sin(
            jnp.pi * x[..., 1])

    def g(self, x):
        return jnp.zeros(x.shape[:-1])


def test_poisson_periodic_2d_convergence():
    p = PeriodicPoisson()
    errs = []
    for n in (16, 32):
        mesh = StructuredMesh([0, 0], [1, 1], (n, n),
                              periodic=(True, False))
        V = FunctionSpace(mesh, QkFEM(1, 2))
        # Dirichlet only on the non-periodic axis
        cgm = constraints(True, V)
        go = GridOperator(V, ConvectionDiffusionFEM(p), constraints=cgm,
                          skip_boundary=True)
        x = StationaryLinearProblemSolver(
            go, SEQ_CG_Jacobi(maxiter=5000), reduction=1e-12).apply(V.zero())
        errs.append(float(l2_difference(V, x, p.exact)))
    order = np.log2(errs[0] / errs[1])
    assert order > 1.8, (errs, order)


def test_poisson_periodic_3d_solves():
    p = PeriodicPoisson()

    class P3(ConvectionDiffusionProblem):
        def exact(self, q):
            return (np.sin(2 * np.pi * q[:, 0]) * np.sin(2 * np.pi * q[:, 1])
                    * np.sin(np.pi * q[:, 2]))

        def f(self, x):
            return 9 * np.pi**2 * (
                jnp.sin(2 * jnp.pi * x[..., 0])
                * jnp.sin(2 * jnp.pi * x[..., 1])
                * jnp.sin(jnp.pi * x[..., 2]))

        def g(self, x):
            return jnp.zeros(x.shape[:-1])

    p3 = P3()
    mesh = StructuredMesh([0, 0, 0], [1, 1, 1], (12, 12, 12),
                          periodic=(True, True, False))
    V = FunctionSpace(mesh, QkFEM(1, 3))
    cgm = constraints(True, V)
    go = GridOperator(V, ConvectionDiffusionFEM(p3), constraints=cgm,
                      skip_boundary=True)
    x = StationaryLinearProblemSolver(
        go, SEQ_CG_Jacobi(maxiter=5000), reduction=1e-11).apply(V.zero())
    err = float(l2_difference(V, x, p3.exact))
    assert err < 0.06, err


def test_heat_instationary_fully_periodic():
    """Fully periodic heat equation: no constraints at all (the mass matrix
    removes the Poisson nullspace issue); Fourier mode decays at the exact
    rate."""
    DECAY = 8 * np.pi**2

    class Heat(ConvectionDiffusionProblem):
        def f(self, x):
            return jnp.zeros(x.shape[:-1])

    mesh = StructuredMesh([0, 0], [1, 1], (24, 24), periodic=(True, True))
    V = FunctionSpace(mesh, QkFEM(1, 2))
    go_s = GridOperator(V, ConvectionDiffusionFEM(Heat()),
                        skip_boundary=True)
    go_t = GridOperator(V, L2(), skip_boundary=True)
    osm = OneStepMethod(crank_nicolson(), go_s, go_t, SEQ_CG_Jacobi(),
                        pdesolver="linear", reduction=1e-12)

    u0 = lambda p: np.sin(2 * np.pi * np.atleast_2d(p)[:, 0]) * np.sin(
        2 * np.pi * np.atleast_2d(p)[:, 1])
    x = V.interpolate(lambda q: u0(q))
    t, dt, T = 0.0, 5e-4, 0.01
    while t < T - 1e-12:
        x = osm.apply(t, dt, x)
        t += dt
    err = float(l2_difference(
        V, x, lambda p: np.exp(-DECAY * t) * u0(p)))
    assert err < 5e-3, err
    # the decay factor itself is right to ~1%
    ratio = float(jnp.max(jnp.abs(x))) / np.exp(-DECAY * t)
    assert 0.9 < ratio < 1.1, ratio
