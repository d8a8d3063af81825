"""Hyperbolic DG tests: acoustics standing wave + Maxwell cavity mode with
explicit RK (testacoustics/testmaxwell analogs, reference:
dune/pdelab/localoperator/{linearacousticsdg,maxwelldg}.hh usage)."""
import numpy as np
import jax.numpy as jnp
import pytest

from dune_pdelab_tpu import StructuredMesh, FunctionSpace, GridOperator
from dune_pdelab_tpu.fe import QkDGFEM
from dune_pdelab_tpu.space.space import PowerSpace
from dune_pdelab_tpu.ops.acoustics import LinearAcousticsDG
from dune_pdelab_tpu.ops.maxwell import MaxwellDG
from dune_pdelab_tpu.ops import L2
from dune_pdelab_tpu.instationary import ExplicitOneStepMethod, heun, shu3
from dune_pdelab_tpu.space.functions import l2_difference


def test_acoustics_standing_wave():
    """1D standing wave in a 2D reflective box:
    p = cos(pi x) cos(pi c t), u1 = sin(pi x) sin(pi c t), u2 = 0."""
    c = 1.0
    n, k = 16, 1
    mesh = StructuredMesh([0, 0], [1, 1], (n, n))
    leaf = FunctionSpace(mesh, QkDGFEM(k, 2))
    Q = PowerSpace(leaf, 3)   # (p, u1, u2)
    lop = LinearAcousticsDG(c=c, bc="reflect")
    go0 = GridOperator(Q, lop)
    go1 = GridOperator(Q, L2())
    osm = ExplicitOneStepMethod(shu3(), go0, go1)
    x = Q.interpolate((lambda p: np.cos(np.pi * p[:, 0]),
                       lambda p: np.zeros(len(p)),
                       lambda p: np.zeros(len(p))))
    T = 0.25
    dt = 0.4 / (c * n * (2 * k + 1))
    t, x = osm.solve(0.0, dt, T, x)
    perr = float(l2_difference(
        leaf, Q.restrict(x, 0),
        lambda p: np.cos(np.pi * p[:, 0]) * np.cos(np.pi * c * t)))
    uerr = float(l2_difference(
        leaf, Q.restrict(x, 1),
        lambda p: np.sin(np.pi * p[:, 0]) * np.sin(np.pi * c * t)))
    assert perr < 0.02, perr
    assert uerr < 0.02, uerr


def test_acoustics_energy_decay_absorbing():
    """Absorbing boundaries: acoustic energy decreases monotonically."""
    mesh = StructuredMesh([0, 0], [1, 1], (8, 8))
    leaf = FunctionSpace(mesh, QkDGFEM(1, 2))
    Q = PowerSpace(leaf, 3)
    go0 = GridOperator(Q, LinearAcousticsDG(bc="absorb"))
    go1 = GridOperator(Q, L2())
    osm = ExplicitOneStepMethod(heun(), go0, go1)
    x = Q.interpolate((
        lambda p: np.exp(-50 * ((p[:, 0] - .5)**2 + (p[:, 1] - .5)**2)),
        lambda p: np.zeros(len(p)), lambda p: np.zeros(len(p))))
    M = go1.jacobian_apply(x, x)
    energies = [float(jnp.vdot(x, M))]
    t, dt = 0.0, 5e-3
    for _ in range(3):
        t, x = osm.solve(t, dt, t + 0.2, x)
        energies.append(float(jnp.vdot(x, go1.jacobian_apply(x, x))))
    assert all(b < a * 1.0001 for a, b in zip(energies, energies[1:])), energies
    assert energies[-1] < 0.5 * energies[0], energies


def test_maxwell_cavity_mode():
    """TM_110 resonant mode in a PEC unit box: E_z = sin(pi x) sin(pi y)
    cos(w t), w = sqrt(2) pi, H as derived from the curl equations."""
    w = np.sqrt(2.0) * np.pi
    a = -1.0 / np.sqrt(2.0)
    n, k = 8, 1
    mesh = StructuredMesh([0, 0, 0], [1, 1, 1], (n, n, 2))
    leaf = FunctionSpace(mesh, QkDGFEM(k, 3))
    Q = PowerSpace(leaf, 6)
    go0 = GridOperator(Q, MaxwellDG(bc="pec"))
    go1 = GridOperator(Q, L2())
    osm = ExplicitOneStepMethod(shu3(), go0, go1)
    zero = lambda p: np.zeros(len(p))
    x = Q.interpolate((
        zero, zero, lambda p: np.sin(np.pi * p[:, 0]) * np.sin(np.pi * p[:, 1]),
        zero, zero, zero))
    T = 0.2
    dt = 0.3 / (n * (2 * k + 1))
    t, x = osm.solve(0.0, dt, T, x)
    ez = float(l2_difference(
        leaf, Q.restrict(x, 2),
        lambda p: np.sin(np.pi * p[:, 0]) * np.sin(np.pi * p[:, 1])
        * np.cos(w * t)))
    hx = float(l2_difference(
        leaf, Q.restrict(x, 3),
        lambda p: a * np.sin(np.pi * p[:, 0]) * np.cos(np.pi * p[:, 1])
        * np.sin(w * t)))
    assert ez < 0.05, ez
    assert hx < 0.05, hx
