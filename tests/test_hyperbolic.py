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


def test_maxwell_heterogeneous_transmission():
    """Plane pulse normally incident on an eps-jump interface: reflected /
    transmitted E amplitudes match the analytic Fresnel coefficients
    R = (Z2 - Z1)/(Z2 + Z1), T = 2 Z2/(Z1 + Z2) (the reference's
    heterogeneous eigendecomposed flux, maxwelldg.hh:316 with per-cell
    eps/mu)."""
    eps2 = 4.0
    Z1, Z2 = 1.0, 1.0 / np.sqrt(eps2)
    R = (Z2 - Z1) / (Z2 + Z1)            # -1/3
    T = 2 * Z2 / (Z1 + Z2)               # 2/3
    nx, k = 96, 1
    mesh = StructuredMesh([0, 0, 0], [2, 1, 1], (nx, 2, 2),
                          periodic=(False, True, True))
    leaf = FunctionSpace(mesh, QkDGFEM(k, 3))
    Q = PowerSpace(leaf, 6)

    def eps(x):
        return jnp.where(x[..., 0] < 1.0, 1.0, eps2)

    lop = MaxwellDG(bc="absorb", eps=eps, mu=1.0, cmax=1.0)
    go0 = GridOperator(Q, lop)
    go1 = GridOperator(Q, L2())
    osm = ExplicitOneStepMethod(shu3(), go0, go1)

    def g(x):
        return np.exp(-((x - 0.45) / 0.08) ** 2)

    zero = lambda p: np.zeros(len(p))
    # +x-moving pulse in material 1 (Z1 = 1): E_y = g, H_z = g
    x = Q.interpolate((zero, lambda p: g(p[:, 0]), zero,
                       zero, zero, lambda p: g(p[:, 0])))
    dt = 0.25 / (nx / 2 * (2 * k + 1))
    t, x = osm.solve(0.0, dt, 1.0, x)
    coords = np.asarray(leaf.dof_coords())
    ey = np.abs(np.asarray(Q.restrict(x, 1)))
    refl = float(ey[coords[:, 0] < 0.85].max())
    trans = float(ey[coords[:, 0] > 1.1].max())
    assert abs(refl - abs(R)) < 0.08, (refl, R)
    assert abs(trans - T) < 0.08, (trans, T)
    # transmitted pulse travels at c2 = 1/2: after crossing at t=0.55 its
    # center sits near x = 1 + 0.45/2
    xpk = float(coords[coords[:, 0] > 1.1][np.argmax(
        ey[coords[:, 0] > 1.1]), 0])
    assert abs(xpk - (1.0 + 0.45 / 2)) < 0.12, xpk


def test_acoustics_heterogeneous_speed():
    """Pulse crossing a sound-speed jump (c: 1 -> 2): in the reference's
    symmetrized variables the interface impedance is 1 on both sides, so
    the pulse transmits without spurious reflection and travels at the
    local speed (linearacousticsdg.hh per-cell speed oracle)."""
    nx, k = 96, 1
    mesh = StructuredMesh([0, 0], [2, 1], (nx, 2),
                          periodic=(False, True))
    leaf = FunctionSpace(mesh, QkDGFEM(k, 2))
    Q = PowerSpace(leaf, 3)

    def c(x):
        return jnp.where(x[..., 0] < 1.0, 1.0, 2.0)

    lop = LinearAcousticsDG(c=c, bc="absorb", cmax=2.0)
    go0 = GridOperator(Q, lop)
    go1 = GridOperator(Q, L2())
    osm = ExplicitOneStepMethod(shu3(), go0, go1)

    def g(x):
        return np.exp(-((x - 0.5) / 0.08) ** 2)

    # +x-moving pulse: p = g, u1 = g (unit impedance in these variables)
    x = Q.interpolate((lambda p: g(p[:, 0]), lambda p: g(p[:, 0]),
                       lambda p: np.zeros(len(p))))
    dt = 0.2 / (nx / 2 * (2 * k + 1) * 2.0)
    t, x = osm.solve(0.0, dt, 0.8, x)
    coords = np.asarray(leaf.dof_coords())
    pv = np.abs(np.asarray(Q.restrict(x, 0)))
    # no spurious reflection
    refl = float(pv[coords[:, 0] < 0.85].max())
    assert refl < 0.06, refl
    # transmitted peak at x ~= 1 + (0.8 - 0.5) * 2 = 1.6. Amplitude:
    # interface flux continuity c1 * a = c2 * tau gives tau = c1/c2 = 1/2
    # (the conservative DG flux on the non-conservative symmetrized
    # system; verified against the time-stepped profile)
    sel = coords[:, 0] > 1.1
    xpk = float(coords[sel][np.argmax(pv[sel]), 0])
    assert abs(xpk - 1.6) < 0.12, xpk
    assert abs(pv[sel].max() - 0.5) < 0.05, pv[sel].max()


def test_acoustics_3d_standing_wave():
    """3D reflective box, 1D standing mode along z (exercises the
    dim-generic flux and the z-direction face groups in 3D; reference
    linearacousticsdg.hh is dim-templated the same way)."""
    c = 1.0
    n, k = 8, 1
    mesh = StructuredMesh([0, 0, 0], [1, 1, 1], (n, n, n))
    leaf = FunctionSpace(mesh, QkDGFEM(k, 3))
    Q = PowerSpace(leaf, 4)   # (p, u1, u2, u3)
    go0 = GridOperator(Q, LinearAcousticsDG(c=c, bc="reflect"))
    go1 = GridOperator(Q, L2())
    osm = ExplicitOneStepMethod(shu3(), go0, go1)
    zero = lambda p: np.zeros(len(p))
    x = Q.interpolate((lambda p: np.cos(np.pi * p[:, 2]),
                       zero, zero, zero))
    T = 0.25
    dt = 0.4 / (c * n * (2 * k + 1))
    t, x = osm.solve(0.0, dt, T, x)
    perr = float(l2_difference(
        leaf, Q.restrict(x, 0),
        lambda p: np.cos(np.pi * p[:, 2]) * np.cos(np.pi * c * t)))
    uerr = float(l2_difference(
        leaf, Q.restrict(x, 3),
        lambda p: np.sin(np.pi * p[:, 2]) * np.sin(np.pi * c * t)))
    assert perr < 0.05, perr
    assert uerr < 0.05, uerr
    # transverse velocities stay numerically zero
    for comp in (1, 2):
        assert float(jnp.max(jnp.abs(Q.restrict(x, comp)))) < 1e-10
