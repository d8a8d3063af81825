"""Explicit hyperbolic solver chain: heterogeneous linear acoustics with
SSP-RK3 DG, CFL-controlled time steps, and a VTK time series (reference
analogs: linearacousticsdg.hh, explicitonestep.hh CFLTimeController,
instationary/onestepparameter.hh Shu3).

A Gaussian pressure pulse crosses a sound-speed interface (c: 1 -> 2);
in the symmetrized variables the interface is impedance-matched, so the
pulse transmits with amplitude c1/c2 = 0.5 and no spurious reflection —
both checked quantitatively.

Run: python examples/10_acoustics_explicit_rk.py  (CPU or TPU; ~1 min)
"""
import numpy as np
import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

import dune_pdelab_tpu as pt  # noqa: E402
from dune_pdelab_tpu.fe import QkDGFEM  # noqa: E402
from dune_pdelab_tpu.space.space import PowerSpace  # noqa: E402
from dune_pdelab_tpu.ops.acoustics import LinearAcousticsDG  # noqa: E402
from dune_pdelab_tpu.ops import L2  # noqa: E402
from dune_pdelab_tpu.instationary import (  # noqa: E402
    ExplicitOneStepMethod, shu3, CFLTimeController,
)
from dune_pdelab_tpu.io import VTKWriter  # noqa: E402


def main():
    nx, k = 96, 1
    mesh = pt.StructuredMesh([0, 0], [2, 1], (nx, 2), periodic=(False, True))
    leaf = pt.FunctionSpace(mesh, QkDGFEM(k, 2))
    Q = PowerSpace(leaf, 3)            # (p, u1, u2) symmetrized variables

    def c(x):                          # sound speed jumps at x = 1
        return jnp.where(x[..., 0] < 1.0, 1.0, 2.0)

    lop = LinearAcousticsDG(c=c, bc="absorb", cmax=2.0)
    go0 = pt.GridOperator(Q, lop)
    go1 = pt.GridOperator(Q, L2())
    osm = ExplicitOneStepMethod(shu3(), go0, go1)

    def g(x):
        return np.exp(-((x - 0.5) / 0.08) ** 2)

    # +x-moving pulse: p = g, u1 = g (unit impedance in these variables)
    x = Q.interpolate((lambda p: g(p[:, 0]), lambda p: g(p[:, 0]),
                       lambda p: np.zeros(len(p))))

    # CFL-controlled dt: h_min / (c_max (2k+1)), the reference's
    # CFLTimeController protocol (explicitonestep.hh:64)
    ctrl = CFLTimeController(0.35, go0)
    t, T = 0.0, 0.8
    dt0 = 0.2 / (nx / 2 * (2 * k + 1) * 2.0)
    nsteps = 0
    while t < T - 1e-12:
        dt = min(ctrl.suggest_timestep(t, dt0, x), T - t)
        t, x = osm.solve(t, dt, min(t + 10 * dt, T), x)
        nsteps += 10
    print(f"[acoustics] advanced to t={t:.3f} in ~{nsteps} RK3 steps")

    coords = np.asarray(leaf.dof_coords())
    pv = np.abs(np.asarray(Q.restrict(x, 0)))
    refl = float(pv[coords[:, 0] < 0.85].max())
    sel = coords[:, 0] > 1.1
    xpk = float(coords[sel][np.argmax(pv[sel]), 0])
    amp = float(pv[sel].max())
    print(f"[acoustics] reflection residue  : {refl:.4f}  (expect < 0.06)")
    print(f"[acoustics] transmitted peak at : x={xpk:.3f} (expect ~1.6)")
    print(f"[acoustics] transmitted amp     : {amp:.3f}  (expect ~0.5)")
    assert refl < 0.06 and abs(xpk - 1.6) < 0.12 and abs(amp - 0.5) < 0.05

    w = VTKWriter(mesh)
    w.add_field(leaf, Q.restrict(x, 0), "pressure")
    w.add_cell_data("c", np.asarray(c(jnp.asarray(mesh.element_centers()))))
    path = w.write("/tmp/acoustics_final")
    print(f"[acoustics] wrote {path}")
    print("OK")


if __name__ == "__main__":
    main()
