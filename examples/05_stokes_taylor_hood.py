"""Tutorial analog: lid-driven-cavity Stokes with Taylor-Hood Q2/Q1
(reference: dune-pdelab-tutorials tutorial07 / taylorhoodnavierstokes.hh;
BASELINE config 5).

Run: python examples/05_stokes_taylor_hood.py
"""
import numpy as np
import jax.numpy as jnp

import dune_pdelab_tpu as pt
from dune_pdelab_tpu.ops.stokes import (
    NavierStokesParameters, TaylorHoodNavierStokes,
)
from dune_pdelab_tpu.solvers import (
    StationaryLinearProblemSolver, LinearSolverBackend,
)
from dune_pdelab_tpu.solvers.stokes import (
    taylor_hood_space, stokes_constraints, StokesBlockJacobi,
)


def main():
    mesh = pt.StructuredMesh([0, 0], [1, 1], (16, 16))
    W = taylor_hood_space(mesh, degree=2)          # Q2 velocity, Q1 pressure
    prm = NavierStokesParameters(mu=1.0, rho=0.0)  # Stokes limit
    cg = stokes_constraints(W, bctype=True, pin_pressure=True)
    go = pt.GridOperator(W, TaylorHoodNavierStokes(prm), constraints=cg)

    # regularized lid: u = (4x(1-x), 0) on y=1 (smooth corners), no-slip
    # elsewhere; pressure pinned at one DOF
    def lid_u(p):
        p = np.atleast_2d(p)
        ux = np.where(np.isclose(p[:, 1], 1.0),
                      4.0 * p[:, 0] * (1.0 - p[:, 0]), 0.0)
        return np.stack([ux, np.zeros_like(ux)], axis=-1)

    x0 = W.interpolate((lid_u, lambda p: np.zeros(len(np.atleast_2d(p)))))
    x0 = jnp.where(cg.mask, x0, 0.0)

    ls = LinearSolverBackend(solver="gmres", precond=StokesBlockJacobi(W),
                             restart=100, maxiter=20000)
    slp = StationaryLinearProblemSolver(go, ls, reduction=1e-7, verbose=1)
    x = slp.apply(x0)

    u = W.restrict(x, 0)
    p = W.restrict(x, 1)
    print(f"ndofs={W.ndofs} (u: {u.shape[0]}, p: {p.shape[0]})")
    print(f"max |u| = {float(jnp.max(jnp.abs(u))):.4f}, "
          f"mean p = {float(jnp.mean(p)):.2e}")


if __name__ == "__main__":
    main()
