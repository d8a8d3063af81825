"""Taylor-Hood space construction + block preconditioning for (Navier-)Stokes.

Reference analogs: the Taylor-Hood TypeTree construction used throughout the
reference tests (Composite(Power<dim>(Q2), Q1)), and pressure-velocity block
solver strategy. The Schur-complement approximation S ~ (1/mu) M_p (pressure
mass) is the classical Stokes result; here both blocks are approximated
diagonally (Jacobi) so the preconditioner is a cheap masked elementwise op.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from dune_pdelab_tpu.constraints.dirichlet import DirichletConstraints, constraints
from dune_pdelab_tpu.fe.basis import QkFEM
from dune_pdelab_tpu.ops.l2 import L2
from dune_pdelab_tpu.space.space import CompositeSpace, FunctionSpace, PowerSpace


def taylor_hood_space(mesh, degree: int = 2):
    """Composite(Power(Q_degree, dim), Q_{degree-1}) Taylor-Hood space."""
    Vv = FunctionSpace(mesh, QkFEM(degree, mesh.dim), name="velocity")
    Vp = FunctionSpace(mesh, QkFEM(degree - 1, mesh.dim), name="pressure")
    return CompositeSpace(PowerSpace(Vv, mesh.dim), Vp, name="taylor-hood")


def velocity_pressure_masks(space: CompositeSpace):
    """Boolean (ndofs,) masks for velocity rows and pressure rows."""
    vmask = np.zeros(space.ndofs, dtype=bool)
    gidx = space.child_global(0, np.arange(space.children[0].ndofs, dtype=np.int64))
    vmask[gidx] = True
    return vmask, ~vmask


def stokes_constraints(space: CompositeSpace, bctype=True,
                       pin_pressure: bool = True) -> DirichletConstraints:
    """Velocity Dirichlet constraints (+ optional single pinned pressure DOF
    to fix the hydrostatic nullspace of enclosed flows)."""
    cg = constraints((bctype, None), space)
    mask = cg.mask_np.copy()
    if pin_pressure:
        p_first = int(space.child_global(1, np.array([0]))[0])
        mask[p_first] = True
    return DirichletConstraints(mask)


class StokesBlockJacobi:
    """Block-diagonal preconditioner callable for LinearSolverBackend:
    velocity rows: Jacobi on diag(J); pressure rows: Jacobi on the scaled
    pressure mass matrix (Schur approximation S ~ (1/mu) M_p)."""

    def __init__(self, space: CompositeSpace, mu: float = 1.0):
        self.space = space
        self.mu = mu
        vmask, pmask = velocity_pressure_masks(space)
        self.vmask = jnp.asarray(vmask)
        # pressure mass diagonal embedded in the full vector
        from dune_pdelab_tpu.assembly.gridoperator import GridOperator
        Vp = space.children[1]
        go_mp = GridOperator(Vp, L2())
        mp_diag = go_mp.jacobian_diagonal(jnp.zeros(Vp.ndofs))
        full = np.ones(space.ndofs)
        gidx = space.child_global(1, np.arange(Vp.ndofs, dtype=np.int64))
        full[gidx] = np.asarray(mp_diag)
        self.mp_diag_full = jnp.asarray(full)

    def __call__(self, go, x_lin, time):
        d = go.jacobian_diagonal(x_lin, time)
        mask = go.cg.mask if go.cg is not None else None
        vm, mp, mu = self.vmask, self.mp_diag_full, self.mu

        def M(r):
            z = jnp.where(vm, r / d, mu * r / mp)
            if mask is not None:
                z = jnp.where(mask, r, z)
            return z

        return M
