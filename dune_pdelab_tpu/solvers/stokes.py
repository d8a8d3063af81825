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


class StokesGMGSchur:
    """Real saddle-point preconditioner: velocity-block geometric multigrid
    + pressure-mass Schur complement, optionally block-triangular.

        [ A  B^T ]   with  Schur S = -B A^{-1} B^T  ~  -(1/mu) M_p
        [ B   0  ]

    Velocity block: in the gradient form mu grad v : grad phi the momentum
    block decouples per velocity component into scalar Laplacians; each
    component gets one LatticeGMG V-cycle (stencil-resident, O(1)-memory
    setup) as \\hat A^{-1}. Pressure block: Jacobi on the pressure mass
    matrix, the classical spectrally-equivalent Schur approximation
    (Wathen): \\hat S^{-1} = -mu diag(M_p)^{-1}.

    triangular=True applies the upper-triangular variant
        z_p = \\hat S^{-1} r_p;   z_v = \\hat A^{-1} (r_v - (J [0; z_p])_v)
    using ONE extra matrix-free jacobian apply per preconditioner call —
    the coupling block B^T is never assembled.

    Falls back to diagonal Jacobi for the velocity block when the mesh
    does not support the lattice hierarchy (odd cell counts, unstructured).

    reference: the Taylor-Hood systems the C++ code solves with assembled
    ISTL preconditioners (dune/pdelab/localoperator/
    taylorhoodnavierstokes.hh:52 + backend/istl/seqistlsolverbackend.hh);
    the velocity-GMG + pressure-mass strategy is the textbook
    Silvester-Wathen block preconditioner re-expressed TPU-natively.
    """

    def __init__(self, space: CompositeSpace, mu: float = 1.0,
                 triangular: bool = True, smoother: str = "chebyshev"):
        from dune_pdelab_tpu.assembly.gridoperator import GridOperator
        from dune_pdelab_tpu.ops.convectiondiffusion import (
            ConvectionDiffusionFEM, ConvectionDiffusionProblem,
        )

        self.space = space
        self.mu = mu
        self.triangular = triangular
        power = space.children[0]
        Vv = power.child                      # scalar velocity component
        Vp = space.children[1]
        self.dim = power.k
        self.nv = Vv.ndofs

        # global index maps: one per velocity component + pressure
        import numpy as _np
        arange_v = _np.arange(Vv.ndofs, dtype=_np.int64)
        self.cidx = [jnp.asarray(space.child_global(
            0, power.child_global(c, arange_v)), jnp.int32)
            for c in range(self.dim)]
        self.pidx = jnp.asarray(space.child_global(
            1, _np.arange(Vp.ndofs, dtype=_np.int64)), jnp.int32)

        # velocity-block GMG on the mu-scaled scalar Laplacian
        class _Lap(ConvectionDiffusionProblem):
            def A(self, x, _mu=mu):
                return _mu

        self._vgmg = None
        try:
            from dune_pdelab_tpu.linalg.gmg_lattice import LatticeGMG
            self._vgmg = LatticeGMG(Vv, ConvectionDiffusionFEM(_Lap()),
                                    smoother=smoother)
        except (ValueError, NotImplementedError):
            pass                              # diagonal fallback below

        # pressure mass diagonal (Schur): S^-1 ~ -mu diag(M_p)^-1
        go_mp = GridOperator(Vp, L2())
        self.mp_diag = jnp.asarray(
            np.asarray(go_mp.jacobian_diagonal(jnp.zeros(Vp.ndofs))))

    def _vel_solve(self, rv_components, d_full=None):
        """Apply \\hat A^{-1} per component ((dim, nv) stacked)."""
        if self._vgmg is not None:
            return [self._vgmg.apply(rc) for rc in rv_components]
        return [rc / d_full[ci] for rc, ci in zip(rv_components, self.cidx)]

    def __call__(self, go, x_lin, time):
        mask = go.cg.mask if go.cg is not None else None
        d = go.jacobian_diagonal(x_lin, time) if self._vgmg is None else None
        cidx, pidx, mu = self.cidx, self.pidx, self.mu
        mp = self.mp_diag

        def M(r):
            rp = r[pidx]
            zp = -mu * rp / mp
            if self.triangular:
                zfull = jnp.zeros_like(r).at[pidx].set(zp)
                if mask is not None:
                    zfull = jnp.where(mask, 0.0, zfull)
                coup = go.jacobian_apply(x_lin, zfull, time)
                rv = [r[ci] - coup[ci] for ci in cidx]
            else:
                rv = [r[ci] for ci in cidx]
            zv = self._vel_solve(rv, d)
            z = jnp.zeros_like(r).at[pidx].set(zp)
            for ci, zc in zip(cidx, zv):
                z = z.at[ci].set(zc)
            if mask is not None:
                z = jnp.where(mask, r, z)
            return z

        return M


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
