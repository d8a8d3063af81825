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

    Enclosed flows: prefer `stokes_constraints(pin_pressure=False)` with
    this preconditioner — GMRES handles the consistent singular system
    (the hydrostatic mode is never excited), whereas a single pinned
    pressure DOF adds an h-DEPENDENT outlier to the Schur spectrum (a
    point constraint's Green's function is 1/r in 3D vs the mild log in
    2D; measured on 4/8/16^3 Taylor-Hood: 54/88/111 GMRES its pinned vs
    36/58/66 unpinned).

    reference: the Taylor-Hood systems the C++ code solves with assembled
    ISTL preconditioners (dune/pdelab/localoperator/
    taylorhoodnavierstokes.hh:52 + backend/istl/seqistlsolverbackend.hh);
    the velocity-GMG + pressure-mass strategy is the textbook
    Silvester-Wathen block preconditioner re-expressed TPU-natively.
    """

    def __init__(self, space: CompositeSpace, mu: float = 1.0,
                 triangular: bool = True, smoother: str = "chebyshev",
                 mass_cheby: int = 4):
        from dune_pdelab_tpu.assembly.gridoperator import GridOperator
        from dune_pdelab_tpu.ops.convectiondiffusion import (
            ConvectionDiffusionFEM, ConvectionDiffusionProblem,
        )

        self.space = space
        self.mu = mu
        self.triangular = triangular
        self.mass_cheby = mass_cheby
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
                                    smoother=smoother, coarsest_cells=2)
        except (ValueError, NotImplementedError) as e:
            # diagonal fallback below — loud, not silent: iteration counts
            # will grow ~1/h instead of staying bounded
            import warnings
            warnings.warn(
                "StokesGMGSchur: velocity block has no lattice GMG "
                f"hierarchy ({e}); falling back to diagonal Jacobi — "
                "expect mesh-dependent GMRES iteration growth",
                stacklevel=2)

        # pressure mass diagonal (Schur): S^-1 ~ -mu diag(M_p)^-1
        go_mp = GridOperator(Vp, L2())
        self._go_mp = go_mp
        self._xp0 = jnp.zeros(Vp.ndofs)
        self.mp_diag = jnp.asarray(
            np.asarray(go_mp.jacobian_diagonal(self._xp0)))

    def _mass_solve(self, rp):
        """\\hat M_p^{-1} rp. mass_cheby == 0: plain Jacobi diag(M_p)^-1
        (Wathen) — spectrally equivalent but with the D^-1 M_p spread
        [2^-d, (3/2)^d] (tensor-product Q1 bounds), a factor-3 wider
        interval in 3D than 2D. mass_cheby = k > 0: degree-k Chebyshev on
        that interval (a FIXED polynomial in M_p — still a linear operator,
        so plain GMRES is fine), collapsing the Schur spread to the inf-sup
        constant alone. Default 4: error ratio ~0.07 at kappa = 27."""
        d = self.mp_diag
        if self.mass_cheby <= 0:
            return rp / d
        dim = self.dim
        lmax = 1.5 ** dim
        lmin = 0.5 ** dim
        theta = 0.5 * (lmax + lmin)
        delta = 0.5 * (lmax - lmin)
        sigma = theta / delta
        go_mp, xp0 = self._go_mp, self._xp0
        z = jnp.zeros_like(rp)
        res = rp
        dz = (1.0 / theta) * (res / d)
        z = z + dz
        rho = 1.0 / sigma
        for _ in range(self.mass_cheby - 1):
            res = rp - go_mp.jacobian_apply(xp0, z)
            rho_new = 1.0 / (2.0 * sigma - rho)
            dz = (rho_new * rho) * dz + (2.0 * rho_new / delta) * (res / d)
            z = z + dz
            rho = rho_new
        return z

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
            zp = -mu * self._mass_solve(rp)
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


class CahouetChabardSchur(StokesGMGSchur):
    """Schur preconditioner for INSTATIONARY (Navier-)Stokes stages.

    A one-step stage solves the saddle system of
        F = rho*wa*M_v + wb*mu*A_v,   coupling wb*B / wb*B^T
    (OneStepGridOperator weights: wa = a[r,r], wb = dt*b[r,r]). The
    stationary pressure-mass approximation degrades as dt -> 0 (F becomes
    mass-dominated, S -> -wb^2 B M_v^{-1} B^T whose inverse is a pressure
    LAPLACIAN, not a mass). Cahouet-Chabard (1988) combines both limits:

        S^{-1} ~ -[ (mu/wb) diag(M_p)^{-1} + (rho*wa/wb^2) L_p^+ ]

    with L_p the Neumann pressure Laplacian. L_p^+ is applied matrix-free
    by a fixed small number of Jacobi-CG iterations with mean projection
    (the hydrostatic nullspace). The velocity hat-block is a lattice-GMG
    V-cycle of the actual stage operator rho*wa*I_mass + wb*mu*Laplacian —
    a translation-invariant reaction-diffusion operator, rebuilt (and
    cached) per (wa, wb).

    Fixed-iteration CG is weakly nonlinear; with the few inner iterations
    used here plain GMRES tolerates it (classical practice predating
    FGMRES). reference analog: the instationary Taylor-Hood systems of
    dune/pdelab/localoperator/dgnavierstokes.hh:32 +
    navierstokesmass.hh driven through implicitonestep.hh; the reference
    solves them with assembled AMG — the CC split is the matrix-free
    TPU-native replacement.
    """

    def __init__(self, space: CompositeSpace, mu: float = 1.0,
                 rho: float = 1.0, triangular: bool = True,
                 smoother: str = "chebyshev", lp_iters: int = 10):
        super().__init__(space, mu=mu, triangular=triangular,
                         smoother=smoother)
        from dune_pdelab_tpu.assembly.gridoperator import GridOperator
        from dune_pdelab_tpu.ops.convectiondiffusion import (
            ConvectionDiffusionFEM, ConvectionDiffusionProblem,
        )
        self.rho = rho
        self.lp_iters = lp_iters
        self._smoother = smoother
        Vp = space.children[1]

        class _PLap(ConvectionDiffusionProblem):
            def A(self, x):
                return 1.0

        # Neumann pressure Laplacian (no constraints), matrix-free
        self._go_lp = GridOperator(Vp, ConvectionDiffusionFEM(_PLap()),
                                   skip_boundary=True)
        self._xp0 = jnp.zeros(Vp.ndofs)
        self._lp_diag = self._go_lp.jacobian_diagonal(self._xp0)
        self._stage_gmg = {}

    def _vel_gmg(self, wa, wb):
        """Lattice GMG of the stage momentum block rho*wa*M + wb*mu*Lap,
        cached per stage weights."""
        key = (round(wa, 14), round(wb, 14))
        if key not in self._stage_gmg:
            from dune_pdelab_tpu.linalg.gmg_lattice import LatticeGMG
            from dune_pdelab_tpu.ops.convectiondiffusion import (
                ConvectionDiffusionFEM, ConvectionDiffusionProblem,
            )
            mu, rho = self.mu, self.rho

            class _Stage(ConvectionDiffusionProblem):
                def A(self, x):
                    return wb * mu

                def c(self, x):
                    return rho * wa

            Vv = self.space.children[0].child
            try:
                self._stage_gmg[key] = LatticeGMG(
                    Vv, ConvectionDiffusionFEM(_Stage()),
                    smoother=self._smoother, coarsest_cells=2)
            except (ValueError, NotImplementedError):
                self._stage_gmg[key] = None
        return self._stage_gmg[key]

    def _lp_apply(self, rp):
        """L_p^+ rp: mean-projected fixed-iteration Jacobi-CG on the
        Neumann pressure Laplacian."""
        from dune_pdelab_tpu.linalg import krylov
        d = self._lp_diag
        rp0 = rp - jnp.mean(rp)
        z, _ = krylov.cg(
            lambda v: self._go_lp.jacobian_apply(self._xp0, v),
            rp0.astype(d.dtype), M=lambda r: r / d, tol=0.0,
            maxiter=self.lp_iters)
        return (z - jnp.mean(z)).astype(rp.dtype)

    def __call__(self, go, x_lin, time):
        # `time` is the OneStepGridOperator StageContext (wa, wb weights);
        # a plain float means a stationary solve — defer to the parent
        if not hasattr(time, "wb"):
            return super().__call__(go, x_lin, time)
        sc = time
        wa, wb = float(sc.wa), float(sc.wb)
        mask = go.cg.mask if go.cg is not None else None
        vgmg = self._vel_gmg(wa, wb)
        d = None
        if vgmg is None:
            d = go.jacobian_diagonal(x_lin, sc)
        cidx, pidx = self.cidx, self.pidx
        mu, rho, mp = self.mu, self.rho, self.mp_diag
        c_m = mu / wb
        c_l = rho * wa / (wb * wb)

        def M(r):
            rp = r[pidx]
            zp = -(c_m * rp / mp)
            if c_l != 0.0 and self.lp_iters > 0:
                zp = zp - c_l * self._lp_apply(rp)
            if self.triangular:
                zfull = jnp.zeros_like(r).at[pidx].set(zp)
                if mask is not None:
                    zfull = jnp.where(mask, 0.0, zfull)
                coup = go.jacobian_apply(x_lin, zfull, sc)
                rv = [r[ci] - coup[ci] for ci in cidx]
            else:
                rv = [r[ci] for ci in cidx]
            if vgmg is not None:
                zv = [vgmg.apply(rc) for rc in rv]
            else:
                zv = [rc / d[ci] for rc, ci in zip(rv, cidx)]
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
