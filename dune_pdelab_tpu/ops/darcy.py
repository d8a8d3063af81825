"""Darcy-velocity post-processing and permeability adapters.

TPU-native analog of the reference's Darcy post-processing trio:
  * DarcyVelocityFromHeadFEM (reference:
    dune/pdelab/localoperator/darcyfem.hh:24) — evaluate v = -A grad(u_h)
    of a conforming head solution as a vector-valued grid function;
  * DarcyVelocityFromHeadCCFV (reference:
    dune/pdelab/localoperator/darcyccfv.hh:60) — lowest-order
    Raviart-Thomas reconstruction of the face-normal velocities of a
    cell-centered (P0/TPFA) head solution, exactly reproducing the
    solver's two-point fluxes (so the reconstruction inherits the
    scheme's local conservation);
  * Permeability/DiagonalPermeability adapters (reference:
    dune/pdelab/localoperator/permeability_adapter.hh:11,57) — extract
    log10-permeability fields for visualization.

All three are setup/post-processing utilities: they run host-side numpy
(visualization-grade, like the reference's grid-function adapters), with
the FEM path reusing the batched device tabulations.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from dune_pdelab_tpu.ops.convectiondiffusion import BCType, apply_tensor
from dune_pdelab_tpu.space.functions import evaluate_at_quadrature


# ---------------------------------------------------------------------------
# conforming FEM head -> velocity
# ---------------------------------------------------------------------------

def darcy_velocity_at_quadrature(space, x, problem, quad_order=None):
    """v = -A(x) grad(u_h) at the volume quadrature points of every element.

    Returns (xq (E,nqp,dim), v (E,nqp,dim), factor (E,nqp)); integrating
    |v - v_exact|^2 against `factor` gives the vector L2 error.
    """
    xq, _, gu, factor = evaluate_at_quadrature(space, x, quad_order)
    perm = problem.A if hasattr(problem, "A") else problem.D
    v = -apply_tensor(jnp.asarray(perm(xq)), gu)
    return xq, v, factor


class DarcyVelocityFromHeadFEM:
    """Vector grid function v = -A grad(u_h) (darcyfem.hh:24 analog)."""

    def __init__(self, problem, space, x):
        self.problem = problem
        self.space = space
        self.x = x

    def at_quadrature(self, quad_order=None):
        return darcy_velocity_at_quadrature(self.space, self.x,
                                            self.problem, quad_order)

    def at_centers(self):
        """Velocity at element centers (E, dim) — midpoint rule."""
        _, v, _ = self.at_quadrature(quad_order=1)
        return jnp.mean(v, axis=1)

    def l2_difference(self, exact_vec, quad_order=None):
        """|| v_h - exact ||_L2 for a callable exact_vec(pts)->(...,dim)."""
        xq, v, factor = self.at_quadrature(quad_order)
        flat = np.asarray(xq).reshape(-1, xq.shape[-1])
        ve = jnp.asarray(np.asarray(exact_vec(flat)).reshape(v.shape),
                         v.dtype)
        d = v - ve
        return jnp.sqrt(jnp.sum(factor * jnp.sum(d * d, axis=-1)))


# ---------------------------------------------------------------------------
# cell-centered head -> RT0 face-velocity reconstruction
# ---------------------------------------------------------------------------

def _axis_A(problem, pts, d):
    """Normal diffusivity A_dd at points (scalar A or tensor diagonal)."""
    A = np.asarray(problem.A(jnp.asarray(pts)))
    if A.ndim >= 2 and A.shape[-1] == A.shape[-2] == pts.shape[-1]:
        return A[..., d, d]
    return np.broadcast_to(A, pts.shape[:-1])


class DarcyVelocityFromHeadCCFV:
    """RT0 velocity reconstruction from a TPFA cell-centered head
    (darcyccfv.hh:60 analog).

    Face-normal velocities reproduce the CCFV solver's two-point fluxes
    (`ops/ccfv.py`): interior v_d = -A_face (u_out - u_in)/h_d, Dirichlet
    ghost values at distance h/2, Neumann faces take the prescribed flux.
    Because they ARE the solver's fluxes, `cell_divergence()` of a
    converged solve equals the cell-mean source (local conservation).

    Only the diffusive (Darcy) flux is reconstructed; convective transport
    velocity is the problem's own `b` field.
    """

    def __init__(self, mesh, problem, u):
        if not mesh.uniform or mesh.geometry_type != "cube":
            raise NotImplementedError(
                "CCFV Darcy reconstruction: uniform structured meshes")
        self.mesh = mesh
        self.problem = problem
        self.u = np.asarray(u, dtype=np.float64)
        self._faces = self._reconstruct()

    def _reconstruct(self):
        mesh, p = self.mesh, self.problem
        dim, cells = mesh.dim, mesh.cells
        lat = cells[::-1]                       # (.., ny, nx): x fastest
        U = self.u.reshape(lat)
        lower, h = np.asarray(mesh.lower), np.asarray(mesh.h)
        out = []
        for d in range(dim):
            ax = dim - 1 - d                    # lattice axis for dim d
            shape = list(lat)
            shape[ax] += 1
            V = np.zeros(shape)
            # face-center coordinates: x_d on the face plane, tangential at
            # cell centers
            grids = []
            for dd in range(dim):
                n = cells[dd]
                if dd == d:
                    c = lower[dd] + np.arange(n + 1) * h[dd]
                else:
                    c = lower[dd] + (np.arange(n) + 0.5) * h[dd]
                grids.append(c)
            mg = np.meshgrid(*grids[::-1], indexing="ij")   # lattice order
            pts = np.stack(mg[::-1], axis=-1)               # (..., dim)
            Af = _axis_A(p, pts, d)
            sl_lo = tuple(slice(None) if a != ax else slice(0, 1)
                          for a in range(dim))
            sl_hi = tuple(slice(None) if a != ax else slice(-1, None)
                          for a in range(dim))
            sl_in = tuple(slice(None) if a != ax else slice(1, -1)
                          for a in range(dim))
            # interior: -A (u_next - u_prev)/h
            V[sl_in] = -Af[sl_in] * np.diff(U, axis=ax) / h[d]
            # boundaries: Dirichlet ghost at h/2, Neumann prescribed flux
            for side, sl in ((0, sl_lo), (1, sl_hi)):
                fpts = pts[sl]
                bct = np.broadcast_to(
                    np.asarray(p.bctype(jnp.asarray(fpts))), fpts.shape[:-1])
                g = np.broadcast_to(
                    np.asarray(p.g(jnp.asarray(fpts)), dtype=np.float64),
                    fpts.shape[:-1])
                jf = np.broadcast_to(
                    np.asarray(p.j(jnp.asarray(fpts)), dtype=np.float64),
                    fpts.shape[:-1])
                uc = U[sl_lo] if side == 0 else U[sl_hi]
                if side == 0:      # du/dx_d ~ (u_cell - g)/(h/2)
                    vdir = -Af[sl] * (uc - g) / (h[d] / 2)
                    vneu = -jf     # outward normal is -e_d
                else:              # du/dx_d ~ (g - u_cell)/(h/2)
                    vdir = -Af[sl] * (g - uc) / (h[d] / 2)
                    vneu = jf
                V[sl] = np.where(bct == BCType.DIRICHLET, vdir,
                                 np.where(bct == BCType.NEUMANN, vneu, 0.0))
            out.append(V)
        return out

    def face_normal_velocities(self):
        """Per axis d: array on the face lattice (axis d has cells[d]+1)."""
        return self._faces

    def at_centers(self):
        """RT0 evaluation at element centers: (E, dim) velocities."""
        mesh = self.mesh
        dim = mesh.dim
        cols = []
        for d in range(dim):
            ax = dim - 1 - d
            V = self._faces[d]
            lo = tuple(slice(None) if a != ax else slice(0, -1)
                       for a in range(dim))
            hi = tuple(slice(None) if a != ax else slice(1, None)
                       for a in range(dim))
            cols.append(0.5 * (V[lo] + V[hi]).reshape(-1))
        return np.stack(cols, axis=-1)

    def cell_divergence(self):
        """div(v) per cell from the face fluxes: (E,)."""
        mesh = self.mesh
        dim, h = mesh.dim, np.asarray(mesh.h)
        div = np.zeros(mesh.cells[::-1])
        for d in range(dim):
            ax = dim - 1 - d
            div += np.diff(self._faces[d], axis=ax) / h[d]
        return div.reshape(-1)


# ---------------------------------------------------------------------------
# permeability adapters (permeability_adapter.hh:11,57)
# ---------------------------------------------------------------------------

def permeability_field(mesh, problem):
    """log10 |K_00| at element centers (PermeabilityAdapter analog) — a P0
    field ready for VTK output."""
    pts = jnp.asarray(mesh.element_centers())
    A = np.asarray(problem.A(pts))
    if A.ndim >= 2 and A.shape[-1] == A.shape[-2] == pts.shape[-1]:
        A = A[..., 0, 0]
    return np.log10(np.abs(np.broadcast_to(A, pts.shape[:-1])))


def diagonal_permeability_field(mesh, problem):
    """log10 diag(K) at element centers (DiagonalPermeabilityAdapter
    analog): (E, dim)."""
    pts = jnp.asarray(mesh.element_centers())
    A = np.asarray(problem.A(pts))
    if A.ndim >= 2 and A.shape[-1] == A.shape[-2] == pts.shape[-1]:
        diag = np.stack([A[..., d, d] for d in range(pts.shape[-1])],
                        axis=-1)
    else:
        diag = np.broadcast_to(A[..., None] if A.ndim == pts.ndim - 1
                               else np.asarray(A),
                               pts.shape)
    return np.log10(np.abs(diag))
