"""Two-level DG multigrid: CG-subspace coarse correction + block smoothing.

TPU-native analog of the reference's AMG-for-DG backends (reference:
dune/pdelab/backend/istl/seq_amg_dg_backend.hh:146 — DG matrix + assembled
CG subspace prolongation + AMG on the CG space;
cg_to_dg_prolongation.hh:1-146). Here the coarse solve is the structured
GeometricMultigrid on the Q1 CG subspace (re-discretized per level — the
geometric replacement for AMG), the DG smoother is COLORED
symmetric block Gauss-Seidel (checkerboard element colors -> data-parallel
sweeps; plain block-Jacobi leaves smooth JUMP fields — low modes of the
penalty graph invisible to the conforming coarse space — nearly undamped,
measured rho ~ 0.98, whereas colored block-GS gives flat 6-7 CG
iterations across 8..64 meshes), and the CG->DG prolongation is the
static per-element nodal interpolation matrix W[j, c] = prod_d
(xi_j_d or 1 - xi_j_d) applied through the Q1 element corner map.

Usable directly as the `precond` callable of LinearSolverBackend.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from dune_pdelab_tpu.constraints.dirichlet import (
    constraints as make_constraints,
)
from dune_pdelab_tpu.fe.basis import QkFEM
from dune_pdelab_tpu.linalg.multigrid import GeometricMultigrid
from dune_pdelab_tpu.space.space import FunctionSpace


class DGTwoLevel:
    """Two-level preconditioner for (linear, SPD-ish) DG operators.

    go_dg:   the DG GridOperator (single leaf, QkDG on a structured mesh)
    cg_lop:  the CG discretization of the same PDE for the coarse space
             (e.g. ConvectionDiffusionFEM(problem))
    bctype:  Dirichlet bctype for the CG subspace (strong constraints)
    """

    def __init__(self, go_dg, cg_lop, bctype=True, pre_smooth=1,
                 post_smooth=1, gmg_kwargs=None):
        space = go_dg.space
        assert space.is_leaf and space.fem.continuity == "DG"
        mesh = space.mesh
        self.go_dg = go_dg
        self.pre = pre_smooth
        self.post = post_smooth
        dim = mesh.dim

        # CG Q1 subspace + geometric multigrid on it (the AMG slot)
        self.V_cg = FunctionSpace(mesh, QkFEM(1, dim))
        self.cg_cg = make_constraints(bctype, self.V_cg)
        self.gmg = GeometricMultigrid(cg_lop, mesh, QkFEM(1, dim),
                                      bctype=bctype, **(gmg_kwargs or {}))

        # CG -> DG nodal interpolation weights: DG node j at reference
        # position xi_j gets prod_d (xi_d if corner bit else 1 - xi_d)
        nodes = space.fem.nodes                       # (nloc, dim)
        nb = space.fem.nbasis
        C = 2 ** dim
        W = np.ones((nb, C))
        for c in range(C):
            for d in range(dim):
                W[:, c] *= nodes[:, d] if (c >> d) & 1 else 1.0 - nodes[:, d]
        self._W = W
        self._corners = np.asarray(self.V_cg.element_dofs, np.int32)
        self.E = mesh.nelements
        self.nb = nb
        self._apply_jit = None
        self._setup_key = None

    def _prolong(self, xc):
        """CG vector -> DG vector (element-major DG layout)."""
        vals = xc[jnp.asarray(self._corners)]                 # (E, C)
        return jnp.einsum("jc,ec->ej",
                          jnp.asarray(self._W, xc.dtype), vals).reshape(-1)

    def _restrict(self, r_dg):
        """Transpose: DG residual -> CG residual (scatter-add corners)."""
        re = r_dg.reshape(self.E, self.nb)
        rc_e = jnp.einsum("jc,ej->ec", jnp.asarray(self._W, r_dg.dtype), re)
        rc = jnp.zeros(self.V_cg.ndofs, r_dg.dtype).at[
            jnp.asarray(self._corners)].add(rc_e)
        return jnp.where(self.cg_cg.mask, 0.0, rc)

    def setup(self, x_lin=None, time=0.0):
        from dune_pdelab_tpu.linalg.preconditioners import (
            checkerboard_colors,
        )
        go = self.go_dg
        if x_lin is None:
            x_lin = jnp.zeros(go.space.ndofs)
        blocks = go.element_diagonal_blocks(x_lin, time)      # (E, nb, nb)
        lu, piv = jax.scipy.linalg.lu_factor(blocks)
        self.gmg.setup(None, 0.0)
        gmg_apply = self.gmg._apply_jit
        A = lambda z: go.jacobian_apply(x_lin, z, time)
        nb, E = self.nb, self.E
        pre, post = self.pre, self.post
        prolong, restrict = self._prolong, self._restrict
        try:
            colors = tuple(checkerboard_colors(go.space.mesh))
        except Exception:
            colors = None   # fall back to block-Jacobi sweeps

        def smooth(z, r, sweeps):
            for _ in range(sweeps):
                if colors is None:
                    res = r - A(z)
                    d = jax.scipy.linalg.lu_solve(
                        (lu, piv), res.reshape(E, nb)[..., None])[..., 0]
                    z = z + d.reshape(-1)
                else:
                    # symmetric colored block Gauss-Seidel
                    for cidx in list(colors) + list(colors)[::-1]:
                        res = r - A(z)
                        rl = res.reshape(E, nb)[cidx]
                        d = jax.scipy.linalg.lu_solve(
                            (lu[cidx], piv[cidx]), rl[..., None])[..., 0]
                        z = z.reshape(E, nb).at[cidx].add(d).reshape(-1)
            return z

        def apply(r):
            z = smooth(jnp.zeros_like(r), r, pre)
            r2 = r - A(z)
            zc = gmg_apply(restrict(r2))
            z = z + prolong(zc)
            return smooth(z, r, post)

        self._apply_jit = jax.jit(apply)

    # -- LinearSolverBackend precond protocol -----------------------------
    def __call__(self, go, x_lin, time):
        key = (0 if getattr(self.go_dg.lop, "is_linear", False)
               else object())
        if self._apply_jit is None or self._setup_key != key:
            self.setup(x_lin, time)
            self._setup_key = key
        return self._apply_jit

    def apply(self, r):
        if self._apply_jit is None:
            self.setup()
        return self._apply_jit(r)
