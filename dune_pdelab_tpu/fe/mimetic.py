"""Mimetic finite differences: face-centered element + diffusion operator.

TPU-native analog of the reference's mimetic slot (reference:
dune/pdelab/finiteelementmap/mimeticfem.hh — a FEM over dune-localfunctions'
MimeticLocalFiniteElement with one DOF per cell face; the reference ships no
mimetic local operator or test, so the discretization here follows the
standard lowest-order mimetic / hybrid-finite-volume construction
(Brezzi-Lipnikov-Shashkov consistency + stabilization) specialized to
structured cube meshes).

`MimeticFEM` carries one scalar DOF per face (face-centroid value). Its
`tabulate` is the consistent linear reconstruction

    u_h(x) = u_bar + g(u) . (x - x_c),   g(u) = (1/|E|) sum_f |f| u_f n_f

which is linear in the face values, so the generic assembler machinery
(values/gradients at quadrature points, interpolation, VTK output) works
unchanged. `DiffusionMFD` adds the mimetic stabilization on top of the
consistency term, making the local bilinear form SPD and the scheme exact
for affine solutions (patch test).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from dune_pdelab_tpu.ops.base import LocalOperator, VolumeContext


class MimeticFEM:
    """Face-centered mimetic element on the reference cube [0,1]^d.

    phi_f(x) = 1/(2d) + n_f . (x - 1/2): partition of unity, reproduces
    affine functions from face-centroid values (midpoint quadrature on the
    faces of a cube is exact for affine u)."""

    geometry = "cube"
    continuity = "Mimetic"
    degree = 1
    ndofs_per_face = 1

    def __init__(self, dim: int):
        self.dim = dim
        self.nbasis = 2 * dim
        # face centers of the reference cube, (axis, side) order matching
        # the H(div) face-lattice DOF map (space/space.py _build_hdiv_map)
        nodes = np.full((2 * dim, dim), 0.5)
        for a in range(dim):
            nodes[2 * a, a] = 0.0
            nodes[2 * a + 1, a] = 1.0
        self.nodes = nodes
        self.interpolation_points = nodes
        self.interpolation_matrix = np.eye(2 * dim)
        self._normals = np.zeros((2 * dim, dim))
        for a in range(dim):
            self._normals[2 * a, a] = -1.0
            self._normals[2 * a + 1, a] = 1.0

    def tabulate(self, points):
        points = np.atleast_2d(points)
        dx = points - 0.5                                   # (npts, dim)
        vals = 1.0 / (2 * self.dim) + dx @ self._normals.T  # (npts, nb)
        grads = np.broadcast_to(self._normals.T[None],
                                (len(points), self.dim, self.nbasis))
        return vals, np.ascontiguousarray(np.swapaxes(grads, 1, 2))

    def __repr__(self):
        return f"MimeticFEM(dim={self.dim})"


class DiffusionMFD(LocalOperator):
    """Mimetic diffusion -div(K grad u) = f on cube meshes.

    alpha_volume = consistency (exact-gradient term through the linear
    reconstruction) + stabilization sum_f sigma_f s_f(u) s_f(v) with
    s_f(u) = u_f - u_h(x_f) (the reconstruction defect at the face centroid)
    and sigma_f = K |f| / d_f. Exact for affine u (s_f == 0 there)."""

    is_linear = True
    quadrature_factor = 2

    def __init__(self, problem):
        self.problem = problem
        self._stab = None

    def _stab_data(self, ctx, nb, dim):
        if self._stab is None:
            fem = MimeticFEM(dim)
            phi_fc, _ = fem.tabulate(fem.nodes)      # (nb, nb)
            self._stab = np.eye(nb) - phi_fc         # s = S u (numpy: the
            # cache must stay concrete — a jnp constant created inside one
            # jit trace may not be reused in another)
        return jnp.asarray(self._stab, ctx.factor.dtype)

    def alpha_volume(self, ctx: VolumeContext, u):
        tab = ctx.tab
        dim = ctx.x.shape[-1]
        nb = 2 * dim
        K = jnp.asarray(self.problem.A(ctx.x))
        if K.ndim > ctx.x.ndim - 1:                  # tensor -> trace/d
            K = jnp.einsum("...ii", K) / dim
        Kq = jnp.broadcast_to(K, ctx.x.shape[:-1])   # (E, nqp)
        # consistency: int K grad u_h . grad v_h
        gu = self.gradient_at_qp(tab, u)
        r = self.accumulate_gradient(tab, ctx.factor, Kq[..., None] * gu)
        # stabilization: sigma_f = K |f| / d_f with d_f = h_a / 2;
        # |f| = |E| / h_a  =>  sigma_f = 2 K |E| / h_a^2
        S = self._stab_data(ctx, nb, dim)
        s_u = jnp.einsum("fb,eb->ef", S, u)
        Kc = jnp.mean(Kq, axis=-1)                  # (E,)
        jinv = jnp.asarray(ctx.jac_inv_T)
        if jinv.shape[:2] != (1, 1):                # uniform: (1, 1, d, d)
            raise NotImplementedError("DiffusionMFD: uniform cube meshes only")
        h = 1.0 / jnp.diagonal(jinv[0, 0])          # (dim,) mesh spacings
        sigma = 2.0 * jnp.reshape(ctx.cell_volume, (-1, 1)) / jnp.repeat(
            h * h, 2)[None, :]
        sv = Kc[:, None] * sigma * s_u
        return r + jnp.einsum("fb,ef->eb", S, sv)

    def lambda_volume(self, ctx: VolumeContext):
        f = jnp.asarray(self.problem.f(ctx.x))
        return self.accumulate_value(ctx.tab, ctx.factor, -f)
