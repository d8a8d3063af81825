"""Assembly-layer tests: AD Jacobians vs finite differences, assembled vs
matrix-free agreement (testnumericaljacobianmethods analog, reference:
dune/pdelab/test/testnumericaljacobianmethods.cc — here AD replaces the FD
mixins, so the oracle direction flips: FD checks AD)."""
import numpy as np
import jax.numpy as jnp
import pytest

from dune_pdelab_tpu import (
    StructuredMesh, FunctionSpace, QkFEM, GridOperator, constraints,
)
from dune_pdelab_tpu.ops import (
    ConvectionDiffusionProblem, ConvectionDiffusionFEM, BCType, L2,
    LocalOperator,
)


class FullProblem(ConvectionDiffusionProblem):
    """Nontrivial coefficients exercising every term."""

    def A(self, x):
        return 1.0 + 0.5 * jnp.sin(x[..., 0])

    def b(self, x):
        b = jnp.stack([x[..., 1], -x[..., 0]], axis=-1)
        return b

    def c(self, x):
        return 0.3 + x[..., 0]

    def f(self, x):
        return jnp.exp(-x[..., 0]) * x[..., 1]

    def bctype(self, x):
        # Dirichlet on x=0, Neumann elsewhere, outflow on x=1
        return jnp.where(x[..., 0] < 1e-12, BCType.DIRICHLET,
                         jnp.where(x[..., 0] > 1 - 1e-12, BCType.OUTFLOW,
                                   BCType.NEUMANN))

    def j(self, x):
        return 0.1 * x[..., 0]

    def o(self, x):
        return 0.2


class NonlinearOp(LocalOperator):
    """u -> -Δu + u^3 - f, to exercise nonlinear AD paths."""

    def alpha_volume(self, ctx, u):
        tab = ctx.tab
        gu = self.gradient_at_qp(tab, u)
        uq = self.value_at_qp(tab, u)
        return (self.accumulate_gradient(tab, ctx.factor, gu)
                + self.accumulate_value(tab, ctx.factor, uq**3))

    def lambda_volume(self, ctx):
        f = jnp.sin(ctx.x[..., 0])
        return self.accumulate_value(ctx.tab, ctx.factor, -f)


def _setup(problem, k=1, n=4, with_constraints=True):
    mesh = StructuredMesh([0, 0], [1, 1], (n, n))
    V = FunctionSpace(mesh, QkFEM(k, 2))
    cg = constraints(problem.dirichlet_bctype(), V) if with_constraints else None
    go = GridOperator(V, ConvectionDiffusionFEM(problem), constraints=cg)
    return V, go


def test_jacobian_apply_vs_fd():
    V, go = _setup(FullProblem())
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(V.ndofs))
    z = jnp.asarray(rng.standard_normal(V.ndofs))
    zf = jnp.where(go.cg.mask, 0.0, z)
    eps = 1e-7
    fd = (go.residual(x + eps * zf) - go.residual(x - eps * zf)) / (2 * eps)
    fd = jnp.where(go.cg.mask, z, fd)
    jz = go.jacobian_apply(x, z)
    assert float(jnp.linalg.norm(jz - fd)) < 1e-6 * float(jnp.linalg.norm(jz))


def test_assembled_matches_matrix_free():
    V, go = _setup(FullProblem(), k=2, n=3)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(V.ndofs))
    A = go.jacobian(x)
    for _ in range(3):
        z = jnp.asarray(rng.standard_normal(V.ndofs))
        zf = jnp.where(go.cg.mask, 0.0, z)
        y1 = go.jacobian_apply(x, z)
        y2 = jnp.where(go.cg.mask, z, A @ zf)
        assert np.allclose(np.asarray(y1), np.asarray(y2), atol=1e-11)


def test_jacobian_diagonal_matches_dense():
    V, go = _setup(FullProblem(), n=3)
    x = jnp.zeros(V.ndofs)
    A = np.asarray(go.jacobian(x).todense())
    d = np.asarray(go.jacobian_diagonal(x))
    assert np.allclose(d, np.diag(A), atol=1e-12)


def test_poisson_symmetry():
    V, go = _setup(ConvectionDiffusionProblem(), n=4)
    A = np.asarray(go.jacobian(jnp.zeros(V.ndofs)).todense())
    assert np.allclose(A, A.T, atol=1e-12)


def test_nonlinear_jacobian_depends_on_x():
    mesh = StructuredMesh([0, 0], [1, 1], (4, 4))
    V = FunctionSpace(mesh, QkFEM(1, 2))
    cg = constraints(True, V)
    go = GridOperator(V, NonlinearOp(), constraints=cg)
    rng = np.random.default_rng(2)
    x1 = jnp.asarray(rng.standard_normal(V.ndofs))
    x2 = 2.0 * x1
    z = jnp.asarray(rng.standard_normal(V.ndofs))
    y1 = go.jacobian_apply(x1, z)
    y2 = go.jacobian_apply(x2, z)
    assert float(jnp.linalg.norm(y1 - y2)) > 1e-3
    # FD check at x1
    zf = jnp.where(cg.mask, 0.0, z)
    eps = 1e-6
    fd = (go.residual(x1 + eps * zf) - go.residual(x1 - eps * zf)) / (2 * eps)
    fd = jnp.where(cg.mask, z, fd)
    assert float(jnp.linalg.norm(y1 - fd)) < 1e-7 * max(1.0, float(jnp.linalg.norm(y1)))


def test_mass_matrix_integrates_volume():
    mesh = StructuredMesh([0, 0], [2, 3], (5, 4))
    V = FunctionSpace(mesh, QkFEM(1, 2))
    go = GridOperator(V, L2())
    ones = jnp.ones(V.ndofs)
    # 1^T M 1 = |domain|
    val = float(jnp.vdot(ones, go.jacobian_apply(ones, ones)))
    assert np.isclose(val, 6.0, atol=1e-12)


def test_mapped_mesh_geometry():
    """Multilinear geometry path: assemble on a smoothly perturbed mesh and
    check the mass matrix still integrates the domain volume."""
    n = 8
    base = StructuredMesh([0, 0], [1, 1], (n, n))
    vc = base.vertex_coords().copy()
    interior = ~((np.isclose(vc, 0) | np.isclose(vc, 1)).any(axis=1))
    vc[interior] += 0.02 * np.sin(2 * np.pi * vc[interior][:, ::-1])
    mesh = StructuredMesh([0, 0], [1, 1], (n, n), coords=vc)
    V = FunctionSpace(mesh, QkFEM(1, 2))
    go = GridOperator(V, L2())
    ones = jnp.ones(V.ndofs)
    val = float(jnp.vdot(ones, go.jacobian_apply(ones, ones)))
    assert np.isclose(val, 1.0, atol=1e-12)   # boundary fixed => volume exact


def test_qp_looped_volume_kernel_parity():
    """The qp-looped fusion path (volume_qp_loop=True) is bit-equivalent
    to the batched volume kernel for residual and jacobian_apply."""
    import numpy as np
    import jax.numpy as jnp
    import dune_pdelab_tpu as pt
    from dune_pdelab_tpu.ops import (
        ConvectionDiffusionProblem, ConvectionDiffusionFEM,
    )

    class VC(ConvectionDiffusionProblem):
        def A(self, x):
            a = 1.0 + 0.5 * jnp.sin(3 * x[..., 0]) * x[..., 1]
            return a[..., None, None] * jnp.eye(x.shape[-1], dtype=x.dtype)

        def b(self, x):
            return jnp.broadcast_to(jnp.array([0.3, -0.2], x.dtype), x.shape)

        def c(self, x):
            return 0.7 + x[..., 0]

        def f(self, x):
            return jnp.sin(x[..., 0]) + x[..., 1]

    mesh = pt.StructuredMesh([0, 0], [1, 1], (24, 24))
    for k in (1, 2):
        V = pt.FunctionSpace(mesh, pt.QkFEM(k, 2))
        kw = dict(constraints=pt.constraints(True, V), skip_boundary=True)
        gob = pt.GridOperator(V, ConvectionDiffusionFEM(VC()),
                              volume_qp_loop=False, **kw)
        goq = pt.GridOperator(V, ConvectionDiffusionFEM(VC()),
                              volume_qp_loop=True, **kw)
        x = jnp.asarray(np.random.default_rng(k).standard_normal(V.ndofs))
        z = jnp.asarray(np.random.default_rng(k + 9).standard_normal(V.ndofs))
        assert float(jnp.max(jnp.abs(
            gob.residual(x) - goq.residual(x)))) < 1e-13
        assert float(jnp.max(jnp.abs(
            gob.jacobian_apply(x, z) - goq.jacobian_apply(x, z)))) < 1e-13
