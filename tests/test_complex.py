"""Complex-valued problems (reference: dune/pdelab/test/testcomplexnumbers.cc
— complex Helmholtz through the full assembly + Krylov stack). Oracles:
order-2 convergence in complex128, BiCGStab/GMRES agreement, complex
Jacobian probing."""
import numpy as np
import jax.numpy as jnp
import pytest

from dune_pdelab_tpu import (
    StructuredMesh, FunctionSpace, QkFEM, GridOperator, constraints,
    interpolate_dirichlet,
)
from dune_pdelab_tpu.ops.base import LocalOperator
from dune_pdelab_tpu.solvers import LinearSolverBackend
from dune_pdelab_tpu.space.functions import l2_difference, l2_norm

pytestmark = pytest.mark.fast

KAPPA2 = 10.0 + 4.0j          # complex wavenumber (absorbing medium)
AMP = 1.0 + 0.5j


def u_exact(p):
    return (np.sin(np.pi * p[:, 0]) * np.sin(np.pi * p[:, 1]) + p[:, 0]) * AMP


class Helmholtz(LocalOperator):
    """-lap u - kappa^2 u = f with complex kappa^2 and solution."""

    is_linear = True

    def alpha_volume(self, ctx, u):
        tab = ctx.tab
        return (self.accumulate_gradient(tab, ctx.factor,
                                         self.gradient_at_qp(tab, u))
                - self.accumulate_value(tab, ctx.factor,
                                        KAPPA2 * self.value_at_qp(tab, u)))

    def lambda_volume(self, ctx):
        s = jnp.sin(jnp.pi * ctx.x[..., 0]) * jnp.sin(jnp.pi * ctx.x[..., 1])
        ue = (s + ctx.x[..., 0]) * AMP
        f = 2 * jnp.pi**2 * s * AMP - KAPPA2 * ue
        return self.accumulate_value(ctx.tab, ctx.factor, -f)


def _solve(n, solver):
    mesh = StructuredMesh([0, 0], [1, 1], (n, n))
    V = FunctionSpace(mesh, QkFEM(1, 2))
    cgm = constraints(True, V)
    go = GridOperator(V, Helmholtz(), constraints=cgm)
    g = interpolate_dirichlet(u_exact, V, cgm, V.zero()).astype(jnp.complex128)
    r = go.residual(g)
    ls = LinearSolverBackend(solver=solver, precond="jacobi", maxiter=20000,
                             restart=60)
    z, stats = ls.solve(go, g, r, 1e-12)
    return V, g - z, stats


def test_complex_helmholtz_convergence():
    errs = []
    for n in (16, 32):
        V, x, stats = _solve(n, "bicgstab")
        assert bool(stats.converged)
        assert x.dtype == jnp.complex128
        errs.append(float(l2_difference(V, x, u_exact)))
    order = np.log2(errs[0] / errs[1])
    assert order > 1.8, (errs, order)


def test_complex_solvers_agree():
    V, xb, sb = _solve(16, "bicgstab")
    V, xg, sg = _solve(16, "gmres")
    assert int(sb.iterations) > 1 and int(sg.iterations) > 1
    assert float(jnp.max(jnp.abs(xb - xg))) < 1e-8


def test_complex_jacobian_probing():
    """Assembled complex Jacobian: symmetric (not Hermitian) for this
    reaction term, and matches the matrix-free apply."""
    mesh = StructuredMesh([0, 0], [1, 1], (6, 6))
    V = FunctionSpace(mesh, QkFEM(1, 2))
    go = GridOperator(V, Helmholtz())
    x0 = jnp.zeros(V.ndofs, jnp.complex128)
    A = np.asarray(go.jacobian(x0).todense())
    assert A.dtype == np.complex128
    assert np.allclose(A, A.T, atol=1e-12)           # complex symmetric
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.standard_normal(V.ndofs)
                    + 1j * rng.standard_normal(V.ndofs))
    mf = go.jacobian_apply(x0, z)
    assert np.allclose(np.asarray(mf), A @ np.asarray(z), atol=1e-10)


def test_complex_l2_norm_real_valued():
    mesh = StructuredMesh([0, 0], [1, 1], (8, 8))
    V = FunctionSpace(mesh, QkFEM(1, 2))
    x = V.interpolate(lambda q: np.atleast_2d(q)[:, 0]).astype(jnp.complex128)
    x = x * (1.0 + 1.0j)
    nrm = l2_norm(V, x)
    assert nrm.dtype in (jnp.float64, jnp.float32)
    # ||(1+i) x||^2 = 2 ||x||^2; || x_linear ||_L2 on [0,1]^2 = 1/sqrt(3)
    assert abs(float(nrm) - np.sqrt(2.0 / 3.0)) < 1e-10
