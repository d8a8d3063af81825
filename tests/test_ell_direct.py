"""Direct one-sweep lattice-ELL assembly vs the colored-probing build:
tap values must match bit-for-bit (rows AND columns eliminated the same
way), for linear and nonlinear operators, any Qk degree, 2D/3D.

reference analog: one-grid-sweep jacobian assembly
(dune/pdelab/gridoperator/default/jacobianengine.hh) + etadd Dirichlet
elimination (gridoperator/common/assemblerutilities.hh:501)."""
import numpy as np
import jax.numpy as jnp
import pytest

import dune_pdelab_tpu as pt
from dune_pdelab_tpu.ops import (
    ConvectionDiffusionProblem, ConvectionDiffusionFEM,
)
from dune_pdelab_tpu.assembly.ell import (
    assemble_ell_device, assemble_ell_direct,
)


class VarCoeff(ConvectionDiffusionProblem):
    def A(self, x):
        a = 1.0 + 0.5 * jnp.sin(3 * x[..., 0]) * x[..., 1]
        return a[..., None, None] * jnp.eye(x.shape[-1], dtype=x.dtype)

    def b(self, x):
        return jnp.broadcast_to(
            jnp.array([0.3, -0.2, 0.1][: x.shape[-1]], x.dtype), x.shape)

    def c(self, x):
        return 0.7 + x[..., 0]

    def f(self, x):
        return jnp.ones(x.shape[:-1], x.dtype)


def _go(dim, n, k):
    mesh = pt.StructuredMesh([0] * dim, [1] * dim, (n,) * dim)
    V = pt.FunctionSpace(mesh, pt.QkFEM(k, dim))
    return pt.GridOperator(V, ConvectionDiffusionFEM(VarCoeff()),
                           constraints=pt.constraints(True, V),
                           skip_boundary=True), V


@pytest.mark.fast
@pytest.mark.parametrize("dim,n,k", [(2, 12, 1), (2, 8, 2), (3, 6, 1),
                                     (3, 6, 2)])
def test_direct_matches_colored_probing(dim, n, k):
    go, V = _go(dim, n, k)
    e_probe = assemble_ell_device(go)
    e_direct = assemble_ell_direct(go, check=True)
    assert e_direct is not None
    assert float(jnp.max(jnp.abs(e_probe.values - e_direct.values))) < 1e-11


@pytest.mark.fast
def test_direct_nonlinear_linearization_point():
    """Nonlinear operator: the in-jit iota-computed coefficient gather must
    reproduce the probing build at a nonzero linearization point."""
    from dune_pdelab_tpu.ops.nonlinearconvectiondiffusion import (
        NonlinearConvectionDiffusionFEM, NonlinearConvectionDiffusionProblem,
    )

    class NP(NonlinearConvectionDiffusionProblem):
        def f(self, x, u):
            return jnp.ones(x.shape[:-1], x.dtype)

    mesh = pt.StructuredMesh([0, 0], [1, 1], (10, 10))
    V = pt.FunctionSpace(mesh, pt.QkFEM(1, 2))
    lop = NonlinearConvectionDiffusionFEM(NP())
    go = pt.GridOperator(V, lop, constraints=pt.constraints(True, V),
                         skip_boundary=True)
    x_lin = 0.1 * jnp.asarray(
        np.random.default_rng(2).standard_normal(V.ndofs))
    e_probe = assemble_ell_device(go, x_lin=x_lin)
    e_direct = assemble_ell_direct(go, x_lin=x_lin, check=True)
    assert e_direct is not None
    assert float(jnp.max(jnp.abs(e_probe.values - e_direct.values))) < 1e-11


@pytest.mark.fast
def test_direct_declines_out_of_scope():
    """Face jacobian terms / affine constraints must fall back to probing
    (returns None), never silently assemble a wrong matrix."""
    from dune_pdelab_tpu.fe import QkDGFEM
    from dune_pdelab_tpu.ops.convectiondiffusiondg import (
        ConvectionDiffusionDG,
    )
    mesh = pt.StructuredMesh([0, 0], [1, 1], (8, 8))
    Vdg = pt.FunctionSpace(mesh, QkDGFEM(1, 2))
    go_dg = pt.GridOperator(Vdg, ConvectionDiffusionDG(VarCoeff()))
    assert assemble_ell_direct(go_dg) is None

    # boundary-kernel jacobian contributions (outflow) also decline
    class Outflow(VarCoeff):
        def bctype(self, x):
            from dune_pdelab_tpu.ops.convectiondiffusion import BCType
            return jnp.where(x[..., 0] > 1 - 1e-12,
                             BCType.OUTFLOW, BCType.DIRICHLET)

    V = pt.FunctionSpace(mesh, pt.QkFEM(1, 2))
    p = Outflow()
    go_b = pt.GridOperator(V, ConvectionDiffusionFEM(p),
                           constraints=pt.constraints(p.dirichlet_bctype(), V))
    assert assemble_ell_direct(go_b) is None
