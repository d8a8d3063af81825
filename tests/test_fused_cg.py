"""Fused-CG Pallas solver oracle: must match linalg.cg on the compiled
stencil (solution + comparable iteration count), interpret mode on CPU.

Mirrors the reference's matrix-free/assembled iteration-parity oracle
(reference: dune/pdelab/test/matrixfree/matrix_free_linear.cc:4-8).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from dune_pdelab_tpu import (
    StructuredMesh, FunctionSpace, QkFEM, GridOperator, constraints,
)
from dune_pdelab_tpu.ops import (
    ConvectionDiffusionProblem, ConvectionDiffusionFEM,
)
from dune_pdelab_tpu.assembly.stencil import compile_stencil
from dune_pdelab_tpu.assembly.fused_cg_pallas import (
    build_fused_cg_kernels, make_fused_cg, qualifies,
)
from dune_pdelab_tpu.linalg import cg


class P(ConvectionDiffusionProblem):
    def f(self, x):
        return jnp.sin(3.0 * x[..., 0]) * x[..., 1] + 1.0


def _setup(n=11):
    mesh = StructuredMesh([0, 0, 0], [1, 1, 1], (n, n, n))
    V = FunctionSpace(mesh, QkFEM(1, 3))
    cg_ = constraints(P().dirichlet_bctype(), V)
    go = GridOperator(V, ConvectionDiffusionFEM(P()), constraints=cg_)
    st = compile_stencil(go)
    assert st is not None
    return go, st


def test_kernels_match_stencil_operator():
    go, st = _setup()
    nx, ny, nz = st.dims
    k1, k2 = build_fused_cg_kernels(st.dims, st.offsets, st.weights[0],
                                    interpret=True)
    rng = np.random.default_rng(0)
    zf = rng.standard_normal(go.space.ndofs).astype(np.float32)
    m = np.asarray(st.mask).copy()
    zf[m] = 0.0
    z = jnp.asarray(zf)
    y_ref = np.asarray(st(z)).copy()
    y_ref[m] = 0.0
    zg = z.reshape(nz, ny, nx)

    # K2 with x=r=0, alpha=-1 exposes the raw operator: r' = A p
    _, rn, rr = k2(jnp.zeros_like(zg), jnp.zeros_like(zg), zg,
                   jnp.float32(-1.0))
    err = np.abs(np.asarray(rn).reshape(-1) - y_ref).max()
    assert err < 1e-5 * max(1.0, np.abs(y_ref).max())
    assert abs(float(rr) - float(np.dot(y_ref, y_ref))) < 1e-3 * float(
        np.dot(y_ref, y_ref))

    # K1 with beta=0: p' = r, dot <r, Ar>
    pn, pap = k1(zg, zg, jnp.float32(0.0))
    assert np.abs(np.asarray(pn).reshape(-1) - zf).max() == 0.0
    assert abs(float(pap) - float(np.dot(zf, y_ref))) < 1e-3 * abs(
        float(np.dot(zf, y_ref)))


def test_fused_cg_matches_reference_cg():
    go, st = _setup()
    b = go.residual(jnp.zeros(go.space.ndofs))
    z_ref, stats_ref = cg(st, b, tol=1e-8, maxiter=200)
    solve = make_fused_cg(st, maxiter=200, tol=1e-8, interpret=True)
    z_f, stats_f = solve(b)
    rel = float(jnp.linalg.norm(z_f - z_ref)) / float(jnp.linalg.norm(z_ref))
    assert rel < 1e-4, rel
    # fp32 in-kernel dots: iteration counts agree within a couple
    assert abs(int(stats_f.iterations) - int(stats_ref.iterations)) <= 3
    assert bool(stats_f.converged)


def test_qualifies_gates():
    go, st = _setup()
    assert qualifies(st, interpret=True)
    assert not qualifies(st, interpret=False)  # 12 lanes, not 128-aligned
    with pytest.raises(ValueError):
        make_fused_cg(st)  # non-interpret on unaligned grid
