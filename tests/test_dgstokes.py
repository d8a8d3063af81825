"""DG Stokes tests (dgnavierstokes.hh analog): manufactured convergence with
Q2dg/Q1dg velocity/pressure, divergence control."""
import numpy as np
import jax.numpy as jnp
import pytest

from dune_pdelab_tpu import StructuredMesh, FunctionSpace, GridOperator, CompositeSpace
from dune_pdelab_tpu.fe import QkDGFEM
from dune_pdelab_tpu.space.space import PowerSpace
from dune_pdelab_tpu.ops.stokes import NavierStokesParameters
from dune_pdelab_tpu.ops.dgnavierstokes import DGNavierStokes
from dune_pdelab_tpu.constraints.dirichlet import DirichletConstraints
from dune_pdelab_tpu.solvers import LinearSolverBackend
from dune_pdelab_tpu.solvers.stationary import StationaryLinearProblemSolver
from dune_pdelab_tpu.space.functions import l2_difference

from tests.test_stokes import _a, _da, _dda, _ddda, u_exact, ManufacturedStokes


def _dg_stokes_space(mesh, kv=2, kp=1):
    Vv = FunctionSpace(mesh, QkDGFEM(kv, 2))
    Vp = FunctionSpace(mesh, QkDGFEM(kp, 2))
    return CompositeSpace(PowerSpace(Vv, 2), Vp)


def _pin_pressure(W):
    import numpy as np
    mask = np.zeros(W.ndofs, dtype=bool)
    mask[int(W.child_global(1, np.array([0]))[0])] = True
    return DirichletConstraints(mask)


def _solve(n, reduction=1e-9):
    mesh = StructuredMesh([0, 0], [1, 1], (n, n))
    W = _dg_stokes_space(mesh)
    prm = ManufacturedStokes()
    go = GridOperator(W, DGNavierStokes(prm), constraints=_pin_pressure(W))
    ls = LinearSolverBackend(solver="gmres", precond="block_jacobi",
                             restart=150, maxiter=40000)
    slp = StationaryLinearProblemSolver(go, ls, reduction=reduction, verbose=0)
    x = slp.apply(W.zero())
    return W, x, slp


def test_dg_stokes_converges():
    errs = []
    for n in (4, 8):
        W, x, slp = _solve(n)
        assert slp.result.converged, slp.result.__dict__
        Vv = W.children[0].children[0]
        e2 = 0.0
        for c in range(2):
            xc = W.children[0].restrict(W.restrict(x, 0), c)
            e2 += float(l2_difference(Vv, xc,
                                      lambda p, c=c: u_exact(p)[:, c])) ** 2
        errs.append(np.sqrt(e2))
    order = np.log2(errs[0] / errs[1])
    assert order > 2.7, (errs, order)


def test_dg_stokes_divergence_small():
    W, x, slp = _solve(8)
    from dune_pdelab_tpu.space.functions import evaluate_at_quadrature
    Vv = W.children[0].children[0]
    div2 = 0.0
    for c in range(2):
        xc = W.children[0].restrict(W.restrict(x, 0), c)
        _, _, gu, factor = evaluate_at_quadrature(Vv, xc)
        div2 = div2 + gu[..., c]
    val = float(jnp.sqrt(jnp.sum(factor * div2**2)))
    assert val < 0.05, val


def test_dg_stokes_tensor_form_converges():
    """Full stress-tensor SIPG (the reference's full_tensor switch): same
    manufactured div-free solution, optimal Q2 velocity order, and the
    symmetric-gradient operator stays adjoint-consistent (order would drop
    to ~2 if the tensor adjoint terms were wrong)."""
    errs = []
    for n in (4, 8):
        mesh = StructuredMesh([0, 0], [1, 1], (n, n))
        W = _dg_stokes_space(mesh)
        go = GridOperator(W, DGNavierStokes(ManufacturedStokes(),
                                            tensor_form=True),
                          constraints=_pin_pressure(W))
        ls = LinearSolverBackend(solver="gmres", precond="block_jacobi",
                                 restart=150, maxiter=40000)
        slp = StationaryLinearProblemSolver(go, ls, reduction=1e-9,
                                            verbose=0)
        x = slp.apply(W.zero())
        assert slp.result.converged, slp.result.__dict__
        Vv = W.children[0].children[0]
        e2 = 0.0
        for c in range(2):
            xc = W.children[0].restrict(W.restrict(x, 0), c)
            e2 += float(l2_difference(Vv, xc,
                                      lambda p, c=c: u_exact(p)[:, c])) ** 2
        errs.append(np.sqrt(e2))
    order = np.log2(errs[0] / errs[1])
    assert order > 2.7, (errs, order)
    # the velocity block of the symmetrized (theta=1) operator must be
    # symmetric: <J z, w> == <z, J w> on velocity-only vectors
    rng = np.random.default_rng(0)
    nv = W.children[0].ndofs
    z = jnp.asarray(np.concatenate([rng.standard_normal(nv),
                                    np.zeros(W.ndofs - nv)]))
    w = jnp.asarray(np.concatenate([rng.standard_normal(nv),
                                    np.zeros(W.ndofs - nv)]))
    a = float(jnp.vdot(w, go.jacobian_apply(W.zero(), z)))
    b = float(jnp.vdot(z, go.jacobian_apply(W.zero(), w)))
    assert abs(a - b) < 1e-9 * max(1.0, abs(a)), (a, b)


def test_dg_stokes_incompressibility_scaling():
    """incomp_scaling multiplies exactly the continuity-equation rows
    (reference: dgnavierstokesparameter.hh:108 incompressibilityScaling,
    applied at dgnavierstokes.hh:129,413,813) and leaves the solution of
    the rescaled system unchanged."""
    mesh = StructuredMesh([0, 0], [1, 1], (4, 4))
    W = _dg_stokes_space(mesh)
    prm = ManufacturedStokes()
    s = 7.5
    go1 = GridOperator(W, DGNavierStokes(prm), constraints=_pin_pressure(W))
    gos = GridOperator(W, DGNavierStokes(prm, incomp_scaling=s),
                       constraints=_pin_pressure(W))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(W.ndofs))
    r1 = np.asarray(go1.residual_unconstrained(x))
    rs = np.asarray(gos.residual_unconstrained(x))
    np_idx = np.zeros(W.ndofs, bool)
    import numpy as _np
    np_idx[_np.asarray(W.child_global(1, _np.arange(
        W.children[1].ndofs)))] = True
    # velocity (momentum) rows identical; pressure (continuity) rows x s
    assert np.allclose(rs[~np_idx], r1[~np_idx], rtol=1e-12, atol=1e-12)
    assert np.allclose(rs[np_idx], s * r1[np_idx], rtol=1e-12, atol=1e-12)
    # the solution is invariant under the row rescaling
    ls = LinearSolverBackend(solver="gmres", precond="block_jacobi",
                             restart=150, maxiter=40000)
    x1 = StationaryLinearProblemSolver(go1, ls, reduction=1e-10,
                                       verbose=0).apply(W.zero())
    ls2 = LinearSolverBackend(solver="gmres", precond="block_jacobi",
                              restart=150, maxiter=40000)
    xs = StationaryLinearProblemSolver(gos, ls2, reduction=1e-10,
                                       verbose=0).apply(W.zero())
    assert float(jnp.linalg.norm(x1 - xs)) < 1e-6 * float(
        jnp.linalg.norm(x1)), float(jnp.linalg.norm(x1 - xs))
