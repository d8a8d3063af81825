"""Krylov solver unit tests against dense numpy references."""
import numpy as np
import jax.numpy as jnp
import pytest

from dune_pdelab_tpu.linalg import (
    cg, bicgstab, minres, restarted_gmres, richardson_loop, preconditioners,
)


def _spd(n, seed=0, cond=100.0):
    rng = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    d = np.logspace(0, np.log10(cond), n)
    return Q @ np.diag(d) @ Q.T


def _solve_and_check(solver, A, b, M=None, tol=1e-12, **kw):
    op = lambda z: jnp.asarray(A) @ z
    Mop = M if M is not None else (lambda r: r)
    x, stats = solver(op, jnp.asarray(b), M=Mop, tol=tol, **kw)
    res = np.linalg.norm(A @ np.asarray(x) - b) / np.linalg.norm(b)
    assert bool(stats.converged), stats
    assert res < 1e-9, res
    return x, stats


def test_cg_spd():
    A = _spd(50)
    b = np.random.default_rng(1).standard_normal(50)
    _solve_and_check(cg, A, b)


def test_cg_jacobi_preconditioned_faster():
    A = _spd(80, cond=1e4)
    A += np.diag(np.linspace(1, 100, 80))  # strongly varying diagonal
    b = np.random.default_rng(2).standard_normal(80)
    _, s_plain = _solve_and_check(cg, A, b, maxiter=10000)
    M = preconditioners.jacobi(jnp.asarray(np.diag(A)))
    _, s_prec = _solve_and_check(cg, A, b, M=M, maxiter=10000)
    assert int(s_prec.iterations) < int(s_plain.iterations)


def test_bicgstab_nonsymmetric():
    rng = np.random.default_rng(3)
    A = np.eye(60) * 6 + 0.5 * rng.standard_normal((60, 60))
    b = rng.standard_normal(60)
    _solve_and_check(bicgstab, A, b)


def test_minres_indefinite():
    rng = np.random.default_rng(4)
    Q, _ = np.linalg.qr(rng.standard_normal((40, 40)))
    d = np.concatenate([np.linspace(1, 10, 30), -np.linspace(1, 5, 10)])
    A = Q @ np.diag(d) @ Q.T
    b = rng.standard_normal(40)
    op = lambda z: jnp.asarray(A) @ z
    x, stats = minres(op, jnp.asarray(b), tol=1e-12, maxiter=500)
    res = np.linalg.norm(A @ np.asarray(x) - b) / np.linalg.norm(b)
    assert res < 1e-8


def test_gmres_nonsymmetric():
    rng = np.random.default_rng(5)
    A = np.eye(70) * 4 + 0.4 * rng.standard_normal((70, 70))
    b = rng.standard_normal(70)
    op = lambda z: jnp.asarray(A) @ z
    x, stats = restarted_gmres(op, jnp.asarray(b), tol=1e-12, restart=25,
                               maxiter=2000)
    res = np.linalg.norm(A @ np.asarray(x) - b) / np.linalg.norm(b)
    assert res < 1e-8, res


def test_gmres_full_krylov_exact():
    """Full (unrestarted) GMRES solves any nonsingular n x n system in at
    most n iterations."""
    rng = np.random.default_rng(15)
    A = np.eye(40) * 2 + 0.8 * rng.standard_normal((40, 40))
    b = rng.standard_normal(40)
    op = lambda z: jnp.asarray(A) @ z
    x, stats = restarted_gmres(op, jnp.asarray(b), tol=1e-12, restart=45,
                               maxiter=200)
    res = np.linalg.norm(A @ np.asarray(x) - b) / np.linalg.norm(b)
    assert res < 1e-9
    assert int(stats.iterations) <= 41


def test_richardson_loop():
    A = np.eye(30) + 0.05 * np.random.default_rng(6).standard_normal((30, 30))
    b = np.random.default_rng(7).standard_normal(30)
    _solve_and_check(richardson_loop, A, b, maxiter=2000)


def test_chebyshev_preconditioner():
    A = _spd(60, seed=8, cond=500.0)
    b = np.random.default_rng(9).standard_normal(60)
    op = lambda z: jnp.asarray(A) @ z
    diag = jnp.asarray(np.diag(A))
    lmax = preconditioners.power_iteration(op, diag, 60, dtype=jnp.float64)
    M = preconditioners.chebyshev(op, diag, lmax, degree=6)
    _, s_prec = _solve_and_check(cg, A, b, M=M, maxiter=5000)
    _, s_plain = _solve_and_check(cg, A, b, maxiter=5000)
    assert int(s_prec.iterations) < int(s_plain.iterations)


def test_solver_stats_fields():
    A = _spd(20)
    b = np.ones(20)
    x, stats = cg(lambda z: jnp.asarray(A) @ z, jnp.asarray(b), tol=1e-10)
    assert float(stats.reduction) <= 1e-10
    assert 0 < float(stats.conv_rate()) < 1


@pytest.mark.fast
def test_multicolor_ssor_beats_jacobi():
    """Multicolor SSOR (SeqSSOR analog): valid SPD preconditioner for CG,
    fewer iterations than Jacobi on 2D Poisson."""
    import numpy as np
    from dune_pdelab_tpu import (
        StructuredMesh, FunctionSpace, QkFEM, GridOperator, constraints,
        StationaryLinearProblemSolver,
    )
    from dune_pdelab_tpu.ops import (
        ConvectionDiffusionProblem, ConvectionDiffusionFEM,
    )
    from dune_pdelab_tpu.solvers import SEQ_CG_Jacobi, SEQ_CG_SSOR
    from dune_pdelab_tpu.linalg.preconditioners import dof_lattice_colors

    class P(ConvectionDiffusionProblem):
        def f(self, x):
            return jnp.ones(x.shape[:-1], x.dtype)

    mesh = StructuredMesh([0, 0], [1, 1], (32, 32))
    V = FunctionSpace(mesh, QkFEM(1, 2))
    # color classes partition the DOFs and are independent sets
    colors = dof_lattice_colors(V)
    allidx = np.sort(np.concatenate([np.asarray(c) for c in colors]))
    assert np.array_equal(allidx, np.arange(V.ndofs))

    cgm = constraints(True, V)
    go = GridOperator(V, ConvectionDiffusionFEM(P()), constraints=cgm)
    its = {}
    for name, be in (("jac", SEQ_CG_Jacobi()), ("ssor", SEQ_CG_SSOR())):
        s = StationaryLinearProblemSolver(go, be, reduction=1e-11)
        s.apply(V.zero())
        assert s.result.converged
        its[name] = s.result.linear_solver_iterations
    assert its["ssor"] < 0.8 * its["jac"], its
