"""Linear elasticity tests (testelasticity analog, reference:
dune/pdelab/test/testelasticity.cc): patch test (linear displacement
reproduced exactly), manufactured convergence, traction BC."""
import numpy as np
import jax.numpy as jnp
import pytest

from dune_pdelab_tpu import (
    StructuredMesh, GridOperator, constraints, StationaryLinearProblemSolver,
)
from dune_pdelab_tpu.fe import QkFEM
from dune_pdelab_tpu.space.space import VectorSpace
from dune_pdelab_tpu.ops.elasticity import (
    LinearElasticity, LinearElasticityParameters,
)
from dune_pdelab_tpu.solvers import SEQ_CG_Jacobi
from dune_pdelab_tpu.space.functions import l2_difference


def test_patch_linear_displacement():
    """A linear displacement field (constant strain) solves the equations
    with f=0 and is in the Q1 space -> reproduced exactly."""
    mesh = StructuredMesh([0, 0], [1, 1], (4, 4))
    W = VectorSpace(mesh, QkFEM(1, 2))

    A = np.array([[0.02, 0.01], [0.00, -0.03]])

    class P(LinearElasticityParameters):
        def g(self, x):
            return jnp.einsum("cd,...d->...c", jnp.asarray(A), x)

    prm = P(lam=2.0, mu=1.0)
    cg_ = constraints((True, True), W)
    go = GridOperator(W, LinearElasticity(prm), constraints=cg_)
    # interpolate Dirichlet data everywhere, then solve
    x0 = W.interpolate(lambda p: p @ A.T)
    slp = StationaryLinearProblemSolver(go, SEQ_CG_Jacobi(), reduction=1e-12,
                                        verbose=0)
    x = slp.apply(x0)
    for c in range(2):
        xc = W.restrict(x, c)
        err = float(l2_difference(W.children[c], xc,
                                  lambda p, c=c: p @ A.T[:, c]))
        assert err < 1e-10, (c, err)


def test_manufactured_convergence():
    """u = (sin(pi x) sin(pi y), 0)-type manufactured solution, Q2."""
    lam, mu = 1.0, 1.0

    def u1(p):
        return np.sin(np.pi * p[:, 0]) * np.sin(np.pi * p[:, 1])

    class P(LinearElasticityParameters):
        def g(self, x):
            return jnp.stack([jnp.sin(np.pi * x[..., 0]) *
                              jnp.sin(np.pi * x[..., 1]),
                              jnp.zeros_like(x[..., 0])], axis=-1)

        def f(self, x):
            s, c = jnp.sin, jnp.cos
            px, py = np.pi * x[..., 0], np.pi * x[..., 1]
            # -div sigma(u) for u = (sin sin, 0):
            # f1 = pi^2 [ (lam+2mu) + mu ] sin sin
            # f2 = -pi^2 (lam+mu) cos cos
            f1 = np.pi**2 * ((lam + 2 * mu) + mu) * s(px) * s(py)
            f2 = -(np.pi**2) * (lam + mu) * c(px) * c(py)
            return jnp.stack([f1, f2], axis=-1)

    errs = []
    for n in (4, 8, 16):
        mesh = StructuredMesh([0, 0], [1, 1], (n, n))
        W = VectorSpace(mesh, QkFEM(2, 2))
        prm = P(lam=lam, mu=mu)
        cg_ = constraints((True, True), W)
        go = GridOperator(W, LinearElasticity(prm), constraints=cg_)
        from dune_pdelab_tpu import interpolate_dirichlet
        x0 = interpolate_dirichlet(
            lambda p: np.stack([u1(p), np.zeros(len(p))], -1), W, cg_, W.zero())
        x = StationaryLinearProblemSolver(
            go, SEQ_CG_Jacobi(), reduction=1e-12, verbose=0).apply(x0)
        x1 = W.restrict(x, 0)
        errs.append(float(l2_difference(W.children[0], x1, u1)))
    orders = [np.log2(errs[i] / errs[i + 1]) for i in range(len(errs) - 1)]
    assert orders[-1] > 2.7, (errs, orders)


def test_traction_bc():
    """Uniaxial tension: pull at x=1 with traction t = (T, 0); fix x=0.
    Exact solution: u1 = T x (lam+2mu-...)/E' — for plane strain with
    free y-boundaries the stress state is nontrivial; instead verify the
    residual of the exact *1D-constrained* problem: clamp u2 = 0 everywhere
    (both components Dirichlet on y-faces would overconstrain) — so here we
    just check global force balance: reaction = applied traction."""
    T = 0.1
    mesh = StructuredMesh([0, 0], [1, 1], (8, 8))
    W = VectorSpace(mesh, QkFEM(1, 2))

    class P(LinearElasticityParameters):
        def is_neumann(self, x):
            return x[..., 0] > 1e-12   # all but x=0 face

        def traction(self, x):
            tx = jnp.where(x[..., 0] > 1 - 1e-12, T, 0.0)
            return jnp.stack([tx, jnp.zeros_like(tx)], axis=-1)

    prm = P(lam=0.0, mu=0.5)   # E=1, nu=0 -> u = (T x, 0) exactly
    bct = prm.dirichlet_bctype()
    cg_ = constraints((bct, bct), W)
    go = GridOperator(W, LinearElasticity(prm), constraints=cg_)
    x = StationaryLinearProblemSolver(
        go, SEQ_CG_Jacobi(), reduction=1e-12, verbose=0).apply(W.zero())
    x1 = W.restrict(x, 0)
    err = float(l2_difference(W.children[0], x1, lambda p: T * p[:, 0]))
    assert err < 1e-9, err
