"""Quadrature + basis unit tests (testpk2dinterpolation / fem-conformity
suite analog, reference: dune/pdelab/test/fem/testfemwithgfs.cc)."""
import numpy as np
import pytest

from dune_pdelab_tpu.fe import (
    gauss_legendre, gauss_lobatto, cube_rule, simplex_rule,
    QkFEM, QkDGFEM, PkFEM, P0FEM, LegendreDGFEM, RannacherTurekFEM,
)


@pytest.mark.parametrize("order", [1, 2, 3, 5, 8])
def test_gauss_legendre_exact(order):
    x, w = gauss_legendre(order)
    for p in range(order + 1):
        assert np.isclose(np.dot(w, x**p), 1.0 / (p + 1), atol=1e-14)


@pytest.mark.parametrize("order", [2, 3, 5])
def test_gauss_lobatto_exact(order):
    x, w = gauss_lobatto(order)
    assert np.isclose(x[0], 0.0) and np.isclose(x[-1], 1.0)
    for p in range(order + 1):
        assert np.isclose(np.dot(w, x**p), 1.0 / (p + 1), atol=1e-13)


@pytest.mark.parametrize("dim", [1, 2, 3])
@pytest.mark.parametrize("order", [1, 3, 4])
def test_cube_rule(dim, order):
    pts, w = cube_rule(dim, order)
    exps = [tuple([order] + [0] * (dim - 1)), tuple([1] * dim)]
    for e in exps:
        val = np.sum(w * np.prod(pts**np.array(e), axis=1))
        exact = np.prod([1.0 / (k + 1) for k in e])
        assert np.isclose(val, exact, atol=1e-13)


def _simplex_monomial_integral(exps):
    """∫_simplex prod x_i^a_i dx = prod(a_i!) / (d + sum a_i)!"""
    from math import factorial
    d = len(exps)
    num = 1
    for a in exps:
        num *= factorial(a)
    return num / factorial(d + sum(exps))


@pytest.mark.parametrize("dim", [1, 2, 3])
@pytest.mark.parametrize("order", [1, 2, 4])
def test_simplex_rule(dim, order):
    pts, w = simplex_rule(dim, order)
    assert np.all(w > 0)
    rng = np.random.default_rng(0)
    for _ in range(5):
        e = tuple(rng.integers(0, order + 1, dim))
        if sum(e) > order:
            continue
        val = np.sum(w * np.prod(pts**np.array(e), axis=1))
        assert np.isclose(val, _simplex_monomial_integral(e), atol=1e-12), e


ELEMENTS = [
    QkFEM(1, 1), QkFEM(2, 1), QkFEM(1, 2), QkFEM(2, 2), QkFEM(3, 2),
    QkFEM(1, 3), QkFEM(2, 3), QkDGFEM(1, 2), QkDGFEM(2, 2, "lobatto"),
    QkDGFEM(2, 2, "gl"), PkFEM(1, 2), PkFEM(2, 2), PkFEM(3, 2), PkFEM(1, 3),
    PkFEM(2, 3), P0FEM(2), RannacherTurekFEM(2), RannacherTurekFEM(3),
]


@pytest.mark.parametrize("fem", ELEMENTS, ids=lambda f: repr(f))
def test_partition_of_unity(fem):
    rng = np.random.default_rng(1)
    pts = rng.random((7, fem.dim))
    if fem.geometry == "simplex":
        pts = pts / (pts.sum(1, keepdims=True) + 0.3)
    vals, grads = fem.tabulate(pts)
    assert vals.shape == (7, fem.nbasis)
    assert np.allclose(vals.sum(axis=1), 1.0, atol=1e-12)
    assert np.allclose(grads.sum(axis=1), 0.0, atol=1e-11)


@pytest.mark.parametrize("fem", [f for f in ELEMENTS if f.nodes is not None],
                         ids=lambda f: repr(f))
def test_nodal_delta(fem):
    vals, _ = fem.tabulate(fem.nodes)
    assert np.allclose(vals, np.eye(fem.nbasis), atol=1e-10)


@pytest.mark.parametrize("fem", ELEMENTS, ids=lambda f: repr(f))
def test_gradient_fd(fem):
    rng = np.random.default_rng(2)
    pts = rng.random((5, fem.dim)) * 0.8 + 0.1
    if fem.geometry == "simplex":
        pts = pts / (pts.sum(1, keepdims=True) + 1.0)
    _, grads = fem.tabulate(pts)
    eps = 1e-6
    for d in range(fem.dim):
        dp = pts.copy()
        dp[:, d] += eps
        dm = pts.copy()
        dm[:, d] -= eps
        fd = (fem.tabulate(dp)[0] - fem.tabulate(dm)[0]) / (2 * eps)
        assert np.allclose(grads[:, :, d], fd, atol=1e-6)


def test_legendre_orthonormal():
    fem = LegendreDGFEM(3, 2)
    pts, w = cube_rule(2, 7)
    vals, _ = fem.tabulate(pts)
    gram = np.einsum("q,qi,qj->ij", w, vals, vals)
    assert np.allclose(gram, np.eye(fem.nbasis), atol=1e-12)


def test_legendre_interpolation_matrix():
    fem = LegendreDGFEM(2, 1)
    # project x^2: coeffs reproduce function at random points
    ip = fem.interpolation_points
    coeffs = fem.interpolation_matrix @ (ip[:, 0] ** 2)
    pts = np.linspace(0, 1, 11)[:, None]
    vals, _ = fem.tabulate(pts)
    assert np.allclose(vals @ coeffs, pts[:, 0] ** 2, atol=1e-12)
