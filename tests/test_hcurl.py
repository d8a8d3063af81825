"""Edge element + curl-curl tests (testelectrodynamic analog, reference:
dune/pdelab/test/testelectrodynamic.cc): de Rham structure (curl of discrete
gradients vanishes), tangential dof duality, manufactured curl-curl solve."""
import numpy as np
import jax.numpy as jnp
import pytest

from dune_pdelab_tpu import StructuredMesh, FunctionSpace, GridOperator
from dune_pdelab_tpu.fe import QkFEM
from dune_pdelab_tpu.fe.hcurl import N0Cube
from dune_pdelab_tpu.constraints.dirichlet import DirichletConstraints
from dune_pdelab_tpu.ops.electrodynamic import CurlCurl, CurlCurlParameters
from dune_pdelab_tpu.linalg import cg


@pytest.mark.parametrize("dim", [2, 3])
def test_edge_dof_duality(dim):
    """Tangential edge integrals of basis b are delta_bb'."""
    from dune_pdelab_tpu.fe.quadrature import gauss_legendre
    fem = N0Cube(dim)
    xq, wq = gauss_legendre(3)
    for b, (a, tdims, bits) in enumerate(fem.edges):
        pts = np.zeros((len(xq), dim))
        pts[:, a] = xq
        for td, bit in zip(tdims, bits):
            pts[:, td] = bit
        v = fem.tabulate_vector(pts)
        integrals = np.einsum("q,qB->B", wq, v[:, :, a])
        expect = np.zeros(fem.nbasis)
        expect[b] = 1.0
        assert np.allclose(integrals, expect, atol=1e-12), b


@pytest.mark.parametrize("dim", [2, 3])
def test_discrete_de_rham(dim):
    """curl(grad) = 0 discretely: edge interpolation of a nodal gradient
    (dof = p(end) - p(start)) lies in the kernel of the curl-curl matrix."""
    cells = (4,) * dim
    mesh = StructuredMesh([0] * dim, [1] * dim, cells)
    Ve = FunctionSpace(mesh, N0Cube(dim))
    Vn = FunctionSpace(mesh, QkFEM(1, dim))
    go = GridOperator(Ve, CurlCurl(CurlCurlParameters(nu=1.0, beta=0.0)))
    # nodal potential -> edge dofs via incidence: edge (a, from g to g+e_a)
    rng = np.random.default_rng(0)
    pvals = rng.standard_normal(Vn.ndofs)
    gvec = np.zeros(Ve.ndofs)
    dims_n = Vn._dof_grid_dims
    strides = np.ones(dim, dtype=np.int64)
    for d in range(1, dim):
        strides[d] = strides[d - 1] * dims_n[d - 1]
    for a in range(dim):
        ed = Ve._hcurl_edge_dims[a]
        off = Ve._hcurl_offsets[a]
        n_a = int(np.prod(ed))
        g = np.arange(n_a, dtype=np.int64)
        mi = np.empty((n_a, dim), dtype=np.int64)
        for d in range(dim):
            mi[:, d] = g % ed[d]
            g = g // ed[d]
        start = mi @ strides
        end = (mi + np.eye(dim, dtype=np.int64)[a]) @ strides
        gvec[off:off + n_a] = pvals[end] - pvals[start]
    y = go.jacobian_apply(jnp.zeros(Ve.ndofs), jnp.asarray(gvec))
    assert float(jnp.linalg.norm(y)) < 1e-10 * max(1.0, np.linalg.norm(gvec))


def test_curlcurl_manufactured_2d():
    """∇×(∇×u) + u = f with u = (sin(pi y), sin(pi x)), n×u = 0 on the
    boundary of the unit square; solve with boundary edges constrained."""
    n = 16
    mesh = StructuredMesh([0, 0], [1, 1], (n, n))
    Ve = FunctionSpace(mesh, N0Cube(2))

    class P(CurlCurlParameters):
        def f(self, x):
            c = np.pi**2 + 1.0
            return jnp.stack([c * jnp.sin(np.pi * x[..., 1]),
                              c * jnp.sin(np.pi * x[..., 0])], axis=-1)

    mask = Ve.boundary_edge_mask()
    cg_ = DirichletConstraints(mask)
    go = GridOperator(Ve, CurlCurl(P()), constraints=cg_)
    b = go.residual(Ve.zero())
    d = go.jacobian_diagonal(Ve.zero())
    x, stats = cg(lambda z: go.jacobian_apply(Ve.zero(), z), -(-b),
                  M=lambda r: r / d, tol=1e-11, maxiter=5000)
    assert bool(stats.converged)
    x = -x  # solve J z = r, solution = -z from zero start
    # compare edge dofs against exact tangential edge integrals
    h = 1.0 / n
    exact = np.zeros(Ve.ndofs)
    for a in range(2):
        ed = Ve._hcurl_edge_dims[a]
        off = Ve._hcurl_offsets[a]
        n_a = int(np.prod(ed))
        g = np.arange(n_a, dtype=np.int64)
        mi = np.empty((n_a, 2), dtype=np.int64)
        for dd in range(2):
            mi[:, dd] = g % ed[dd]
            g = g // ed[dd]
        from scipy.integrate import quad
        # integrate component a of u along the edge
        for i in range(n_a):
            x0 = mi[i] * h
            if a == 0:
                val = quad(lambda s: np.sin(np.pi * x0[1]), x0[0],
                           x0[0] + h)[0]
            else:
                val = quad(lambda s: np.sin(np.pi * x0[0]), x0[1],
                           x0[1] + h)[0]
            exact[off + i] = val
    err = np.linalg.norm(np.asarray(x) - exact) / np.linalg.norm(exact)
    assert err < 0.05, err


# ---------------------------------------------------------------------------
# Whitney edge elements on simplices (round 2)
# ---------------------------------------------------------------------------

def test_whitney_duality():
    """Tangential circulation of w_m along edge l (a->b) == delta_lm."""
    from dune_pdelab_tpu.fe.hcurl import N0Simplex2D
    from dune_pdelab_tpu.fe.quadrature import gauss_legendre

    fem = N0Simplex2D()
    verts = np.array([[0.0, 0.0], [0.0, 1.0], [1.0, 0.0]])
    xq, wq = gauss_legendre(4)
    M = np.zeros((3, 3))
    for l, (a, b) in enumerate(fem._pairs):
        va, vb = verts[a], verts[b]
        pts = va[None] + xq[:, None] * (vb - va)[None]
        t = vb - va                            # UNnormalized: ds absorbs |t|
        v = fem.tabulate_vector(pts)
        M[l] = wq @ np.einsum("qbd,d->qb", v, t)
    assert np.allclose(M, np.eye(3), atol=1e-12)


def test_simplex_de_rham():
    """curl(grad) = 0 discretely on a triangulation: edge dofs of a nodal
    gradient (p[hi] - p[lo] with the global ascending-id direction) lie in
    the kernel of the curl-curl operator."""
    from dune_pdelab_tpu.fe.hcurl import N0Simplex2D
    from dune_pdelab_tpu.mesh import SimplexMesh

    sm = SimplexMesh.from_structured(StructuredMesh([0, 0], [1, 1], (4, 4)))
    Ve = FunctionSpace(sm, N0Simplex2D())
    go = GridOperator(Ve, CurlCurl(CurlCurlParameters(nu=1.0, beta=0.0)))
    rng = np.random.default_rng(0)
    pvals = rng.standard_normal(sm.nvertices)
    uniq, _ = sm.edges()
    gvec = pvals[uniq[:, 1]] - pvals[uniq[:, 0]]      # sorted: lo -> hi
    y = go.jacobian_apply(Ve.zero(), jnp.asarray(gvec))
    assert float(jnp.linalg.norm(y)) < 1e-10


def test_simplex_curlcurl_spd_solve():
    """curl-curl + mass on a triangulation: assembled operator symmetric
    positive definite; CG converges."""
    from dune_pdelab_tpu.fe.hcurl import N0Simplex2D
    from dune_pdelab_tpu.mesh import SimplexMesh

    sm = SimplexMesh.from_structured(StructuredMesh([0, 0], [1, 1], (4, 4)))
    Ve = FunctionSpace(sm, N0Simplex2D())

    class P(CurlCurlParameters):
        def f(self, x):
            return jnp.stack([jnp.ones(x.shape[:-1]),
                              x[..., 0]], axis=-1)

    go = GridOperator(Ve, CurlCurl(P(nu=1.0, beta=1.0)))
    A = np.asarray(go.jacobian(Ve.zero()).todense())
    assert np.allclose(A, A.T, atol=1e-11)
    assert np.linalg.eigvalsh(A).min() > 0
    b = -np.asarray(go.residual(Ve.zero()))
    x, s = cg(lambda z: go.jacobian_apply(Ve.zero(), z), jnp.asarray(b),
              tol=1e-10)
    assert bool(s.converged)
    r = np.asarray(go.residual(jnp.asarray(x)))
    assert np.linalg.norm(r) < 1e-8


@pytest.mark.fast
def test_maxwell_eigenvalues_unit_square():
    """Maxwell cavity eigenvalues on the unit square with PEC boundary:
    curl curl E = lambda E gives lambda = pi^2 (m^2 + n^2) for the nonzero
    TE modes (the reference testelectrodynamic.cc stored-eigenvalue oracle).
    Nedelec elements are spurious-free: besides the gradient kernel (lambda
    = 0), the smallest computed eigenvalues match pi^2 {1, 1, 2, 4, 4}."""
    import scipy.linalg as sla
    from dune_pdelab_tpu.ops.electrodynamic import CurlCurl, CurlCurlParameters

    mesh = StructuredMesh([0, 0], [1, 1], (16, 16))
    V = FunctionSpace(mesh, N0Cube(2))
    # stiffness (beta=0) and mass (nu=0, beta=1) through the same kernel
    goA = GridOperator(V, CurlCurl(CurlCurlParameters(nu=1.0, beta=0.0)))
    goM = GridOperator(V, CurlCurl(CurlCurlParameters(nu=0.0, beta=1.0)))
    A = np.asarray(goA.jacobian(V.zero()).todense())
    M = np.asarray(goM.jacobian(V.zero()).todense())
    # PEC: eliminate tangential boundary edges (n x E = 0)
    free = ~V.boundary_edge_mask()
    A = A[np.ix_(free, free)]
    M = M[np.ix_(free, free)]
    lam = np.sort(sla.eigh(A, M, eigvals_only=True))
    nz = lam[lam > 1e-6] / np.pi**2
    expect = np.array([1.0, 1.0, 2.0, 4.0, 4.0])
    assert np.allclose(nz[:5], expect, rtol=0.02), nz[:8]
    # gradient fields span the kernel: dim ker = #interior vertices
    nker = int(np.sum(lam <= 1e-6))
    assert nker == 15 * 15, nker
