"""Round-3 FE zoo closures (VERDICT round-2 item 4): simplex conforming Pk
for k >= 3 (2D and 3D), Whitney edge elements on tetrahedra, and RT1 on
hexahedra — the last members of the reference FiniteElementMap families
(reference: dune/pdelab/finiteelementmap/pkfem.hh, edges0.5fem.hh:24,
raviartthomasfem.hh RT1Cube3D)."""
import numpy as np
import jax.numpy as jnp
import pytest

from dune_pdelab_tpu import (
    StructuredMesh, FunctionSpace, CompositeSpace, GridOperator,
    DirichletConstraints, StationaryLinearProblemSolver, constraints,
)
from dune_pdelab_tpu.fe.basis import PkFEM, QkDGFEM
from dune_pdelab_tpu.fe.hcurl import N0Simplex
from dune_pdelab_tpu.fe.hdiv import RTkCube3D
from dune_pdelab_tpu.mesh.simplex import SimplexMesh
from dune_pdelab_tpu.ops import (
    ConvectionDiffusionProblem, ConvectionDiffusionFEM,
)
from dune_pdelab_tpu.ops.diffusionmixed import DiffusionMixed
from dune_pdelab_tpu.ops.electrodynamic import CurlCurl, CurlCurlParameters
from dune_pdelab_tpu.linalg.krylov import cg
from dune_pdelab_tpu.solvers import LinearSolverBackend
from dune_pdelab_tpu.space.functions import l2_difference


def _tri(n):
    return SimplexMesh.from_structured(StructuredMesh([0, 0], [1, 1], (n, n)))


def _tet(n):
    return SimplexMesh.from_structured(
        StructuredMesh([0, 0, 0], [1, 1, 1], (n, n, n)))


# ---------------------------------------------------------------- Pk, k >= 3
class _Sin2D(ConvectionDiffusionProblem):
    def u_exact(self, q):
        return np.sin(np.pi * q[:, 0]) * np.sin(np.pi * q[:, 1])

    def f(self, x):
        return 2 * np.pi**2 * jnp.sin(np.pi * x[..., 0]) * jnp.sin(
            np.pi * x[..., 1])

    def dirichlet_bctype(self):
        return True


@pytest.mark.parametrize("k", [3, 4])
def test_pk_high_order_2d_poisson_convergence(k):
    """Conforming Pk (k = 3, 4) on triangles: Poisson L2 error at order
    k+1 — exercises the edge-orientation-aware DOF map (pkfem.hh analog)."""
    p = _Sin2D()
    errs = []
    for n in (2, 4):
        sm = _tri(n)
        V = FunctionSpace(sm, PkFEM(k, 2))
        cg_ = constraints(True, V)
        go = GridOperator(V, ConvectionDiffusionFEM(p), constraints=cg_)
        b = go.residual(V.zero())
        d = go.jacobian_diagonal(V.zero())
        z, s = cg(lambda v: go.jacobian_apply(V.zero(), v), b,
                  M=lambda r: r / d, tol=1e-13, maxiter=4000)
        assert bool(s.converged)
        errs.append(float(l2_difference(V, -z, p.u_exact)))
    order = np.log2(errs[0] / errs[1])
    assert order > k + 0.5, (errs, order)


def test_pk3_3d_interpolation_order4():
    """P3 on tetrahedra: nodal interpolation of a smooth function converges
    at order 4 (face-interior DOFs orientation-consistent across tets)."""
    f = lambda q: np.sin(np.pi * q[:, 0]) * np.cos(q[:, 1]) * np.exp(q[:, 2])
    errs = []
    for n in (2, 4):
        V = FunctionSpace(_tet(n), PkFEM(3, 3))
        x = V.interpolate(lambda q: np.asarray(f(np.atleast_2d(q))))
        errs.append(float(l2_difference(V, x, f)))
    order = np.log2(errs[0] / errs[1])
    assert order > 3.5, (errs, order)


def test_pk3_conforming_across_elements():
    """The Pk map is conforming: interpolating a global polynomial of
    degree k yields zero L2 error (shared edge/face DOFs agree)."""
    for dim, k, mesh in ((2, 3, _tri(3)), (3, 3, _tet(2)), (2, 4, _tri(2))):
        V = FunctionSpace(mesh, PkFEM(k, dim))
        f = lambda q: (q[:, 0] + 0.3 * q[:, 1]) ** k
        x = V.interpolate(lambda q: np.asarray(f(np.atleast_2d(q))))
        err = float(l2_difference(V, x, f))
        assert err < 1e-11, (dim, k, err)


# ------------------------------------------------------------- tet Whitney
def test_whitney_tet_gradient_kernel():
    """Discrete gradients are exactly curl-free: edge circulations of
    grad(p) lie in the kernel of the curl-curl operator (edges0.5fem.hh
    EdgeS0.5 on tets)."""
    sm = _tet(3)
    V = FunctionSpace(sm, N0Simplex(3))
    uniq, _ = sm.edges()
    pv = np.sin(sm.vertices[:, 0] * 1.3) + sm.vertices[:, 1] ** 2 \
        - 0.7 * sm.vertices[:, 2]
    gvec = pv[uniq[:, 1]] - pv[uniq[:, 0]]
    go = GridOperator(V, CurlCurl(CurlCurlParameters(nu=1.0, beta=0.0)))
    y = go.jacobian_apply(jnp.zeros(V.ndofs), jnp.asarray(gvec))
    assert float(jnp.linalg.norm(y)) < 1e-10 * max(1.0, np.linalg.norm(gvec))


def test_whitney_tet_constant_exact():
    """Whitney interpolation (edge circulations) of a constant field
    reproduces it exactly: the mass-matrix residual of the interpolant
    against the constant's load vector vanishes."""
    sm = _tet(2)
    V = FunctionSpace(sm, N0Simplex(3))
    c = np.array([0.7, -1.2, 0.4])
    uniq, _ = sm.edges()
    gvec = (sm.vertices[uniq[:, 1]] - sm.vertices[uniq[:, 0]]) @ c

    class P(CurlCurlParameters):
        def f(self, x):
            return jnp.broadcast_to(jnp.asarray(c, x.dtype), x.shape)

    go = GridOperator(V, CurlCurl(P(nu=0.0, beta=1.0)))
    # residual(u) = M u - load(c); zero iff interpolant == c in L2
    r = go.residual(jnp.asarray(gvec))
    assert float(jnp.linalg.norm(r)) < 1e-12


def test_whitney_tet_curlcurl_manufactured():
    """(curl curl + I) u = f with u = grad(p), p = prod sin(pi x_i):
    curl u = 0 so f = u; n x u = 0 on the boundary. The discrete solution's
    edge DOFs converge to the exact circulations (first order at least)."""
    class P(CurlCurlParameters):
        def f(self, x):
            s, c, pi = jnp.sin, jnp.cos, np.pi
            X, Y, Z = x[..., 0], x[..., 1], x[..., 2]
            return pi * jnp.stack([
                c(pi * X) * s(pi * Y) * s(pi * Z),
                s(pi * X) * c(pi * Y) * s(pi * Z),
                s(pi * X) * s(pi * Y) * c(pi * Z)], axis=-1)

    errs = []
    for n in (2, 4):
        sm = _tet(n)
        V = FunctionSpace(sm, N0Simplex(3))
        uniq, _ = sm.edges()
        mask = V.boundary_edge_mask()
        go = GridOperator(V, CurlCurl(P(nu=1.0, beta=1.0)),
                          constraints=DirichletConstraints(mask))
        b = go.residual(V.zero())
        d = go.jacobian_diagonal(V.zero())
        z, s = cg(lambda v: go.jacobian_apply(V.zero(), v), b,
                  M=lambda r: r / d, tol=1e-12, maxiter=4000)
        assert bool(s.converged)
        # exact circulations: integral of grad p along an edge = p(b) - p(a)
        pv = np.prod(np.sin(np.pi * sm.vertices), axis=1)
        exact = pv[uniq[:, 1]] - pv[uniq[:, 0]]
        errs.append(float(np.linalg.norm(np.asarray(-z) - exact)
                          / np.linalg.norm(exact)))
    order = np.log2(errs[0] / errs[1])
    assert order > 0.9, (errs, order)


# ------------------------------------------------------------- RT1 cube 3D
def test_rt1_cube3d_unisolvent():
    el = RTkCube3D(1)
    M = el._dof_matrix() @ el._C
    assert np.abs(M - np.eye(el.nbasis)).max() < 1e-9


def test_rt1_cube3d_normal_trace():
    """Face dofs: normal trace on each face spans Q1 of the tangentials;
    interior basis members have zero normal trace on every face."""
    el = RTkCube3D(1)
    t = np.linspace(0.1, 0.9, 3)
    T1, T2 = np.meshgrid(t, t, indexing="ij")
    for a, s in ((0, 0), (1, 1), (2, 0)):
        t1, t2 = [d for d in range(3) if d != a]
        pts = np.zeros((T1.size, 3))
        pts[:, a] = float(s)
        pts[:, t1] = T1.ravel()
        pts[:, t2] = T2.ravel()
        vn = el.tabulate_vector(pts)[:, :, a]
        assert np.abs(vn[:, 24:]).max() < 1e-9     # interior: zero trace
        # on-face dofs reproduce Q1, off-face face-dofs vanish
        face_row = 2 * (2 * a + s) * 2  # start of this face's 4 moments...
        # ordering: faces (axis, side, moment m*(k+1)+n): block of 4
        blk = (2 * a + s) * 4
        other = [j for j in range(24) if not (blk <= j < blk + 4)]
        assert np.abs(vn[:, other]).max() < 1e-9


def test_rt1_cube3d_mixed_darcy_order2():
    """RT1/Q1DG mixed Darcy in 3D: pressure converges at order 2
    (raviartthomasfem.hh RT1Cube3D analog)."""
    class P3(ConvectionDiffusionProblem):
        def p_exact(self, q):
            return (np.sin(np.pi * q[:, 0]) * np.sin(np.pi * q[:, 1])
                    * np.sin(np.pi * q[:, 2]))

        def f(self, x):
            return 3 * np.pi**2 * (jnp.sin(np.pi * x[..., 0])
                                   * jnp.sin(np.pi * x[..., 1])
                                   * jnp.sin(np.pi * x[..., 2]))

        def g(self, x):
            return jnp.zeros(x.shape[:-1])

    p = P3()
    errs = []
    for n in (2, 4):
        mesh = StructuredMesh([0, 0, 0], [1, 1, 1], (n, n, n))
        Vu = FunctionSpace(mesh, RTkCube3D(1), name="u")
        Vp = FunctionSpace(mesh, QkDGFEM(1, 3), name="p")
        W = CompositeSpace(Vu, Vp)
        go = GridOperator(W, DiffusionMixed(p))
        ls = LinearSolverBackend(solver="minres", precond="none",
                                 maxiter=60000)
        slp = StationaryLinearProblemSolver(go, ls, reduction=1e-11,
                                            verbose=0)
        x = slp.apply(W.zero())
        assert slp.result.converged
        errs.append(float(l2_difference(Vp, W.restrict(x, 1), p.p_exact)))
    order = np.log2(errs[0] / errs[1])
    assert order > 1.6, (errs, order)
