"""Unstructured-grid workflow: Gmsh mesh in, AMG-preconditioned solve,
VTK out — the ISTLBackend_SEQ_CG_AMG pipeline on a mesh where no
geometric multigrid exists (reference analogs: GmshReader + pkfem.hh +
seqistlsolverbackend.hh AMG backends; grid fixture:
dune/pdelab/test/grids/circ_in_rect.msh).

Demonstrates:
  1. reading the reference's unstructured triangle mesh (a rectangle
     with a circular hole) via SimplexMesh.from_gmsh,
  2. P1/P2 conforming solves with smoothed-aggregation AMG
     (linalg/amg.py) — bounded iterations where Jacobi-CG degrades,
  3. a DG SIPG solve through the DG -> P1 -> AMG two-level
     (linalg/dgmultigrid.py, the seq_amg_dg_backend.hh composition),
  4. the 8-virtual-device distributed AMG (parallel/shardedamg.py)
     matching the sequential iteration count exactly,
  5. VTK output with simplex cell types.

Run: python examples/14_unstructured_amg.py   (CPU; ~1 min)
"""
import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

import dune_pdelab_tpu as pt  # noqa: E402
from dune_pdelab_tpu.mesh import SimplexMesh  # noqa: E402
from dune_pdelab_tpu.fe import PkFEM, PkDGFEM  # noqa: E402
from dune_pdelab_tpu.ops import (  # noqa: E402
    ConvectionDiffusionProblem, ConvectionDiffusionFEM,
)
from dune_pdelab_tpu.ops.convectiondiffusiondg import (  # noqa: E402
    ConvectionDiffusionDG, DGMethod,
)
from dune_pdelab_tpu.linalg import AlgebraicMultigrid, DGTwoLevel  # noqa: E402
from dune_pdelab_tpu.linalg.krylov import cg  # noqa: E402
from dune_pdelab_tpu.parallel import ShardedAMG  # noqa: E402
from dune_pdelab_tpu.solvers import (  # noqa: E402
    LinearSolverBackend, StationaryLinearProblemSolver, SEQ_CG_AMG,
    SEQ_CG_Jacobi,
)
from dune_pdelab_tpu.io import VTKWriter  # noqa: E402

REF_MSH = "/root/reference/dune/pdelab/test/grids/circ_in_rect.msh"


class Heated(ConvectionDiffusionProblem):
    """Unit source in a rectangle-with-hole, zero Dirichlet everywhere
    (outer boundary and the circular hole)."""

    def f(self, x):
        return jnp.ones(x.shape[:-1], x.dtype)


def mesh_or_fallback():
    if os.path.exists(REF_MSH):
        m = SimplexMesh.from_gmsh(REF_MSH)
        print(f"loaded {REF_MSH}: {m.nvertices} vertices, "
              f"{m.nelements} triangles")
        return m
    print("reference grid not mounted; falling back to a triangulated "
          "structured square")
    return SimplexMesh.from_structured(
        pt.StructuredMesh([0, 0], [1, 1], (32, 32)))


def main():
    mesh = mesh_or_fallback()
    p = Heated()

    # -- 1/2. conforming P1 + P2 with AMG vs Jacobi --------------------------
    for k in (1, 2):
        V = pt.FunctionSpace(mesh, PkFEM(k, 2))
        cg_ = pt.constraints(p.dirichlet_bctype(), V)
        go = pt.GridOperator(V, ConvectionDiffusionFEM(p), constraints=cg_)
        slp = StationaryLinearProblemSolver(go, SEQ_CG_AMG(),
                                            reduction=1e-10, verbose=0)
        x = slp.apply(V.zero())
        sj = StationaryLinearProblemSolver(go, SEQ_CG_Jacobi(),
                                           reduction=1e-10, verbose=0)
        sj.apply(V.zero())
        print(f"P{k}: ndofs={V.ndofs}  AMG-CG "
              f"{slp.result.linear_solver_iterations} its vs Jacobi-CG "
              f"{sj.result.linear_solver_iterations} its "
              f"(converged={slp.result.converged})")
        if k == 1:
            x_p1, V_p1 = x, V

    # -- 3. DG SIPG through the DG -> P1 -> AMG two-level --------------------
    Vdg = pt.FunctionSpace(mesh, PkDGFEM(1, 2))
    godg = pt.GridOperator(Vdg, ConvectionDiffusionDG(p,
                                                      method=DGMethod.SIPG))
    tl = DGTwoLevel(godg, ConvectionDiffusionFEM(p))
    ls = LinearSolverBackend(solver="cg", precond=tl, use_stencil=False)
    sdg = StationaryLinearProblemSolver(godg, ls, reduction=1e-10, verbose=0)
    sdg.apply(Vdg.zero())
    print(f"DG SIPG: ndofs={Vdg.ndofs}  two-level({tl.coarse_kind})-CG "
          f"{sdg.result.linear_solver_iterations} its")

    # -- 4. distributed AMG on 8 virtual devices -----------------------------
    go = pt.GridOperator(V_p1, ConvectionDiffusionFEM(p),
                         constraints=pt.constraints(p.dirichlet_bctype(),
                                                    V_p1))
    amg = AlgebraicMultigrid().setup_from_grid_operator(go, keep_host=True)
    samg = ShardedAMG(amg, devices=jax.devices())
    b = go.residual(V_p1.zero())
    zs, ss = cg(lambda q: go.jacobian_apply(V_p1.zero(), q), b,
                M=amg.apply, tol=1e-10)
    zp, sp_ = cg(lambda q: go.jacobian_apply(V_p1.zero(), q), b,
                 M=samg.apply, tol=1e-10)
    print(f"distributed AMG ({samg.ndev} devices): "
          f"{int(sp_.iterations)} its == sequential {int(ss.iterations)}; "
          f"solution diff {float(jnp.linalg.norm(zs - zp)):.2e}")

    # -- 5. VTK output --------------------------------------------------------
    out = os.path.join(os.path.dirname(__file__), "out14_unstructured.vtu")
    w = VTKWriter(mesh)
    w.add_field(V_p1, x_p1, "u")
    w.write(out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
