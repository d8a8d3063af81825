"""Porous-media flow toolchain: heterogeneous-permeability Darcy solve
(CCFV/TPFA), locally conservative RT0 velocity reconstruction, nonlinear
porous-medium equation via Newton, and VTK output of head + velocity +
log-permeability (reference analogs: darcyccfv.hh, darcyfem.hh,
permeability_adapter.hh, nonlinearconvectiondiffusionfem.hh).

Run: python examples/09_darcy_porous_media.py  (CPU or TPU; ~seconds)
"""
import numpy as np
import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

import dune_pdelab_tpu as pt  # noqa: E402
from dune_pdelab_tpu.fe import P0FEM  # noqa: E402
from dune_pdelab_tpu.ops import (  # noqa: E402
    BCType, ConvectionDiffusionProblem, ConvectionDiffusionCCFV,
    DarcyVelocityFromHeadCCFV, DarcyVelocityFromHeadFEM,
    permeability_field,
    NonlinearConvectionDiffusionProblem, NonlinearConvectionDiffusionFEM,
)
from dune_pdelab_tpu.solvers import SEQ_CG_Jacobi  # noqa: E402
from dune_pdelab_tpu.io import VTKWriter  # noqa: E402


# -- 1. heterogeneous Darcy: quarter-five-spot with a low-K inclusion -------
class QuarterFiveSpot(ConvectionDiffusionProblem):
    """Flow from the left (head 1) to the right (head 0); K drops by 1e3
    inside a central block. No flow through top/bottom."""

    def A(self, x):
        inside = ((jnp.abs(x[..., 0] - 0.5) < 0.15)
                  & (jnp.abs(x[..., 1] - 0.5) < 0.15))
        return jnp.where(inside, 1e-3, 1.0)

    def bctype(self, x):
        on_x = (x[..., 0] < 1e-12) | (x[..., 0] > 1 - 1e-12)
        return jnp.where(on_x, BCType.DIRICHLET, BCType.NEUMANN)

    def g(self, x):
        return 1.0 - x[..., 0]

    def j(self, x):
        return 0.0


def darcy_ccfv():
    p = QuarterFiveSpot()
    mesh = pt.StructuredMesh([0, 0], [1, 1], (64, 64))
    V = pt.FunctionSpace(mesh, P0FEM(2))
    go = pt.GridOperator(V, ConvectionDiffusionCCFV(p))
    slp = pt.StationaryLinearProblemSolver(go, SEQ_CG_Jacobi(),
                                           reduction=1e-12, verbose=1)
    head = slp.apply(V.zero())

    rt0 = DarcyVelocityFromHeadCCFV(mesh, p, head)
    v = rt0.at_centers()
    div = rt0.cell_divergence()
    # local conservation: no sources -> div(v) = 0 cell by cell
    print(f"[darcy] max |div v| per cell    : {np.max(np.abs(div)):.3e}")
    # inflow == outflow (global mass balance from the face fluxes)
    vx = rt0.face_normal_velocities()[0]
    h = mesh.h
    inflow = float(np.sum(vx[:, 0]) * h[1])
    outflow = float(np.sum(vx[:, -1]) * h[1])
    print(f"[darcy] inflow {inflow:.6f} vs outflow {outflow:.6f}")
    assert abs(inflow - outflow) < 1e-10 * abs(inflow)
    assert np.max(np.abs(div)) < 1e-7    # solver-tolerance scale

    w = VTKWriter(mesh)
    w.add_field(V, head, "head")
    w.add_cell_data("velocity", v)
    w.add_cell_data("log10K", permeability_field(mesh, p))
    path = w.write("/tmp/darcy")
    print(f"[darcy] wrote {path} (head, velocity, log10K)")


# -- 2. porous-medium equation: -Laplace(u^2) = f via Newton ----------------
class PorousMedium(NonlinearConvectionDiffusionProblem):
    C = 1.2

    def exact(self, p):
        return np.sin(np.pi * p[:, 0]) * np.sin(np.pi * p[:, 1]) + self.C

    def w(self, x, u):
        return u * u

    def f(self, x, u):
        a = np.pi
        s0, c0 = jnp.sin(a * x[..., 0]), jnp.cos(a * x[..., 0])
        s1, c1 = jnp.sin(a * x[..., 1]), jnp.cos(a * x[..., 1])
        ue = s0 * s1 + self.C
        grad2 = a**2 * (c0**2 * s1**2 + s0**2 * c1**2)
        return -2 * grad2 + 4 * a**2 * ue * (ue - self.C)

    def g(self, x):
        return (jnp.sin(np.pi * x[..., 0]) * jnp.sin(np.pi * x[..., 1])
                + self.C)


def porous_medium():
    p = PorousMedium()
    mesh = pt.StructuredMesh([0, 0], [1, 1], (32, 32))
    V = pt.FunctionSpace(mesh, pt.QkFEM(1, 2))
    cg = pt.constraints(p.dirichlet_bctype(), V)
    go = pt.GridOperator(V, NonlinearConvectionDiffusionFEM(p),
                         constraints=cg)
    xc = V.interpolate(lambda pts: np.full(len(pts), p.C))
    x0 = pt.interpolate_dirichlet(p.g, V, cg, xc)
    newton = pt.NewtonMethod(go, SEQ_CG_Jacobi(), reduction=1e-11, verbose=1)
    x = newton.apply(x0)
    from dune_pdelab_tpu.space.functions import l2_difference
    err = float(l2_difference(V, x, p.exact))
    print(f"[pme] Newton {newton.result.iterations} its, L2 error {err:.3e}")
    assert newton.result.converged and err < 1e-3
    # seepage velocity of the head field through the FEM adapter
    dv = DarcyVelocityFromHeadFEM(p, V, x)
    vmax = float(np.max(np.abs(np.asarray(dv.at_centers()))))
    print(f"[pme] max |v| at centers        : {vmax:.3f}")


if __name__ == "__main__":
    darcy_ccfv()
    porous_medium()
    print("OK")
