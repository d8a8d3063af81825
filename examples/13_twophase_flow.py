"""Two-phase immiscible flow: Brooks-Corey drainage/imbibition on a
heterogeneous reservoir slab with gravity, a liquid injector well, Neumann
gas venting, implicit Euler + Newton with failed-step dt control, and
locally conservative per-phase velocity reconstruction written to VTK.

Reference analogs: twophaseccfv.hh (TwoPhaseTwoPointFluxOperator,
TwoPhaseOnePointTemporalOperator, V_l/V_g velocity grid functions) driven
the way dune-pdelab-howto's two-phase examples do. The gas phase vents
through a DIRICHLET window: an all-Neumann two-phase problem has the
exact Jacobian null mode (p_l, p_g) -> (p_l + c, p_g + c), which stalls
Krylov solvers — anchor at least one phase pressure somewhere.

Run: python examples/13_twophase_flow.py  (CPU or TPU; ~1-2 min)
"""
import numpy as np
import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

import dune_pdelab_tpu as pt  # noqa: E402
from dune_pdelab_tpu.fe import P0FEM  # noqa: E402
from dune_pdelab_tpu.space.space import PowerSpace  # noqa: E402
from dune_pdelab_tpu.ops import (  # noqa: E402
    BrooksCoreyParameters, TwoPhaseCCFV, TwoPhaseStorage, TwoPhaseVelocity,
)
from dune_pdelab_tpu.instationary import OneStepMethod, implicit_euler  # noqa: E402
from dune_pdelab_tpu.solvers import SEQ_BCGS_Jacobi  # noqa: E402
from dune_pdelab_tpu.io import VTKWriter  # noqa: E402


class Reservoir(BrooksCoreyParameters):
    """Layered permeability, liquid injected by a well at the bottom-left,
    gas vented through a Neumann window on the top face; gravity pulls the
    denser liquid down."""

    def __init__(self):
        super().__init__(pe=1.0, lam=2.0, s_lr=0.05, s_gr=0.05,
                         phi=0.2, mu_l=1.0, mu_g=0.2,
                         rho_l=2.0, rho_g=1.0,
                         K=lambda x: jnp.where(x[..., 1] > 0.5, 0.3, 1.0),
                         gravity=(0.0, -0.5))

    def q_l(self, x):   # injector well in the bottom-left cell block
        return jnp.where((x[..., 0] < 0.15) & (x[..., 1] < 0.15), 0.4, 0.0)

    def _vent(self, x):
        return (x[..., 1] > 1 - 1e-9) & (x[..., 0] > 0.6)

    def bc_g(self, x):  # gas vents through a Dirichlet window on the top
        return jnp.where(self._vent(x), 1, 0)   # (anchors the otherwise
        # floating joint pressure level: all-Neumann two-phase has the
        # exact null mode (p_l, p_g) -> (p_l + c, p_g + c))

    def g_g(self, x):
        return jnp.zeros(x.shape[:-1])


def main():
    n = 16
    mesh = pt.StructuredMesh([0, 0], [1, 1], (n, n))
    P0 = pt.FunctionSpace(mesh, P0FEM(2))
    W = PowerSpace(P0, 2)                  # (p_l, p_g)
    prm = Reservoir()
    go0 = pt.GridOperator(W, TwoPhaseCCFV(prm))
    go1 = pt.GridOperator(W, TwoPhaseStorage(prm))
    osm = OneStepMethod(implicit_euler(), go0, go1, SEQ_BCGS_Jacobi(),
                        pdesolver="newton", reduction=1e-7,
                        max_iterations=50, min_linear_reduction=1e-4,
                        line_search_accept_best=True, verbose=1)

    E = mesh.nelements
    # initial: moderately drained, pc = 1.3 -> S_e = 1.3^-2 ~ 0.59
    x = jnp.concatenate([jnp.zeros(E), jnp.full(E, 1.3)])

    def masses(xv):
        m = np.asarray(go1.residual_unconstrained(xv))
        return m[:E].sum(), m[E:].sum()

    ml0, mg0 = masses(x)
    tend, dt = 0.03, 2e-3
    t, x = osm.solve(0.0, dt, tend, x, max_step_retries=6)
    ml1, mg1 = masses(x)

    # discrete mass balance: liquid only enters via the well (its
    # boundary is no-flow everywhere), so the gain is exactly q_l*vol*t;
    # gas leaves through the Dirichlet vent window
    inj = 0.4 * (2.0 / n) * (2.0 / n) * t          # 2x2 cell well block
    print(f"t = {t:.3f}, failed steps = {osm.result.failed_steps}")
    print(f"liquid mass gain {ml1 - ml0:.6f}  (injected {inj:.6f})")
    print(f"gas    mass change {mg1 - mg0:.6f}  (vented through Dirichlet)")
    assert abs((ml1 - ml0) - inj) < 1e-6 * max(inj, 1e-12)

    pl = np.asarray(W.restrict(x, 0))
    pg = np.asarray(W.restrict(x, 1))
    s_l = np.asarray(prm.s_l(jnp.asarray(pg - pl)))
    print(f"saturation range: [{s_l.min():.3f}, {s_l.max():.3f}]")

    # per-phase mass velocities (V_l/V_g analog)
    vl = TwoPhaseVelocity(mesh, prm, W, x, phase="liquid")
    vg = TwoPhaseVelocity(mesh, prm, W, x, phase="gas")

    w = VTKWriter(mesh)
    w.add_cell_data("p_l", pl)
    w.add_cell_data("p_g", pg)
    w.add_cell_data("s_l", s_l)
    vc = vl.at_centers()
    w.add_cell_data("v_l_x", vc[:, 0])
    w.add_cell_data("v_l_y", vc[:, 1])
    gc = vg.at_centers()
    w.add_cell_data("v_g_x", gc[:, 0])
    w.add_cell_data("v_g_y", gc[:, 1])
    out = "/tmp/twophase_flow.vtu"
    w.write(out)
    print(f"wrote {out}")
    print("OK")


if __name__ == "__main__":
    main()
