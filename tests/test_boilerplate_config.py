"""INI-configured end-to-end drivers (ParameterTree-configurable driver
analog, reference: stationary/linearproblem.hh:98-138 documented keys +
Newton setParameters)."""
import numpy as np
import jax.numpy as jnp

from dune_pdelab_tpu.models import StructuredGrid, CGSpace, solve_stationary
from dune_pdelab_tpu.models.boilerplate import solve_instationary
from dune_pdelab_tpu.ops import ConvectionDiffusionProblem, ConvectionDiffusionFEM
from dune_pdelab_tpu.utils import ParameterTree
from dune_pdelab_tpu.space.functions import l2_difference

INI = """
[time]
scheme = crank_nicolson
dt = 0.025
tend = 0.2

[linear_solver]
type = cg
preconditioner = jacobi
maxiter = 4000
"""

LAM = 2 * np.pi**2


class HP(ConvectionDiffusionProblem):
    def u_exact(self, t):
        return lambda p: np.exp(-t) * np.sin(np.pi * p[:, 0]) * np.sin(
            np.pi * p[:, 1])

    def f(self, x):
        return (LAM - 1.0) * jnp.exp(-self.time) * jnp.sin(
            np.pi * x[..., 0]) * jnp.sin(np.pi * x[..., 1])


def test_instationary_from_ini(tmp_path):
    ptree = ParameterTree.from_ini(INI)
    p = HP()
    mesh = StructuredGrid(2, 16)
    V = CGSpace(mesh, 1)
    x0 = V.interpolate(p.u_exact(0.0))
    t, x, osm = solve_instationary(
        V, ConvectionDiffusionFEM(p), bctype=p.dirichlet_bctype(), x0=x0,
        ptree=ptree, vtk_basename=str(tmp_path / "heat"),
        checkpoint_dir=str(tmp_path / "ck"))
    assert abs(t - 0.2) < 1e-12
    err = float(l2_difference(V, x, p.u_exact(t)))
    assert err < 0.01, err
    import os
    assert os.path.exists(str(tmp_path / "heat.pvd"))
    from dune_pdelab_tpu.utils import CheckpointManager
    mgr = CheckpointManager(str(tmp_path / "ck"))
    assert mgr.latest_step() == 8
