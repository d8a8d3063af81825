"""Checkpoint/resume tests: bitwise-identical restart of a time integration."""
import numpy as np
import jax.numpy as jnp

from dune_pdelab_tpu import StructuredMesh, FunctionSpace, QkFEM, GridOperator, constraints
from dune_pdelab_tpu.ops import ConvectionDiffusionProblem, ConvectionDiffusionFEM, L2
from dune_pdelab_tpu.instationary import OneStepMethod, implicit_euler
from dune_pdelab_tpu.solvers import SEQ_CG_Jacobi
from dune_pdelab_tpu.utils import save_checkpoint, load_checkpoint, CheckpointManager


def test_roundtrip(tmp_path):
    p = str(tmp_path / "state")
    x = jnp.arange(10.0)
    save_checkpoint(p, {"x": x}, {"t": 0.25})
    arrays, meta = load_checkpoint(p)
    assert np.allclose(np.asarray(arrays["x"]), np.arange(10.0))
    assert meta["t"] == 0.25


def test_manager_retention(tmp_path):
    mgr = CheckpointManager(str(tmp_path), keep=2)
    for s in (1, 2, 3, 4):
        mgr.save(s, {"x": jnp.ones(3) * s})
    assert mgr.steps() == [3, 4]
    arrays, meta = mgr.restore()
    assert meta["step"] == 4
    assert float(arrays["x"][0]) == 4.0


def test_restart_identical(tmp_path):
    class HP(ConvectionDiffusionProblem):
        def f(self, x):
            return jnp.sin(3 * x[..., 0])

    mesh = StructuredMesh([0, 0], [1, 1], (8, 8))
    V = FunctionSpace(mesh, QkFEM(1, 2))
    cg_ = constraints(True, V)
    go0 = GridOperator(V, ConvectionDiffusionFEM(HP()), constraints=cg_)
    go1 = GridOperator(V, L2(), constraints=cg_)

    def run(x, t0, nsteps):
        osm = OneStepMethod(implicit_euler(), go0, go1, SEQ_CG_Jacobi(),
                            pdesolver="linear", reduction=1e-13)
        t = t0
        for _ in range(nsteps):
            x = osm.apply(t, 0.01, x)
            t += 0.01
        return t, x

    x0 = V.zero()
    t_all, x_all = run(x0, 0.0, 6)
    # checkpoint after 3 steps, restart, compare
    t3, x3 = run(x0, 0.0, 3)
    mgr = CheckpointManager(str(tmp_path))
    mgr.save(3, {"x": x3}, {"t": t3})
    arrays, meta = mgr.restore()
    t_res, x_res = run(arrays["x"], meta["t"], 3)
    assert abs(t_res - t_all) < 1e-12
    assert float(jnp.max(jnp.abs(x_res - x_all))) < 1e-13
