"""Slab-chunked assembly oracle: residual_slabbed == go.residual."""
import numpy as np
import jax.numpy as jnp

from dune_pdelab_tpu import (
    StructuredMesh, FunctionSpace, QkFEM, GridOperator, constraints,
)
from dune_pdelab_tpu.ops import (
    ConvectionDiffusionProblem, ConvectionDiffusionFEM,
)
from dune_pdelab_tpu.assembly.slabbed import residual_slabbed


class P(ConvectionDiffusionProblem):
    def A(self, x):
        return 1.0 + 0.0 * x[..., 0]

    def b(self, x):
        return jnp.broadcast_to(jnp.array([0.3, -0.1, 0.2]), x.shape)

    def f(self, x):
        return jnp.sin(3.0 * x[..., 0]) * x[..., 2] + x[..., 1]


def test_residual_slabbed_matches_direct():
    p = P()
    mesh = StructuredMesh([0, 0, 0], [1, 1, 1], (7, 6, 11))
    for k in (1, 2):
        V = FunctionSpace(mesh, QkFEM(k, 3))
        cg = constraints(p.dirichlet_bctype(), V)
        go = GridOperator(V, ConvectionDiffusionFEM(p), constraints=cg,
                          skip_boundary=True)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal(V.ndofs))
        r_ref = go.residual(x)
        for nslabs in (1, 3, 4):
            r_sl = residual_slabbed(V, ConvectionDiffusionFEM(p), cg, x,
                                    nslabs=nslabs)
            err = float(jnp.linalg.norm(r_sl - r_ref))
            assert err < 1e-11 * max(1.0, float(jnp.linalg.norm(r_ref))), (
                k, nslabs, err)
