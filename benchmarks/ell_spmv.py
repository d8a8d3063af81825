"""ELL-vs-matrix-free SpMV benchmark on TPU (assembled lattice path).

Measures the lattice-ELL SpMV (assembly/ell.py) and its Pallas tiled
lowering against the jvp matrix-free apply on a variable-coefficient 3D
Poisson Q1 problem. Run on TPU: python benchmarks/ell_spmv.py
(BCOO comparison at smaller sizes: see PERFORMANCE.md round-2 numbers.)
"""
import os
import sys
import time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np, jax, jax.numpy as jnp
import dune_pdelab_tpu as pt
from dune_pdelab_tpu.ops import ConvectionDiffusionProblem, ConvectionDiffusionFEM

class P(ConvectionDiffusionProblem):
    def A(self, x):
        a = 1.0 + 0.5*jnp.sin(3*x[...,0])*x[...,1]
        return a[..., None, None]*jnp.eye(x.shape[-1], dtype=x.dtype)
    def f(self, x): return jnp.ones(x.shape[:-1], x.dtype)

n = 127
mesh = pt.StructuredMesh([0,0,0],[1,1,1],(n,n,n))
V = pt.FunctionSpace(mesh, pt.QkFEM(1,3))
cg_ = pt.constraints(True, V)
go = pt.GridOperator(V, ConvectionDiffusionFEM(P()), constraints=cg_, skip_boundary=True)
N = V.ndofs
print("N =", N, flush=True)
from dune_pdelab_tpu.assembly.ell import assemble_ell, try_pallas_tiled_ell
t0=time.perf_counter(); ell = assemble_ell(go)
print("ell assembled in", time.perf_counter()-t0, flush=True)
z = jnp.asarray(np.random.default_rng(0).standard_normal(N), jnp.float32)
def timeit(f, reps=30):
    y=f(z); _=float(jnp.sum(y))
    t0=time.perf_counter()
    for _ in range(reps):
        _=float(jnp.sum(f(z)))
    return (time.perf_counter()-t0)/reps
t_ell = timeit(ell)
tiled = try_pallas_tiled_ell(ell)
t_tiled = timeit(tiled) if tiled is not None else float('nan')
mf = jax.jit(lambda v: go.jacobian_apply(jnp.zeros(N, jnp.float32), v))
t_mf = timeit(mf, reps=10)
bw_ell = 28*N*4/t_ell/1e9; bw_t = 28*N*4/t_tiled/1e9
print(f"matrix-free jvp {t_mf*1e3:.2f} ms  ell {t_ell*1e3:.2f} ms ({bw_ell:.0f} GB/s)  pallas {t_tiled*1e3:.2f} ms ({bw_t:.0f} GB/s)")
y2=np.asarray(ell(z)); y3=np.asarray(tiled(z))
print("parity ell vs pallas:", np.linalg.norm(y2-y3)/np.linalg.norm(y2))
