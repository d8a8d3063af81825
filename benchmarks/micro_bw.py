"""Micro-benchmarks: achievable HBM bandwidth envelope on this chip.

Measures (with hard host syncs — block_until_ready does not sync through
the axon relay, PERFORMANCE.md):
  * jnp copy            (2 passes/elem)
  * jnp triad           (a = b + s*c: 3 passes)
  * pallas copy         (2 passes)
  * pallas stencil27    (the round-1 tiled kernel, read-amp counted)
Reports GB/s of *actual* bytes moved so numbers are comparable.

Run on TPU:  python benchmarks/micro_bw.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sync(out):
    # scalar-only host transfer: np.asarray of the full array would pull
    # the whole buffer through the relay and dominate the measurement
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(leaf.reshape(-1)[0])


def timed(fn, *args, reps=5):
    out = fn(*args)
    _sync(out)  # warmup + compile + hard sync
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / reps


def main():
    n = 512
    R, L = n * n, n  # (rows, lanes) view of a 512^3 grid
    x = jnp.arange(R * L, dtype=jnp.float32).reshape(R, L) * 1e-6
    y = jnp.ones((R, L), jnp.float32)
    nbytes = R * L * 4

    # -- XLA copy (forced via +0 so it is not a no-op)
    f_copy = jax.jit(lambda a: a + 1.0)
    dt = timed(f_copy, x)
    print(f"xla copy+1:      {2 * nbytes / dt / 1e9:8.1f} GB/s  ({dt*1e3:.2f} ms)")

    # -- XLA triad
    f_triad = jax.jit(lambda a, b: a + 0.5 * b)
    dt = timed(f_triad, x, y)
    print(f"xla triad:       {3 * nbytes / dt / 1e9:8.1f} GB/s  ({dt*1e3:.2f} ms)")

    # -- XLA fused cg-ish update (x+=ap; r-=aq; sum r^2) as one jit
    def cgup(xv, pv, rv, qv, a):
        x2 = xv + a * pv
        r2 = rv - a * qv
        return x2, r2, jnp.sum(r2 * r2)

    f_cgup = jax.jit(cgup)
    dt = timed(f_cgup, x, y, x, y, 0.3)
    print(f"xla cg-update:   {6 * nbytes / dt / 1e9:8.1f} GB/s  ({dt*1e3:.2f} ms) [6-pass model]")

    # -- pallas copy, blocked rows (block size bounded by 16MB scoped VMEM)
    RB = 256

    def k_copy(a_ref, o_ref):
        o_ref[:, :] = a_ref[:, :] + 1.0

    f_pcopy = jax.jit(pl.pallas_call(
        k_copy,
        out_shape=jax.ShapeDtypeStruct((R, L), jnp.float32),
        grid=(R // RB,),
        in_specs=[pl.BlockSpec((RB, L), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((RB, L), lambda i: (i, 0)),
    ))
    dt = timed(f_pcopy, x)
    print(f"pallas copy+1:   {2 * nbytes / dt / 1e9:8.1f} GB/s  ({dt*1e3:.2f} ms)")

    # -- pallas 5-in/2-out fused cg-update shape
    def k_cg(x_ref, p_ref, r_ref, q_ref, xo_ref, ro_ref, acc, *, a=0.3):
        i = pl.program_id(0)
        xo_ref[:, :] = x_ref[:, :] + a * p_ref[:, :]
        rn = r_ref[:, :] - a * q_ref[:, :]
        ro_ref[:, :] = rn

        @pl.when(i == 0)
        def _():
            acc[0, 0] = 0.0

        acc[0, 0] += jnp.sum(rn * rn)

    f_pcg = jax.jit(pl.pallas_call(
        k_cg,
        out_shape=[jax.ShapeDtypeStruct((R, L), jnp.float32),
                   jax.ShapeDtypeStruct((R, L), jnp.float32)],
        grid=(R // RB,),
        in_specs=[pl.BlockSpec((RB, L), lambda i: (i, 0))] * 4,
        out_specs=[pl.BlockSpec((RB, L), lambda i: (i, 0))] * 2,
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.float32)],
    ))
    dt = timed(f_pcg, x, y, x, y)
    print(f"pallas cg-update:{6 * nbytes / dt / 1e9:8.1f} GB/s  ({dt*1e3:.2f} ms) [6 passes]")

    # -- round-1 tiled stencil kernel (counts actual amplified reads)
    from dune_pdelab_tpu.assembly.stencil_pallas_tile import (
        build_tiled_stencil_apply,
    )
    offsets = [(dx, dy, dz) for dz in (-1, 0, 1) for dy in (-1, 0, 1)
               for dx in (-1, 0, 1)]
    w = np.full(27, -1.0, np.float32)
    w[13] = 26.0
    ap = build_tiled_stencil_apply((n, n, n), np.array(offsets), w,
                                   row_block=512)
    z = jnp.ones(n * n * n, jnp.float32)
    dt = timed(ap, z)
    H = ((n + 1 + 7) // 8) * 8
    amp = (512 + 2 * H) / 512
    real = (amp + 1.0) * nbytes  # amplified read + write (pad passes excluded)
    print(f"stencil27 r1:    {real / dt / 1e9:8.1f} GB/s real ({dt*1e3:.2f} ms, "
          f"amp={amp:.2f}; kernel-only, no pad/mask passes)")
    eff = 2 * nbytes / dt / 1e9
    print(f"                 {eff:8.1f} GB/s effective (2-pass model)")


if __name__ == "__main__":
    main()
