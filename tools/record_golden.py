"""Record golden solver semantics for the five BASELINE configs (fp64, CPU).

Writes tests/golden_parity.json: iteration counts + L2 errors. The parity
test (tests/test_parity.py) fails if solver semantics drift — the analog of
the reference's matrix-free-vs-assembled iteration-parity oracle
(/root/reference/dune/pdelab/test/matrixfree/matrix_free_linear.cc:4-8)
pinned against recorded numbers.
"""
import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from dune_pdelab_tpu.models import configs


def main():
    out = {}
    for name, fn, kw in [
        ("config1_poisson_2d_mf", configs.config1_poisson_2d_mf, {}),
        ("config2_poisson_3d_gmg", configs.config2_poisson_3d_gmg, {}),
        ("config3_convdiff_sipg", configs.config3_convdiff_sipg, {}),
        ("config4_heat_theta_newton", configs.config4_heat_theta_newton, {}),
        ("config5_stokes_taylor_hood", configs.config5_stokes_taylor_hood, {}),
    ]:
        r = fn(**kw)
        rec = {}
        for k, v in r.items():
            try:
                rec[k] = float(v) if k != "iterations" else int(v)
            except (TypeError, ValueError):
                rec[k] = str(v)
        out[name] = rec
        print(name, rec, flush=True)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "golden_parity.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print("wrote", path)


if __name__ == "__main__":
    main()
