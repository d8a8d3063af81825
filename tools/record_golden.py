"""Record golden solver semantics for the BASELINE configs + the round-3
scenario extensions (fp64, CPU, 8 virtual devices).

Writes tests/golden_parity.json: iteration counts + L2 errors. The parity
test (tests/test_parity.py) fails if solver semantics drift — the analog of
the reference's matrix-free-vs-assembled iteration-parity oracle
(/root/reference/dune/pdelab/test/matrixfree/matrix_free_linear.cc:4-8)
pinned against recorded numbers.

NOTE (honesty): these goldens are SELF-recorded runs of this framework —
drift detectors, not numbers derived from executing the C++ reference
(whose dune-common/grid/istl stack is not vendored here). Cross-
implementation correctness rests on the analytic convergence-order and
exactness oracles in the test suite.
"""
import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from dune_pdelab_tpu.models import configs


def main():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "golden_parity.json")
    only = sys.argv[1:]
    out = {}
    if only and os.path.exists(path):   # partial re-record: merge
        out = json.load(open(path))
    for name, fn, kw in [
        ("config1_poisson_2d_mf", configs.config1_poisson_2d_mf, {}),
        ("config2_poisson_3d_gmg", configs.config2_poisson_3d_gmg, {}),
        ("config3_convdiff_sipg", configs.config3_convdiff_sipg, {}),
        ("config4_heat_theta_newton", configs.config4_heat_theta_newton, {}),
        ("config5_stokes_taylor_hood", configs.config5_stokes_taylor_hood, {}),
        ("config6_adaptive_lshape", configs.config6_adaptive_lshape, {}),
        ("config7_dg_twolevel", configs.config7_dg_twolevel, {}),
        ("config8_windowed_sharded", configs.config8_windowed_sharded, {}),
        ("config9_assembled_ilu", configs.config9_assembled_ilu, {}),
        ("config10_stokes_outflow", configs.config10_stokes_outflow, {}),
        ("config11_twophase_displacement",
         configs.config11_twophase_displacement, {}),
        ("config12_simplex_amg", configs.config12_simplex_amg, {}),
        ("config13_scale_lattice_gmg", configs.config13_scale_lattice_gmg,
         {}),
    ]:
        if only and name not in only:
            continue
        r = fn(**kw)
        rec = {}
        for k, v in r.items():
            try:
                rec[k] = float(v) if k != "iterations" else int(v)
            except (TypeError, ValueError):
                rec[k] = str(v)
        out[name] = rec
        print(name, rec, flush=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print("wrote", path)


if __name__ == "__main__":
    main()
