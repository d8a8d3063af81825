"""Reference-parity oracles: the five BASELINE configs + five round-3
scenarios (adaptive L-shape trajectory, DG two-level MG, window-sharded
solve, assembled-ELL ILU0, Stokes stress-Neumann outflow exactness)
pinned against recorded golden numbers
(tests/golden_parity.json, recorded fp64/CPU/8-virtual-devices by
tools/record_golden.py). Fails when solver semantics drift — the
iteration-parity discipline of the reference's matrix-free oracle
(/root/reference/dune/pdelab/test/matrixfree/matrix_free_linear.cc:4-8)
applied to the whole config suite. Iteration counts must match EXACTLY;
errors to 1e-8 relative (fp64 determinism).

NOTE: goldens are SELF-recorded by this framework (drift detectors), not
C++-reference-derived numbers — see record_golden.py's docstring."""
import json
import pathlib

import pytest

from dune_pdelab_tpu.models import configs

GOLDEN = json.loads(
    (pathlib.Path(__file__).parent / "golden_parity.json").read_text())

_ITER_KEYS = ("iterations", "newton_iterations", "levels", "ndevices",
              "failed_steps")
_CONFIGS = {
    "config1_poisson_2d_mf": configs.config1_poisson_2d_mf,
    "config2_poisson_3d_gmg": configs.config2_poisson_3d_gmg,
    "config3_convdiff_sipg": configs.config3_convdiff_sipg,
    "config4_heat_theta_newton": configs.config4_heat_theta_newton,
    "config5_stokes_taylor_hood": configs.config5_stokes_taylor_hood,
    "config6_adaptive_lshape": configs.config6_adaptive_lshape,
    "config7_dg_twolevel": configs.config7_dg_twolevel,
    "config8_windowed_sharded": configs.config8_windowed_sharded,
    "config9_assembled_ilu": configs.config9_assembled_ilu,
    "config10_stokes_outflow": configs.config10_stokes_outflow,
    "config11_twophase_displacement":
        configs.config11_twophase_displacement,
    "config12_simplex_amg": configs.config12_simplex_amg,
    "config13_scale_lattice_gmg": configs.config13_scale_lattice_gmg,
}


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_config_parity(name):
    got = _CONFIGS[name]()
    want = GOLDEN[name]
    for key, ref in want.items():
        val = float(got[key])
        if key in _ITER_KEYS or key in ("converged", "ndofs"):
            assert int(round(val)) == int(round(ref)), (name, key, val, ref)
        else:
            # abs floor: exactness-oracle configs (config10) pin errors at
            # the solver-tolerance noise floor, meaningless to 1e-8 rel
            assert val == pytest.approx(ref, rel=1e-8, abs=1e-9), \
                (name, key, val, ref)
