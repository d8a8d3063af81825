"""The five BASELINE target configurations must run end-to-end and meet
their quality oracles (boilerplate-driver integration tests)."""
import pytest

from dune_pdelab_tpu.models import ALL_CONFIGS


def test_config1_poisson_2d():
    r = ALL_CONFIGS["config1"](cells=24)
    assert r["converged"] and r["l2_error"] < 5e-3


def test_config2_poisson_3d_gmg():
    r = ALL_CONFIGS["config2"](cells=8)
    assert r["converged"] and r["iterations"] <= 25
    assert r["l2_error"] < 1e-3


def test_config3_convdiff_sipg():
    r = ALL_CONFIGS["config3"](cells=16)
    assert r["converged"] and r["l2_error"] < 2e-3


def test_config4_heat_newton():
    r = ALL_CONFIGS["config4"](cells=12, nsteps=5)
    assert r["l2_error"] < 0.02


def test_config5_stokes():
    r = ALL_CONFIGS["config5"](cells=6)
    assert r["converged"] and r["velocity_l2_error"] < 5e-4
