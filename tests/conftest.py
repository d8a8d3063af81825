"""Test configuration: CPU backend with 8 virtual devices, fp64 parity mode.

Mirrors the reference's `dune_add_test(... MPI_RANKS 1 2 4)` strategy
(reference: dune/pdelab/test/CMakeLists.txt:46) — distributed paths are
tested on a virtual device mesh on one host.

NOTE: the environment may pre-register an accelerator platform and pin
`jax_platforms` via config (so JAX_PLATFORMS=cpu in the env is NOT enough);
the config update below must run before any backend is initialized.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert len(jax.devices()) == 8, (
    f"test suite needs 8 virtual CPU devices, got {jax.devices()}"
)

import pytest  # noqa: E402

# Fast tier (`pytest -m fast`, the CI gate; the full 260+ suite takes
# >25 min of jit compiles). Modules here must sum to < 5 min on this box.
_FAST_MODULES = {
    "test_mesh_space", "test_fe", "test_krylov",
    "test_fused_cg", "test_io", "test_checkpoint",
    "test_solver_utils", "test_boilerplate_config", "test_dgindicator",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        name = item.module.__name__.rsplit(".", 1)[-1]
        item.add_marker(pytest.mark.fast if name in _FAST_MODULES
                        else pytest.mark.slow)
