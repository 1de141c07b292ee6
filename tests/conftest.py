"""Test harness configuration.

Forces JAX onto a virtual 8-device CPU platform (before any jax import) so the
suite runs anywhere and sharding tests exercise a real multi-device mesh, as
the multi-chip analog of the reference's CPU<->GPU cross-validation
(test_interpolation.cpp:214-249).
"""

import os

# force (the machine presets JAX_PLATFORMS=axon -> the real TPU; tests must not
# depend on or monopolize the chip).  jax may already be imported by a pytest
# plugin, so set both the env vars and the live config.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
# separate compile cache: entries written via the axon compile helper carry
# CPU machine features this host lacks (SIGILL risk when reloaded)
import pathlib

jax.config.update(
    "jax_compilation_cache_dir",
    str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache_cpu"),
)
# cache even fast compiles: the suite jits hundreds of small shapes on one
# slow core; sub-second compiles add minutes in aggregate
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
assert not jax._src.xla_bridge.backends_are_initialized(), (
    "JAX backend initialized before tests/conftest.py could select CPU"
)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(1234)


def pytest_addoption(parser):
    parser.addoption(
        "--run-slow",
        action="store_true",
        default=False,
        help="run slow full-tile validation tests",
    )


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: full-tile validation (opt-in via --run-slow)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--run-slow"):
        return
    skip = pytest.mark.skip(reason="slow test: pass --run-slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
