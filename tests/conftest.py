"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the JAX-idiomatic "multi-node without a cluster" fake backend —
the reference has no test suite at all (SURVEY.md §4), so sharding and
numerics are validated here on host CPU devices.

NOTE: a pytest plugin imports jax before this conftest runs, so setting
JAX_PLATFORMS via os.environ is too late; we must go through jax.config
(legal any time before backend initialization).  The session environment
pins JAX_PLATFORMS to the TPU ("axon"); tests must run on CPU for exact
float32 parity against torch.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# persistent compile cache: repeated suite runs skip minutes of XLA compiles
from swapnet_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache(os.path.expanduser("~/.cache/swapnet_tpu_xla_tests"))


def pytest_configure(config):
    assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
    assert len(jax.devices()) == 8, "tests expect an 8-device virtual CPU mesh"
