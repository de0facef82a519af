"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real TPU hardware here is a single tunneled chip with slow remote compiles;
multi-chip sharding logic is validated on virtual CPU devices exactly like
the driver's dryrun (8 host devices).  The axon sitecustomize imports jax at
interpreter start, so plain env vars are too late — use jax.config.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:  # older jax: fall back to XLA_FLAGS (may be ignored if late)
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()

import random

import numpy as np
import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled executables between test modules: XLA:CPU has crashed
    (SIGSEGV in backend_compile) when a single process holds the whole
    suite's worth of live compiled programs."""
    yield
    jax.clear_caches()


@pytest.fixture
def rng():
    return random.Random(0xC0FFEE)


@pytest.fixture
def nprng():
    return np.random.default_rng(0xC0FFEE)
