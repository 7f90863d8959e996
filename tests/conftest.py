"""Test configuration: force an 8-device virtual CPU mesh before JAX import.

This is the standard way to exercise multi-chip sharding (pjit/shard_map
over a Mesh) without TPU hardware; the driver separately dry-run-compiles
the multi-chip path via __graft_entry__.dryrun_multichip.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The axon TPU plugin in this image overrides JAX_PLATFORMS from the
# environment; jax.config is authoritative, so force CPU through it
# before any backend initialization.
import jax

jax.config.update("jax_platforms", "cpu")

import subprocess

import numpy as np
import pytest

REF_SRC = "/root/reference/QuicKmer.c"
REF_BIN = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       ".refbin", "quicKmer2")


@pytest.fixture(scope="session")
def ref_binary():
    """Compile the reference binary once for differential testing
    (SURVEY.md section 7: differential tests are the decisive oracle)."""
    if not os.path.exists(REF_BIN):
        os.makedirs(os.path.dirname(REF_BIN), exist_ok=True)
        subprocess.run(
            ["gcc", "-O2", "-pthread", "-std=c99", "-o", REF_BIN, REF_SRC, "-lm"],
            check=True, capture_output=True)
    return REF_BIN


@pytest.fixture()
def rng():
    return np.random.default_rng(0xC0FFEE)
