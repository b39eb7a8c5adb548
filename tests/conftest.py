"""Test configuration: force an 8-device virtual CPU mesh.

Tests run on CPU (fast iteration, no TPU dependency) with 8 virtual XLA
devices so multi-chip sharding paths are exercised exactly as the driver's
`dryrun_multichip` does.  Must run before jax initializes.

When a long TPU job shares the machine, launch pytest with
``PALLAS_AXON_POOL_IPS=`` (empty): the axon sitecustomize otherwise
registers the tunnel plugin in every test process, which can wedge the
TPU job's device stream (see .claude/skills/verify/SKILL.md).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the tunneled TPU backend and sets
# jax_platforms="axon,cpu" at interpreter start (before this file runs), so
# the env var alone is not enough — override the config explicitly.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def small_cloud():
    from deepestscatter_tpu.data import procedural

    return procedural.cumulus(resolution=32, seed=3)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
