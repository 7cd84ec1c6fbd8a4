"""Test configuration: force a deterministic 8-device CPU topology.

Multi-chip sharding logic (SURVEY.md §4 item 4) is tested without a pod via
XLA's host-platform device-count override. Env vars must be set before jax
initializes its backends, hence module scope here.
"""

import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# Skip the axon TPU-tunnel registration entirely: it runs from sitecustomize
# at jax import, adds seconds of latency, and HANGS when the tunnel is
# wedged. Tests are CPU-only by design.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax

# The axon TPU plugin in this image force-appends itself to jax_platforms at
# import time, overriding the env var; pin the config explicitly or tests
# silently run over the remote-TPU tunnel (slow, flaky, single-device).
jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu"

import numpy as np
import pytest


@pytest.fixture(scope="session")
def small_track():
    """A small synthetic corridor map shared across tests (fast EDT)."""
    from pyracecarsimulator_tpu.maps.loader import build_track_map
    h = w = 192
    occ = np.zeros((h, w), np.float32)
    occ[:4, :] = 1; occ[-4:, :] = 1; occ[:, :4] = 1; occ[:, -4:] = 1
    occ[60:132, 60:132] = 1          # interior block -> corridor loop
    occ[100:104, 20:40] = 1          # a pillar-ish bar in the corridor
    return build_track_map(occ, resolution=0.05, origin_xy=(-4.8, -4.8),
                           name="small")


@pytest.fixture()
def rng():
    # function-scoped: every test sees the same stream regardless of
    # execution order (a shared stream made failures order-dependent)
    return np.random.RandomState(42)
