"""Test config: force CPU with an 8-device virtual mesh.

Multi-chip shardings are validated on a host-emulated mesh
(``--xla_force_host_platform_device_count=8``), the strategy the reference
cannot inform (it has no distributed code at all — SURVEY.md section 2.6).

Platform note: this environment's sitecustomize registers an ``axon`` TPU
plugin that calls ``jax.config.update("jax_platforms", "axon,cpu")`` on
import, clobbering the JAX_PLATFORMS env var — so we must both set the XLA
flag before jax import AND re-update jax.config afterwards.
"""

import os
import tempfile

# hermetic capacity-cache store: tests must not read capacities observed by
# production runs (or each other's runs across sessions)
os.environ.setdefault(
    "SCULPTMATE_CAP_CACHE", tempfile.mkdtemp(prefix="sm_capcache_")
)

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
