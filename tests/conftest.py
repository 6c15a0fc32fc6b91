"""Test configuration: force JAX onto CPU with 8 virtual devices so
multi-chip sharding paths are exercised without TPU hardware
(SURVEY.md §4 implication: fake an 8-device mesh via
--xla_force_host_platform_device_count).

Note: the environment's axon sitecustomize registers a TPU backend and
pins jax_platforms programmatically, so the JAX_PLATFORMS env var alone
is not enough — the config update below is the authoritative override.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

from pathlib import Path

import pytest

# Graphalytics micro-graph fixtures (vendored copies of the reference's
# example-data-sets/graphs — SURVEY.md §4 says to copy them so the suite
# is self-contained). GRAPHTPU_FIXTURES overrides, e.g. to point back at
# /root/reference/example-data-sets/graphs.
FIXTURES = Path(
    os.environ.get(
        "GRAPHTPU_FIXTURES", str(Path(__file__).parent / "fixtures" / "graphs")
    )
)


@pytest.fixture(scope="session")
def fixtures_dir() -> Path:
    return FIXTURES
