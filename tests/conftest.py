"""Test configuration: force JAX onto CPU with 8 virtual devices so
multi-chip sharding paths are exercised without TPU hardware
(SURVEY.md §4 implication: fake an 8-device mesh via
--xla_force_host_platform_device_count)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

from pathlib import Path

import pytest

FIXTURES = Path("/root/reference/example-data-sets/graphs")


@pytest.fixture(scope="session")
def fixtures_dir() -> Path:
    return FIXTURES
