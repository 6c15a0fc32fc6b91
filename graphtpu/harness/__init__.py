from graphtpu.harness.validator import validate_result
from graphtpu.harness.platform import GraphTpuPlatform

__all__ = ["validate_result", "GraphTpuPlatform"]
