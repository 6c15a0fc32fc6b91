from graphtpu.core.graph import Graph
from graphtpu.core import semiring
from graphtpu.core import spops

__all__ = ["Graph", "semiring", "spops"]
