from graphtpu.ingest.loader import load_graph, load_graph_from_spec

__all__ = ["load_graph", "load_graph_from_spec"]
