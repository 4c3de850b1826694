from .graph import CSRGraph, from_edge_index, from_scipy, pad_to_multiple

__all__ = ["CSRGraph", "from_edge_index", "from_scipy", "pad_to_multiple"]
