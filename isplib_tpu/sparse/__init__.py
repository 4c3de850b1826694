from .graph import CSRGraph, from_edge_index, from_scipy, pad_to_multiple
from .tiling import (TiledGraph, TiledPlan, build_tiling,
                     build_tiling_from_numpy, base_graph)

__all__ = ["CSRGraph", "from_edge_index", "from_scipy", "pad_to_multiple",
           "TiledGraph", "TiledPlan", "build_tiling",
           "build_tiling_from_numpy", "base_graph"]
