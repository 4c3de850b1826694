from .conv import GCNConv, SAGEConv, GINConv
from .models import GCN, GraphSAGE, GIN, MODEL_REGISTRY
from .transforms import gcn_norm, add_self_loops, row_normalize

__all__ = ["GCNConv", "SAGEConv", "GINConv", "GCN", "GraphSAGE", "GIN",
           "MODEL_REGISTRY", "gcn_norm", "add_self_loops", "row_normalize"]
