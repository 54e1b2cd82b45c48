from .layers import GCNConv, SAGEConv, GATConv, GINConv, ChebConv
from .scorers import EdgeProbMLP, EdgeProbSAGE, EdgeProbGCN, get_edge_mlp
from .backbones import (GNNModel, GINModel, GATModel, ChebModel, get_model,
                        init_params)

__all__ = [
    "GCNConv", "SAGEConv", "GATConv", "GINConv", "ChebConv",
    "EdgeProbMLP", "EdgeProbSAGE", "EdgeProbGCN", "get_edge_mlp",
    "GNNModel", "GINModel", "GATModel", "ChebModel", "get_model",
    "init_params",
]
