from .synthetic import NodeDataset, rmat_edges, rmat_dataset, sbm_dataset
from .loaders import load, loader_dict, DATASET_STATS, pad_features

__all__ = ["NodeDataset", "rmat_edges", "rmat_dataset", "sbm_dataset",
           "load", "loader_dict", "DATASET_STATS", "pad_features"]
