from .loop import TrainResult, train_node_classifier, make_train_step
from .checkpoint import save_checkpoint, restore_checkpoint, latest_step

__all__ = ["TrainResult", "train_node_classifier", "make_train_step",
           "save_checkpoint", "restore_checkpoint", "latest_step"]
