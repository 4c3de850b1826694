from .loop import TrainResult, train_node_classifier, make_train_step

__all__ = ["TrainResult", "train_node_classifier", "make_train_step"]
