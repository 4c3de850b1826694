from . import autotune

__all__ = ["autotune"]
