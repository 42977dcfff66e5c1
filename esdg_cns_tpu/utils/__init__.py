from .pytree import pytree_dataclass

__all__ = ["pytree_dataclass"]
