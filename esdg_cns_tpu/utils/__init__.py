from .pytree import pytree_dataclass
from .resilience import inject_fault, resilient_run, state_is_finite

__all__ = ["pytree_dataclass", "resilient_run", "inject_fault",
           "state_is_finite"]
