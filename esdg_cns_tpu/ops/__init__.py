from .flux_differencing import flux_differencing_xla

__all__ = ["flux_differencing_xla"]
