from .asof import asof_join
from .rangejoin import interval_join

__all__ = ["asof_join", "interval_join"]
