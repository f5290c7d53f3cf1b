from .asof import asof_join
from .layout import interleave_bits, zorder_by
from .rangejoin import interval_join

__all__ = ["asof_join", "interval_join", "interleave_bits", "zorder_by"]
